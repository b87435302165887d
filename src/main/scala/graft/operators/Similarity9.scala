package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Ninth similarity batch: the PQ codebook distortion audit — the
  * quality-control companion to `sim_ann_pq`. Product quantization
  * trades recall for memory through its reconstruction error; this
  * report puts a number on that trade per (subspace, code) cell, which
  * is how an index operator decides whether the codebook geometry fits
  * the corpus (hot cells with high MSE ⇒ add bits or re-seed planes;
  * the decision-table discipline of `sim_ivf_tuning`/`dedup_lsh_tuning`).
  * Reference scope: SURVEY.md §2.5 X2. */
object Similarity9 {
  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Per-cell PQ reconstruction error: for every (subspace j, code)
    * cell, the within-cell sum of squared deviations from the cell
    * centroid — computed from exact fixed-point moments per
    * (j, code, pos): SSE_pos = Σv² − (Σv)²/n with v the ×2²⁰ quantized
    * component (the SAME quantization the sim_ann_pq codebook means
    * use), then an ordered fold over the 16 positions. Nothing floats
    * until the per-pos moment division, and the only cross-row float
    * sum is the 16-element position fold — order-pinned in both
    * engines. At most m·2^bits = 64 output rows, from one hash
    * aggregation over the exploded component relation: one corpus
    * pass, map-side combinable, at any scale. */
  val pqDistortion: Q = Q(
    "sim_pq_distortion",
    s"""WITH ${Similarity2.duckCompCtes},
       |cells AS (
       |  SELECT j, code, pos, COUNT(*)::BIGINT AS n,
       |    SUM(CAST(FLOOR(comp::DOUBLE * ${Similarity2.PqFp} + 0.5)
       |      AS BIGINT))::HUGEINT AS s,
       |    SUM(CAST(CAST(FLOOR(comp::DOUBLE * ${Similarity2.PqFp} + 0.5)
       |        AS BIGINT) AS HUGEINT)
       |      * CAST(FLOOR(comp::DOUBLE * ${Similarity2.PqFp} + 0.5)
       |        AS BIGINT))::HUGEINT AS ss
       |  FROM comp GROUP BY 1, 2, 3),
       |percell AS (
       |  SELECT j, code, MIN(n)::BIGINT AS n_vecs,
       |    LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE,
       |      LIST((CAST(CAST(ss AS VARCHAR) AS DOUBLE)
       |          - CAST(CAST(s AS VARCHAR) AS DOUBLE)
       |            * CAST(CAST(s AS VARCHAR) AS DOUBLE) / n)
       |        / (${Similarity2.PqFp} * ${Similarity2.PqFp}) ORDER BY pos)),
       |      (acc, x) -> acc + x) AS sse
       |  FROM cells GROUP BY 1, 2)
       |SELECT CAST(j AS BIGINT) AS j, code, n_vecs, sse,
       |  sse / (n_vecs * ${Similarity2.sub}) AS mse
       |FROM percell
       |ORDER BY j, code""".stripMargin) { (s, d) =>
    val emb = embeddings(s, d)
    val enc = emb.select(
      Seq(col("vec_id"), col("embedding")) ++
        (0 until Similarity2.PqM).map(j =>
          Similarity2.codeCol(j).as(s"code_$j")): _*)
    val codes = enc.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until Similarity2.PqM)
        .map(j => col(s"code_$j")): _*)).as(Seq("j", "code")))
    val comp = codes.select(col("j"), col("code"),
      posexplode(slice(col("embedding"),
        col("j") * Similarity2.sub + 1, lit(Similarity2.sub)))
        .as(Seq("pos", "comp")))
    val fp = floor(col("comp").cast("double") * Similarity2.PqFp + 0.5)
      .cast("long")
    val cells = comp.groupBy("j", "code", "pos")
      .agg(count(lit(1)).as("n"),
        sum(fp.cast(dec)).as("s"),
        sum(fp.cast(dec) * fp.cast(dec)).as("ss"))
    val ssePos = (col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("n")) /
      (Similarity2.PqFp * Similarity2.PqFp)
    cells.groupBy("j", "code")
      .agg(min("n").as("n_vecs"),
        Similarity2.orderedSum(col("pos"), ssePos, "v").as("sse"))
      .select(col("j").cast("long").as("j"), col("code"), col("n_vecs"),
        col("sse"),
        (col("sse") / (col("n_vecs") * Similarity2.sub)).as("mse"))
      .orderBy("j", "code")
  }

  /** Filtered similarity search — exact top-k cosine UNDER a metadata
    * predicate (same label as the query): the "in-category nearest
    * neighbors" shape every production vector store must serve, where
    * the filter composes with the index rather than post-filtering a
    * fixed-k result (post-filtering returns < k rows whenever the
    * neighborhood is label-diverse — the classic filtered-ANN bug).
    * Here the predicate is applied BEFORE ranking (join condition
    * `n_label = q_label`), so every query gets its true k in-category
    * neighbors; at scale the same composition holds for the IVF tier
    * (probe lists are label-agnostic, the filter prunes candidates
    * before the rank window). Scores are sequential-fold doubles →
    * bit-identical to DuckDB; ties pinned by n_id. */
  val filteredTopk: Q = Q(
    "sim_filtered_topk",
    s"""SELECT q_id, q_label, n_id, rank, sim FROM (
       |  SELECT q.vec_id AS q_id, q.label AS q_label, c.vec_id AS n_id,
       |    ${graft.functions.VectorFunctions.duckCosine(
            "q.embedding", "c.embedding", 64)} AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${graft.functions.VectorFunctions.duckCosine(
            "q.embedding", "c.embedding", 64)} DESC, c.vec_id) AS rank
       |  FROM embeddings q
       |  JOIN embeddings c
       |    ON c.vec_id <> q.vec_id AND c.label = q.label
       |  WHERE q.vec_id < 10)
       |WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.{dot, norm}
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
      col("label"), norm(col("embedding")).as("nrm"))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    e.select(col("vec_id").as("n_id"), col("embedding").as("c_emb"),
        col("label").as("n_label"), col("nrm").as("c_nrm"))
      .join(broadcast(queries),
        col("n_id") =!= col("q_id") && col("n_label") === col("q_label"))
      .withColumn("sim",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 5)
      .select("q_id", "q_label", "n_id", "rank", "sim")
      .orderBy("q_id", "rank")
  }

  /** Filtered ANN, the SCALE path: the same IVF multi-probe tier as
    * `sim_ann_ivf`, with the label predicate composed into the
    * candidate relation BEFORE the rank window — probe lists stay
    * label-agnostic (one coarse quantizer serves every filter), the
    * filter prunes candidates right after the cell join, and the
    * window then ranks only in-category candidates, so k survivors are
    * returned whenever the probed cells hold k label-mates.
    * `sim_filtered_topk` is this query's exact (brute-force) baseline;
    * `Similarity9Spec`-style recall lives in TextAnalysis10Spec via
    * the brute tier. Approximation contract identical to sim_ann_ivf:
    * deterministic seeded planes, penalty-ordered probes, exact cosine
    * on candidates — the oracle hash-checks the full output. */
  val filteredIvf: Q = Q(
    "sim_filtered_ivf", {
      val bits = Similarity.IvfBits
      val projCols = (0 until bits)
        .map(b => s"${Similarity.duckProj(Similarity.IvfPlaneBase + b)} AS proj_$b")
        .mkString(",\n    ")
      val cellExpr = (0 until bits)
        .map(b => s"(CASE WHEN proj_$b >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << $b)")
        .mkString(" | ")
      val penaltyExpr = (0 until bits)
        .map(b => s"(CASE WHEN ((q.q_cell >> $b) & 1) <> ((c.cell >> $b) & 1) THEN ABS(q.proj_$b) ELSE 0.0 END)")
        .mkString(" + ")
      val cos = graft.functions.VectorFunctions.duckCosine("qe", "ce", 64)
      s"""WITH proj AS (
         |  SELECT vec_id, embedding, label,
         |    $projCols
         |  FROM embeddings),
         |sig AS (SELECT vec_id, embedding, label, $cellExpr AS cell,
         |        ${(0 until bits).map(b => s"proj_$b").mkString(", ")}
         |        FROM proj),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS qe, label AS q_label,
         |    cell AS q_cell,
         |    ${(0 until bits).map(b => s"proj_$b").mkString(", ")}
         |  FROM sig WHERE vec_id < 10),
         |probes AS (
         |  SELECT q_id, qe, q_label, cell FROM (
         |    SELECT q.q_id, q.qe, q.q_label, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY $penaltyExpr, c.cell) AS prank
         |    FROM q CROSS JOIN (SELECT UNNEST(RANGE(0, ${1 << bits})) AS cell) c)
         |  WHERE prank <= ${Similarity.IvfNProbe}),
         |cand AS (
         |  SELECT p.q_id, p.qe, p.q_label, s.vec_id AS n_id,
         |    s.embedding AS ce
         |  FROM probes p JOIN sig s
         |    ON s.cell = p.cell AND s.vec_id <> p.q_id
         |    AND s.label = p.q_label)
         |SELECT q_id, q_label, n_id, rank, sim FROM (
         |  SELECT q_id, q_label, n_id, $cos AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY $cos DESC, n_id) AS rank
         |  FROM cand)
         |WHERE rank <= ${Similarity.K}
         |ORDER BY q_id, rank""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = embeddings(s, d)
    val labels = emb.select(col("vec_id"), col("label"))
    val qLabels = broadcast(emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label")))
    val cand = Similarity.ivfCandidates(emb, numQueries = 10,
      bits = Similarity.IvfBits, maxProbe = Similarity.IvfNProbe)
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    cand
      .join(qLabels, "q_id")
      .join(labels.select(col("vec_id").as("n_id"),
        col("label").as("n_label")), "n_id")
      .filter(col("n_label") === col("q_label"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= Similarity.K)
      .select("q_id", "q_label", "n_id", "rank", "sim")
      .orderBy("q_id", "rank")
  }

  val all: Seq[Q] = Seq(pqDistortion, filteredTopk, filteredIvf)
}
