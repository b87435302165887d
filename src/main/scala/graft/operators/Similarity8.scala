package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.functions.VectorFunctions

/** Eighth similarity batch: the IVF probe-depth tuning report — the
  * `dedup_lsh_tuning` discipline applied to the ANN side. Reference
  * scope: the ClickHouse side of `/root/reference/main.py:12-55` owns
  * arbitrary OLAP SQL over the replicated tables; this is the
  * index-tuning member of the extension surface (SURVEY §2.5 X2). */
object Similarity8 {

  private val EmbDim = 64
  private val Probes = Seq(1, 2, 4, 6, 8)
  private val MaxProbe = Probes.max

  /** nProbe decision table for the IVF tier: for each probe depth
    * p ∈ {1, 2, 4, 6, 8}, the total candidate volume and the recall of
    * the p-probe top-k against the exact brute-force top-k — exactly
    * the evidence that justifies (or indicts) the production setting
    * `IvfNProbe = 6` that `sim_ann_ivf` runs, measured rather than
    * assumed. The whole sweep costs ONE corpus join at the maximum
    * probe depth: [[Similarity.ivfCandidates]] tags every candidate
    * with the probe rank of the cell it came from, and each depth's
    * answer is a `prank ≤ p` prefix of that one relation (an IVF list
    * is nested by construction — probing p cells sees a superset of
    * p−1), so the knob sweep re-ranks prefixes instead of re-running
    * the index. Deterministic end-to-end (sign-matrix quantizer, exact
    * cosine, fixed tiebreaks) → full hash oracle.
    *
    * 100 TB shape: the corpus is touched once, in the probed fraction
    * only; everything downstream is (|Q| · maxProbe · cell)-bounded
    * and the report is 5 rows. */
  val ivfTuning: Q = {
    val projCols = (0 until Similarity.IvfBits)
      .map(b => s"${Similarity.duckProj(Similarity.IvfPlaneBase + b)} AS proj_$b")
      .mkString(",\n    ")
    val cellExpr = (0 until Similarity.IvfBits)
      .map(b => s"(CASE WHEN proj_$b >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << $b)")
      .mkString(" | ")
    val penaltyExpr = (0 until Similarity.IvfBits)
      .map(b => s"(CASE WHEN ((q.q_cell >> $b) & 1) <> ((c.cell >> $b) & 1) THEN ABS(q.proj_$b) ELSE 0.0 END)")
      .mkString(" + ")
    val projNames = (0 until Similarity.IvfBits).map(b => s"proj_$b").mkString(", ")
    val denom = Similarity.NumQueries * Similarity.K
    Q(
      "sim_ivf_tuning",
      s"""WITH proj AS (
         |  SELECT vec_id, embedding,
         |    $projCols
         |  FROM embeddings),
         |sig AS (SELECT vec_id, embedding, $cellExpr AS cell, $projNames
         |        FROM proj),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS qe, cell AS q_cell, $projNames
         |  FROM sig WHERE vec_id < ${Similarity.NumQueries}),
         |probes AS (
         |  SELECT q_id, qe, cell, prank FROM (
         |    SELECT q.q_id, q.qe, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY $penaltyExpr, c.cell) AS prank
         |    FROM q CROSS JOIN
         |      (SELECT UNNEST(RANGE(0, ${1 << Similarity.IvfBits})) AS cell) c)
         |  WHERE prank <= $MaxProbe),
         |cand AS (
         |  SELECT p.q_id, p.prank, s.vec_id AS n_id,
         |    ${VectorFunctions.duckCosine("p.qe", "s.embedding", EmbDim)} AS sim
         |  FROM probes p JOIN sig s ON s.cell = p.cell AND s.vec_id <> p.q_id),
         |ps AS (SELECT UNNEST(ARRAY[${Probes.mkString(", ")}]) AS nprobe),
         |pc AS (
         |  SELECT ps.nprobe, c.q_id, c.n_id, c.sim
         |  FROM cand c JOIN ps ON c.prank <= ps.nprobe),
         |ranked AS (
         |  SELECT nprobe, q_id, n_id,
         |    ROW_NUMBER() OVER (PARTITION BY nprobe, q_id
         |      ORDER BY sim DESC, n_id) AS rank
         |  FROM pc),
         |topk AS (SELECT nprobe, q_id, n_id FROM ranked WHERE rank <= ${Similarity.K}),
         |counts AS (SELECT nprobe, COUNT(*)::BIGINT AS n_cand FROM pc GROUP BY 1),
         |exact AS (${Similarity.topkBruteForce.oracle.get}),
         |hits AS (
         |  SELECT t.nprobe, COUNT(*)::BIGINT AS n_matched
         |  FROM topk t JOIN exact e ON e.q_id = t.q_id AND e.n_id = t.n_id
         |  GROUP BY 1)
         |SELECT CAST(c.nprobe AS BIGINT) AS nprobe, c.n_cand,
         |  CAST(COALESCE(h.n_matched, 0) AS BIGINT) AS n_matched,
         |  CAST(COALESCE(h.n_matched, 0) AS DOUBLE) / $denom.0::DOUBLE AS recall
         |FROM counts c LEFT JOIN hits h ON h.nprobe = c.nprobe
         |ORDER BY nprobe""".stripMargin) { (s, d) =>
      val cand = Similarity.ivfCandidates(embeddings(s, d),
        Similarity.NumQueries, Similarity.IvfBits, MaxProbe)
        .localCheckpoint(true)
      val ps = explode(array(Probes.map(p => lit(p)): _*)).as("nprobe")
      val pc = cand.select(col("q_id"), col("n_id"), col("sim"), col("prank"),
          ps)
        .filter(col("prank") <= col("nprobe"))
      val wr = Window.partitionBy("nprobe", "q_id")
        .orderBy(col("sim").desc, col("n_id"))
      val topk = pc
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= Similarity.K)
        .select("nprobe", "q_id", "n_id")
      val counts = pc.groupBy("nprobe").agg(count(lit(1)).as("n_cand"))
      val exact = Similarity.topkBruteForce.run(s, d)
        .select(col("q_id").as("eq"), col("n_id").as("en"))
      val hits = topk.join(broadcast(exact),
          col("q_id") === col("eq") && col("n_id") === col("en"))
        .groupBy("nprobe").agg(count(lit(1)).as("n_matched"))
      counts.join(hits, Seq("nprobe"), "left")
        .select(col("nprobe").cast("long").as("nprobe"), col("n_cand"),
          coalesce(col("n_matched"), lit(0L)).cast("long").as("n_matched"),
          (coalesce(col("n_matched"), lit(0L)).cast("double") /
            lit(denom.toDouble)).as("recall"))
        .orderBy("nprobe")
    }
  }

  private val RrfK = 60L // the standard RRF damping constant

  /** Reciprocal Rank Fusion of the LSH and IVF ANN tiers — the
    * standard hybrid-retrieval ensemble (Cormack et al.): each
    * neighbor appearing in either tier's top-k scores
    * Σ 1/(60 + rank_tier), missing ranks contribute 0, and the fused
    * top-k re-ranks by that sum. Two independent approximate indexes
    * disagree exactly where each is weakest, so the fusion recovers
    * neighbors either alone drops — the same reason production search
    * fuses BM25 with dense retrieval. Both inputs are the engine's own
    * fully-oracled registered queries (`sim_ann_lsh`, `sim_ann_ivf`),
    * so the oracle is the same composition of their SQL bodies as CTEs
    * (the `sim_ann_recall` precedent); the RRF score is a fixed chain
    * of two double divisions of exact integers.
    *
    * 100 TB shape: both inputs are (|Q|·k)-bounded; the full-outer
    * join, scoring, and re-rank window are driver-trivial. The cost is
    * the two underlying index pipelines, each already shaped for
    * scale. */
  val rrfFusion: Q = Q(
    "sim_rrf_fusion",
    s"""WITH lshq AS (${Similarity.annLsh.oracle.get}),
       |ivfq AS (${Similarity.annIvf.oracle.get}),
       |fused AS (
       |  SELECT COALESCE(l.q_id, i.q_id) AS q_id,
       |    COALESCE(l.n_id, i.n_id) AS n_id,
       |    (CASE WHEN l.rank IS NOT NULL
       |       THEN 1.0::DOUBLE / CAST($RrfK + l.rank AS DOUBLE)
       |       ELSE 0.0::DOUBLE END)
       |    + (CASE WHEN i.rank IS NOT NULL
       |       THEN 1.0::DOUBLE / CAST($RrfK + i.rank AS DOUBLE)
       |       ELSE 0.0::DOUBLE END) AS rrf
       |  FROM lshq l FULL OUTER JOIN ivfq i
       |    ON i.q_id = l.q_id AND i.n_id = l.n_id)
       |SELECT q_id, n_id, rrf, rank FROM (
       |  SELECT q_id, n_id, rrf,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY rrf DESC, n_id) AS rank
       |  FROM fused)
       |WHERE rank <= ${Similarity.K}
       |ORDER BY q_id, rank""".stripMargin) { (s, d) =>
    val l = Similarity.annLsh.run(s, d)
      .select(col("q_id").as("lq"), col("n_id").as("ln"),
        col("rank").as("lr"))
    val i = Similarity.annIvf.run(s, d)
      .select(col("q_id").as("iq"), col("n_id").as("in"),
        col("rank").as("ir"))
    val w = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("n_id"))
    l.join(i, col("iq") === col("lq") && col("in") === col("ln"), "full_outer")
      .select(coalesce(col("lq"), col("iq")).as("q_id"),
        coalesce(col("ln"), col("in")).as("n_id"),
        (when(col("lr").isNotNull,
          lit(1.0) / (lit(RrfK) + col("lr")).cast("double"))
          .otherwise(lit(0.0)) +
          when(col("ir").isNotNull,
            lit(1.0) / (lit(RrfK) + col("ir")).cast("double"))
            .otherwise(lit(0.0))).as("rrf"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= Similarity.K)
      .select("q_id", "n_id", "rrf", "rank")
      .orderBy("q_id", "rank")
  }

  /** Rocchio pseudo-relevance feedback (the standard second-pass IR
    * retrieval ensemble beside [[rrfFusion]]'s rank fusion): each query
    * vector is EXPANDED by the mean of its top-3 first-pass neighbors,
    * q' = q + (n₁+n₂+n₃)/3, then the corpus is re-ranked against q'.
    * Float determinism end-to-end: the neighbor sum is an explicitly
    * parenthesized fixed-order chain ((n₁+n₂)+n₃) per element, the
    * expanded vector is rounded back to FLOAT on both engines (IEEE
    * round-to-nearest, identical), and both cosine passes are the
    * sequential-fold double dot ([[VectorFunctions]] contract) — so
    * ranks and scores hash-match.
    *
    * 100 TB shape: pass 1 is the broadcast-queries brute-force scan
    * (10 queries; the ANN tiers are the indexed alternative), the
    * 3-neighbor pivot is three 10-row broadcast joins, and pass 2 is
    * ONE more corpus scan against the 10 expanded vectors — 2 scans
    * total, no corpus×corpus join anywhere. The 30-row top3 relation
    * is localCheckpointed: three pivot consumers would otherwise
    * re-run the first-pass scan each. */
  val rocchioPrf: Q = Q(
    "sim_rocchio_prf", {
      import VectorFunctions.{duckCosine => dc}
      val dim = 64
      s"""WITH q AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
         |  WHERE vec_id < ${Similarity.NumQueries}),
         |top3 AS MATERIALIZED (
         |  SELECT q_id, rnk, c_emb FROM (
         |    SELECT q.q_id, c.embedding AS c_emb,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY ${dc("q.q_emb", "c.embedding", dim)} DESC,
         |                 c.vec_id) AS rnk
         |    FROM q JOIN embeddings c ON c.vec_id <> q.q_id)
         |  WHERE rnk <= 3),
         |piv AS (
         |  SELECT a.q_id, a.c_emb AS n1, b.c_emb AS n2, c.c_emb AS n3
         |  FROM top3 a JOIN top3 b ON b.q_id = a.q_id AND b.rnk = 2
         |       JOIN top3 c ON c.q_id = a.q_id AND c.rnk = 3
         |  WHERE a.rnk = 1),
         |qp AS MATERIALIZED (
         |  SELECT p.q_id,
         |    LIST_TRANSFORM(RANGE(1, ${dim + 1}),
         |      i -> CAST(qq.q_emb[i]::DOUBLE +
         |        ((p.n1[i]::DOUBLE + p.n2[i]::DOUBLE) + p.n3[i]::DOUBLE)
         |          / 3.0::DOUBLE AS FLOAT)) AS e_emb
         |  FROM piv p JOIN q qq ON qq.q_id = p.q_id)
         |SELECT q_id, n_id, rank, sim FROM (
         |  SELECT qp.q_id, c.vec_id AS n_id,
         |    ${dc("qp.e_emb", "c.embedding", dim)} AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY qp.q_id
         |      ORDER BY ${dc("qp.e_emb", "c.embedding", dim)} DESC,
         |               c.vec_id) AS rank
         |  FROM qp JOIN embeddings c ON c.vec_id <> qp.q_id)
         |WHERE rank <= ${Similarity.K}
         |ORDER BY q_id, rank""".stripMargin
    }) { (s, d) =>
    import VectorFunctions.{dot, norm}
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w1 = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    val top3 = e
      .select(col("vec_id").as("n_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
      .join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("sim",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rnk", row_number().over(w1))
      .filter(col("rnk") <= 3)
      .select("q_id", "rnk", "c_emb")
      .localCheckpoint(true) // 3·|queries| rows; three pivot consumers
    def nth(k: Int, as: String) = top3.filter(col("rnk") === k)
      .select(col("q_id"), col("c_emb").as(as))
    val qp = nth(1, "n1").join(nth(2, "n2"), "q_id")
      .join(nth(3, "n3"), "q_id")
      .join(q.select("q_id", "q_emb"), "q_id")
      .withColumn("t12", zip_with(col("n1"), col("n2"),
        (a, b) => a.cast("double") + b.cast("double")))
      .withColumn("t", zip_with(col("t12"), col("n3"),
        (a, b) => a + b.cast("double")))
      .withColumn("e_emb", zip_with(col("q_emb"), col("t"),
        (x, sm) => (x.cast("double") + sm / lit(3.0)).cast("float")))
      .select(col("q_id"), col("e_emb"), norm(col("e_emb")).as("e_nrm"))
    val w2 = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    e.select(col("vec_id").as("n_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
      .join(broadcast(qp), col("n_id") =!= col("q_id"))
      .withColumn("sim",
        dot(col("e_emb"), col("c_emb")) / (col("e_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= Similarity.K)
      .select("q_id", "n_id", "rank", "sim")
      .orderBy("q_id", "rank")
  }

  val all: Seq[Q] = Seq(ivfTuning, rrfFusion, rocchioPrf)
}
