package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.functions.VectorFunctions._

/** Scalar quantization (SQ8) ANN — the remaining classical compression
  * tier of the similarity stack (SURVEY.md §2.5; FAISS's SQ8 recipe,
  * the one the reference's ANN consumers reach for before PQ): each
  * float component is linearly quantized to one byte against
  * per-DIMENSION corpus min/max, candidate scoring runs asymmetric
  * (float query × reconstructed byte codes, 4× smaller than float32),
  * and only a shortlist per query ever touches full vectors again.
  * Complements the existing tiers: LSH prunes, IVF prunes, PQ
  * compresses at 32×/lossier, SQ8 compresses at 4×/finer — and like
  * `sim_ann_pq` this registers the WHOLE-CORPUS compressed scan (the
  * compression tier in isolation); composing with IVF pruning is
  * exactly the `sim_ivfpq_adc` construction.
  *
  * DETERMINISM: the codebook is 64 (min, max) pairs — exact float
  * comparisons, order-independent; encode/reconstruct are single IEEE
  * expressions spelled identically in both engines; every float
  * reduction (asymmetric cosine, exact re-rank) is the sequential
  * fold both engines reproduce bit-for-bit, so the full output is
  * hash-checked.
  *
  * 100 TB shape: the codebook is a 64-row hash agg (map-side
  * combined, broadcast back); encoding is map-side; the asymmetric
  * scan is |Q| broadcast queries × corpus (linear, no pairwise vector
  * relation, no collect); re-rank touches shortlist·|Q| rows. */
object Similarity12 {

  private val EmbDim = 64
  private val NumQueries = 10
  private val K = Similarity.K
  /** shared by [[sq8Topk]]'s default AND the oracle (r06 rule). */
  private val Shortlist = 150

  /** Sequential-fold dot over two arrays via codegen'd HOFs — the
    * double-array counterpart of the native [[dot]] expression, same
    * fold order as [[duckDot]]'s `::DOUBLE` list_reduce. */
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** SQ8 encode + asymmetric ranking: (q_id, n_id, srank ≤ depth) —
    * the shared head of [[sq8Topk]] and the tuning table. */
  private[operators] def sq8Shortlist(emb: DataFrame, numQueries: Int,
      depth: Int): DataFrame = {
    val compD = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "vf")))
      .select(col("vec_id"), col("pos"), col("vf").cast("double").as("v"))
    // per-dimension training: 64 rows of global state (map-side combined)
    val dims = compD.groupBy("pos")
      .agg(min("v").as("mn"), max("v").as("mx"))
    // r16: the codebook folds to ONE broadcast row of pos-ordered arrays,
    // and encode+reconstruct run as a single array `transform` over the
    // original embedding — the previous explode → per-(vec, pos) join →
    // collect_list/array_sort regroup shuffled corpus×64 rows twice for
    // what is a per-row map (guide §2.3/§2.4). Element expressions are
    // op-for-op identical (same IEEE order), so xhat is bit-equal.
    val dimArr = broadcast(dims.agg(
      transform(array_sort(collect_list(struct(col("pos"), col("mn").as("v")))),
        x => x.getField("v")).as("mns"),
      transform(array_sort(collect_list(struct(col("pos"), col("mx").as("v")))),
        x => x.getField("v")).as("mxs")))
    val xhat = emb.crossJoin(dimArr)
      .select(col("vec_id"),
        transform(col("embedding"), (vf, i) => {
          val v = vf.cast("double")
          val mn = element_at(col("mns"), i + 1)
          val mx = element_at(col("mxs"), i + 1)
          val code = when(mx === mn, lit(0L))
            .otherwise(floor((v - mn) * lit(255.0) / (mx - mn) + lit(0.5))
              .cast("long"))
          // when mx = mn the formula collapses to mn (code 0)
          mn + code.cast("double") * (mx - mn) / lit(255.0)
        }).as("xhat"))
    // asymmetric scan: float query (widened) vs reconstructed corpus
    val qD = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("q_emb"))
    val wS = Window.partitionBy("q_id").orderBy(col("ascore").desc, col("n_id"))
    xhat.select(col("vec_id").as("n_id"), col("xhat"))
      .join(broadcast(qD), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        (hofDot(col("q_emb"), col("xhat"))
          / (sqrt(hofDot(col("q_emb"), col("q_emb")))
            * sqrt(hofDot(col("xhat"), col("xhat"))))).as("ascore"))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= depth)
      .select("q_id", "n_id", "srank")
  }

  /** SQ8 encode + asymmetric-cosine shortlist + exact re-rank.
    * Output: (q_id, n_id, rank, sim). */
  def sq8Topk(emb: DataFrame, numQueries: Int, k: Int,
      shortlist: Int = Shortlist): DataFrame = {
    val short = sq8Shortlist(emb, numQueries, shortlist)
      .select("q_id", "n_id")
    // exact cosine re-rank over shortlist·|Q| rows only (float arrays,
    // the native codegen'd fold — the pqTopk tail)
    val corpus = emb.select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"), norm(col("embedding")).as("n_nrm"))
    val qSide = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"))
    val wR = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    short
      .join(corpus, "n_id")
      .join(broadcast(qSide), "q_id")
      .select(col("q_id"), col("n_id"),
        (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
          .as("sim"))
      .withColumn("rank", row_number().over(wR).cast("bigint"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
      .orderBy("q_id", "rank")
  }

  /** The SQ8 encode + asymmetric ranking CTE chain (comp → … →
    * ranked(q_id, n_id, srank)) shared by [[duckSq8]] and the tuning
    * oracle — factored so both oracles quantize with the SAME codebook
    * and folds by construction. */
  private lazy val duckSq8Ctes: String =
    s"""comp AS (
       |  SELECT vec_id, UNNEST(RANGE(0, $EmbDim)) AS pos,
       |    UNNEST(embedding) AS vf
       |  FROM embeddings),
       |compd AS (SELECT vec_id, pos, vf::DOUBLE AS v FROM comp),
       |dims AS (SELECT pos, MIN(v) AS mn, MAX(v) AS mx
       |         FROM compd GROUP BY pos),
       |codes AS (
       |  SELECT vec_id, pos, mn, mx,
       |    CASE WHEN mx = mn THEN 0
       |         ELSE CAST(FLOOR((v - mn) * 255.0::DOUBLE / (mx - mn)
       |                         + 0.5::DOUBLE) AS BIGINT) END AS code
       |  FROM compd JOIN dims USING (pos)),
       |recon AS (
       |  SELECT vec_id, pos,
       |    mn + CAST(code AS DOUBLE) * (mx - mn) / 255.0::DOUBLE AS xh
       |  FROM codes),
       |xh AS (SELECT vec_id, LIST(xh ORDER BY pos) AS xhat
       |       FROM recon GROUP BY vec_id),
       |q AS (SELECT vec_id AS q_id, embedding FROM embeddings
       |      WHERE vec_id < $NumQueries),
       |approx AS (
       |  SELECT q.q_id, x.vec_id AS n_id,
       |    ${duckDot("q.embedding", "x.xhat", EmbDim)}
       |      / (SQRT(${duckDot("q.embedding", "q.embedding", EmbDim)})
       |         * SQRT(${duckDot("x.xhat", "x.xhat", EmbDim)})) AS ascore
       |  FROM xh x CROSS JOIN q
       |  WHERE x.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT q_id, n_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY ascore DESC, n_id) AS srank
       |  FROM approx)""".stripMargin

  /** [[sq8Topk]] restated over DuckDB primitives — identical encode
    * expression, identical sequential folds. */
  private lazy val duckSq8: String =
    s"""WITH $duckSq8Ctes,
       |short AS (
       |  SELECT q_id, n_id FROM ranked WHERE srank <= $Shortlist)
       |SELECT q_id, n_id, rank, sim FROM (
       |  SELECT s.q_id, s.n_id,
       |    ${duckCosine("qe.embedding", "c.embedding", EmbDim)} AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY s.q_id
       |      ORDER BY ${duckCosine("qe.embedding", "c.embedding", EmbDim)} DESC, s.n_id) AS rank
       |  FROM short s
       |  JOIN embeddings qe ON qe.vec_id = s.q_id
       |  JOIN embeddings c ON c.vec_id = s.n_id)
       |WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin

  /** SQ8 as a registered operator — deterministic min/max codebook →
    * FULL oracle check; `Similarity12Spec` additionally measures
    * recall vs brute force (1.00 on the test corpus, vs the PQ tier's
    * 0.66), determinism, and the k-per-query contract. */
  val sq8Rerank: Q = Q("sim_sq8_rerank", duckSq8) { (s, d) =>
    sq8Topk(embeddings(s, d), numQueries = NumQueries, k = K)
  }

  /** The shortlist-depth knob sweep (r10 `dedup_lsh_tuning` /
    * `sim_filtered_tuning` pattern applied to SQ8): for each candidate
    * depth, what fraction of the TRUE top-k (full-precision brute
    * force) already sits inside the SQ8-ranked shortlist — the
    * recall-vs-rerank-cost curve an operator reads before fixing the
    * depth. Counts are exact integers (one division per row at the
    * end), so the whole table hash-checks. 100 TB shape: the exact
    * top-k is |Q|-broadcast brute force (the audit tier that exists
    * anyway as `sim_topk_cosine`), the approx ranking is the SQ8 scan,
    * and the sweep is a ≤|depths|·|Q|·k-row aggregation. */
  val sq8Tuning: Q = {
    val depths = Seq(10, 25, 50, 100, 150)
    Q(
      "sim_sq8_tuning",
      s"""WITH $duckSq8Ctes,
         |exact AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${duckCosine("q.embedding", "c.embedding", EmbDim)} DESC, c.vec_id) AS rank
         |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         |    WHERE q.vec_id < $NumQueries)
         |  WHERE rank <= $K),
         |hit AS (
         |  SELECT e.q_id, e.n_id, r.srank
         |  FROM exact e LEFT JOIN ranked r
         |    ON r.q_id = e.q_id AND r.n_id = e.n_id),
         |d AS (SELECT UNNEST([${depths.mkString(", ")}]) AS depth)
         |SELECT CAST(d.depth AS BIGINT) AS depth,
         |  COUNT(CASE WHEN hit.srank IS NOT NULL AND hit.srank <= d.depth
         |             THEN 1 END)::BIGINT AS n_found,
         |  CAST(COUNT(CASE WHEN hit.srank IS NOT NULL
         |                  AND hit.srank <= d.depth THEN 1 END) AS DOUBLE)
         |    / ${NumQueries * K}::DOUBLE AS recall
         |FROM d CROSS JOIN hit
         |GROUP BY d.depth
         |ORDER BY d.depth""".stripMargin) { (s, d) =>
      val emb = embeddings(s, d)
      val ranked = sq8Shortlist(emb, NumQueries, depths.max)
      val e = emb.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      val queries = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val exact = e
        .select(col("vec_id").as("n_id"), col("embedding").as("c_emb"),
          col("nrm").as("c_nrm"))
        .join(broadcast(queries), col("n_id") =!= col("q_id"))
        .withColumn("sim",
          dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select("q_id", "n_id")
      val hit = exact.join(ranked, Seq("q_id", "n_id"), "left")
      hit
        .crossJoin(broadcast(
          s.range(0, 1).select(
            explode(array(depths.map(lit): _*)).as("depth"))))
        .groupBy("depth")
        .agg(count(when(col("srank").isNotNull &&
            col("srank") <= col("depth"), 1)).as("n_found"))
        .select(col("depth").cast("bigint").as("depth"), col("n_found"),
          (col("n_found").cast("double") / lit((NumQueries * K).toDouble))
            .as("recall"))
        .orderBy("depth")
    }
  }

  val all: Seq[Q] = Seq(sq8Rerank, sq8Tuning)
}
