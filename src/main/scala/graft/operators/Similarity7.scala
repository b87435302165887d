package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.functions.VectorFunctions.{cosine, duckCosine}

/** Seventh similarity batch — the full deterministic Lloyd loop:
  * three k-means rounds (assign → update → …) end-to-end in one
  * query, closing the cluster tier whose single steps
  * (`sim_cluster_assign`, `sim_centroid_update`) were already
  * registered. Determinism comes from the same discipline as the
  * PageRank/PCA flagships:
  *
  *   - embeddings quantize ONCE to ×2²⁰ integers; every centroid
  *     update is an exact integer mean with sign-split truncating
  *     division (|s| div n negated for negative sums — truncation and
  *     flooring agree on non-negatives, so Spark `div` ≡ DuckDB `//`);
  *   - centroid components cq/2²⁰ carry ≤21 mantissa bits (components
  *     are within ±1), so the float cast on the Spark side is EXACT
  *     and both engines fold cosine over bit-identical values;
  *   - assignment is argmax cosine with (cos desc, cid) tie order —
  *     the `sim_cluster_assign` contract, per round.
  *
  * 100 TB shape: per round, ONE corpus scan joined to a broadcast
  * 8-row centroid table (8-row rank window per vector), one 8×64-group
  * update agg with map-side combine. Rounds are a fixed constant;
  * nothing driver-side ever sees a corpus-sized relation. Empty
  * clusters simply drop out of later rounds on both engines alike. */
object Similarity7 {

  private val Dim = 64
  private val K = 8
  private val Rounds = 3
  private val CScale = 1048576L // 2^20

  /** quantized corpus: vec_id, e (raw floats), q (×2²⁰ longs) */
  private def quantized(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("e"),
        transform(col("embedding"),
          x => floor(x.cast("double") * CScale.toDouble + 0.5).cast("long"))
          .as("q"))

  /** centroid table (cid, carr float array) from per-(cid,dim) integer
    * components */
  private def toCentroids(cq: DataFrame): DataFrame =
    cq.groupBy("cid")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("cq")))),
        p => (p.getField("cq").cast("double") / CScale.toDouble)
          .cast("float")).as("carr"))

  private def duckRound(k: Int): String =
    s"""a$k AS MATERIALIZED (
       |  SELECT vec_id, cid FROM (
       |    SELECT qv.vec_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY qv.vec_id
       |        ORDER BY ${duckCosine("qv.e", "c.carr", Dim)} DESC, c.cid)
       |        AS rn
       |    FROM qv CROSS JOIN c${k - 1} c)
       |  WHERE rn = 1),
       |u$k AS MATERIALIZED (
       |  SELECT a.cid, i.i AS dim,
       |    CASE WHEN CAST(SUM(qv.q[i.i]) AS HUGEINT) >= 0
       |      THEN CAST(SUM(qv.q[i.i]) AS HUGEINT) // COUNT(*)
       |      ELSE -((-CAST(SUM(qv.q[i.i]) AS HUGEINT)) // COUNT(*))
       |    END AS cq
       |  FROM a$k a JOIN qv ON qv.vec_id = a.vec_id,
       |    UNNEST(RANGE(1, ${Dim + 1})) i(i)
       |  GROUP BY 1, 2),
       |c$k AS MATERIALIZED (
       |  SELECT cid,
       |    LIST(CAST(cq AS DOUBLE) / $CScale::DOUBLE ORDER BY dim) AS carr
       |  FROM u$k GROUP BY 1)""".stripMargin

  /** Final state after [[Rounds]] Lloyd rounds: one row per surviving
    * (cluster, dimension) with the integer-exact centroid component,
    * plus the cluster's member count from the final assignment. */
  val kmeansRounds: Q = Q(
    "sim_kmeans_rounds",
    s"""WITH qv AS MATERIALIZED (
       |  SELECT vec_id, embedding AS e,
       |    LIST_TRANSFORM(embedding, x ->
       |      CAST(FLOOR(x::DOUBLE * $CScale::DOUBLE + 0.5::DOUBLE)
       |        AS BIGINT)) AS q
       |  FROM embeddings),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id AS cid,
       |    LIST_TRANSFORM(q, v -> CAST(v AS DOUBLE) / $CScale::DOUBLE)
       |      AS carr
       |  FROM qv WHERE vec_id < $K),
       |${(1 to Rounds).map(duckRound).mkString(",\n")},
       |sz AS (SELECT cid, COUNT(*)::BIGINT AS n_members
       |       FROM a$Rounds GROUP BY 1)
       |SELECT u.cid, u.dim::BIGINT AS dim,
       |  CAST(u.cq AS DOUBLE) / $CScale::DOUBLE AS centroid,
       |  sz.n_members
       |FROM u$Rounds u JOIN sz ON sz.cid = u.cid
       |ORDER BY u.cid, u.dim""".stripMargin) { (s, d) =>
    val qv = quantized(s, d).localCheckpoint()
    var centroids = qv.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"),
        transform(col("q"),
          v => (v.cast("double") / CScale.toDouble).cast("float"))
          .as("carr"))
    var update: DataFrame = null
    for (_ <- 1 to Rounds) {
      // r16: argmax-by-(cos DESC, cid ASC) as ONE hash agg instead of a
      // row_number window — max(struct(cos, -cid)) picks the identical
      // row (cid is unique per vector, so the double never ties into the
      // second field), the K-way fan-out collapses MAP-SIDE before the
      // shuffle (corpus rows instead of corpus×K, no sort — guide §2.3),
      // and carrying q through the agg (all rows of a vec_id group share
      // it) removes the former corpus⋈corpus re-join per round.
      val assign = qv.crossJoin(broadcast(centroids))
        .groupBy("vec_id")
        .agg(
          max(struct(cosine(col("e"), col("carr")).as("c"),
            (-col("cid")).as("nc"))).as("m"),
          first(col("q")).as("q"))
        .select(col("vec_id"), (-col("m.nc")).as("cid"), col("q"))
      update = assign
        .select(col("cid"), posexplode(col("q")).as(Seq("p", "qv")))
        .groupBy(col("cid"), (col("p") + 1).cast("long").as("dim"))
        .agg(when(sum("qv") >= 0, expr("sum(qv) div count(1)"))
          .otherwise(-expr("(-sum(qv)) div count(1)")).as("cq"),
          // r17: member count rides the update agg (each member
          // contributes exactly one row per dim), so the final output
          // needs NO fourth corpus scan for sz and no sz join
          count(lit(1)).as("nm"))
        .localCheckpoint()
      centroids = toCentroids(update)
    }
    // every update row's nm IS its cluster's member count — the former
    // sz re-aggregation of the round-3 assignment re-ran the corpus
    // scan in the final job (r16 plan: 4 corpus scans; now 3 + a
    // 512-row RDD read)
    update
      .select(col("cid"), col("dim"),
        (col("cq").cast("double") / CScale.toDouble).as("centroid"),
        col("nm").as("n_members"))
      .orderBy("cid", "dim")
  }

  private val KnnK = 5
  private val KnnStride = 10
  private val KnnIdCap = 20000L
  private val KnnDim = 64

  /** Mutual k-NN graph construction over the audit slice (every
    * [[KnnStride]]-th vector ∧ id < [[KnnIdCap]] — the Similarity5
    * doubly-bounded eval-slice convention, so the slice is
    * SF-independent beyond sf0.1): directed top-[[KnnK]] cosine edges
    * within the slice, kept only when RECIPROCATED (a ∈ kNN(b) ∧
    * b ∈ kNN(a), a < b). The mutual graph is the standard substrate
    * for density clustering and graph-based dedup — mutuality prunes
    * hub edges that one-directional kNN drags in.
    *
    * sim is the sequential-fold cosine, identical in both orientations
    * (same index-order fold), so the mutual join compares bit-equal
    * doubles. At 100 TB the slice stays an audit; the production graph
    * feeds the ANN tier's bucketed candidates instead of the slice
    * cross join. */
  val knnGraph: Q = Q(
    "sim_knn_graph",
    s"""WITH nodes AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id % $KnnStride = 0 AND vec_id < $KnnIdCap),
       |dir AS (
       |  SELECT a_id, b_id, sim FROM (
       |    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |      ${duckCosine("a.embedding", "b.embedding", KnnDim)} AS sim,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${duckCosine("a.embedding", "b.embedding", KnnDim)} DESC,
       |                 b.vec_id) AS rk
       |    FROM nodes a JOIN nodes b ON b.vec_id <> a.vec_id)
       |  WHERE rk <= $KnnK)
       |SELECT d1.a_id, d1.b_id, d1.sim
       |FROM dir d1 JOIN dir d2 ON d2.a_id = d1.b_id AND d2.b_id = d1.a_id
       |WHERE d1.a_id < d1.b_id
       |ORDER BY d1.a_id, d1.b_id""".stripMargin) { (s, d) =>
    val nodes = embeddings(s, d)
      .filter(col("vec_id") % KnnStride === 0 && col("vec_id") < KnnIdCap)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true) // ≤2k rows: one slice scan, three readers
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    val dir = nodes.as("a")
      .join(broadcast(nodes.select(col("vec_id").as("b_vid"),
        col("embedding").as("b_emb"))), col("b_vid") =!= col("vec_id"))
      .select(col("vec_id").as("a_id"), col("b_vid").as("b_id"),
        cosine(col("embedding"), col("b_emb")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= KnnK)
      .select("a_id", "b_id", "sim")
      .localCheckpoint(true)
    dir.as("d1")
      .join(dir.select(col("a_id").as("r_a"), col("b_id").as("r_b")).as("d2"),
        col("r_a") === col("d1.b_id") && col("r_b") === col("d1.a_id"))
      .filter(col("d1.a_id") < col("d1.b_id"))
      .select(col("d1.a_id").as("a_id"), col("d1.b_id").as("b_id"),
        col("d1.sim").as("sim"))
      .orderBy("a_id", "b_id")
  }

  val all: Seq[Q] = Seq(kmeansRounds, knnGraph)
}
