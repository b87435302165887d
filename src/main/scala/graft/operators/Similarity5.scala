package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.functions.VectorFunctions.{cosine, duckCosine}

/** Fifth similarity batch — the contrastive-training data surface over
  * the embedding table: hard-negative mining (the top-k most-similar
  * WRONG-label neighbors per query — what a contrastive trainer pairs
  * against each anchor), a triplet-margin audit (nearest-positive vs
  * nearest-negative similarity gap per anchor), and the per-dimension
  * variance diagnostic (collapsed/anisotropic dimensions are the
  * standard embedding-health check before any ANN index is built).
  *
  * 100 TB shape: the eval slice is the doubly-bounded every-20th ∧
  * id<cap broadcast of [[Similarity3]]; the corpus is scanned once,
  * never shuffled before per-query rank windows that WindowGroupLimit
  * bounds to K rows; the dim diagnostic is one posexplode + 64-group
  * hash agg with map-side combine and exact fixed-point sums. */
object Similarity5 {

  private val EmbDim = 64
  private val K = 5
  private val EvalCap = 10000
  /** ×2²⁰ fixed point for per-dim component sums: components are
    * O(1), squares O(1), so Σv² at 2⁴⁰/row fits DECIMAL(38,0) at any
    * corpus size while staying exact. */
  private val DimScale = 1048576.0

  private def evalSlices(s: org.apache.spark.sql.SparkSession, d: String) = {
    val e = embeddings(s, d)
    val isEval = col("vec_id") % 20 === 0 && col("vec_id") < EvalCap
    val q = e.filter(isEval)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("label").as("true_label"))
    val c = e.filter(!isEval)
      .select(col("vec_id").as("n_id"), col("embedding").as("ce"),
        col("label").as("n_label"))
    (q, c)
  }

  private val EvalCtes =
    s"""q AS (
       |  SELECT vec_id AS q_id, embedding AS qe, label AS true_label
       |  FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < $EvalCap),
       |c AS (
       |  SELECT vec_id AS n_id, embedding AS ce, label AS n_label
       |  FROM embeddings
       |  WHERE NOT (vec_id % 20 = 0 AND vec_id < $EvalCap))""".stripMargin

  /** Hard-negative mining: per eval anchor, the [[K]] highest-cosine
    * corpus vectors whose label DIFFERS from the anchor's — the
    * negatives a contrastive trainer wants (near the anchor yet wrong).
    * Deterministic rank ties on n_id. */
  val hardNegatives: Q = Q(
    "sim_hard_negatives",
    s"""WITH $EvalCtes,
       |nn AS (
       |  SELECT q_id, true_label, n_id, n_label,
       |    ${duckCosine("qe", "ce", EmbDim)} AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY ${duckCosine("qe", "ce", EmbDim)} DESC, n_id) AS rank
       |  FROM q JOIN c ON n_label <> true_label)
       |SELECT q_id, true_label, rank, n_id AS neg_id, n_label AS neg_label,
       |  cos
       |FROM nn WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin) { (s, d) =>
    val (q, c) = evalSlices(s, d)
    val w = Window.partitionBy("q_id")
      .orderBy(cosine(col("qe"), col("ce")).desc, col("n_id"))
    c.join(broadcast(q), col("n_label") =!= col("true_label"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("true_label"), col("rank").cast("long"),
        col("n_id").as("neg_id"), col("n_label").as("neg_label"),
        cosine(col("qe"), col("ce")).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** Triplet-margin audit: per eval anchor, the best same-label and
    * best different-label cosine in the corpus and their gap — margin
    * < 0 means the anchor's nearest neighbor has the wrong label (the
    * retrieval-failure census for the space). Plain conditional maxes,
    * no window: max over bit-identical fold doubles is
    * order-independent. */
  val marginAudit: Q = Q(
    "sim_margin_audit",
    s"""WITH $EvalCtes,
       |sims AS (
       |  SELECT q_id, true_label,
       |    MAX(CASE WHEN n_label = true_label
       |        THEN ${duckCosine("qe", "ce", EmbDim)} END) AS pos_sim,
       |    MAX(CASE WHEN n_label <> true_label
       |        THEN ${duckCosine("qe", "ce", EmbDim)} END) AS neg_sim
       |  FROM q JOIN c ON TRUE GROUP BY 1, 2)
       |SELECT q_id, true_label, pos_sim, neg_sim,
       |  pos_sim - neg_sim AS margin,
       |  pos_sim - neg_sim < 0.0::DOUBLE AS violated
       |FROM sims
       |ORDER BY q_id""".stripMargin) { (s, d) =>
    val (q, c) = evalSlices(s, d)
    val cos = cosine(col("qe"), col("ce"))
    c.join(broadcast(q))
      .groupBy("q_id", "true_label")
      .agg(
        max(when(col("n_label") === col("true_label"), cos)).as("pos_sim"),
        max(when(col("n_label") =!= col("true_label"), cos)).as("neg_sim"))
      .select(col("q_id"), col("true_label"), col("pos_sim"), col("neg_sim"),
        (col("pos_sim") - col("neg_sim")).as("margin"),
        (col("pos_sim") - col("neg_sim") < 0.0).as("violated"))
      .orderBy("q_id")
  }

  /** Per-dimension embedding health: mean, variance, and extrema of
    * every coordinate across the corpus — collapsed (near-zero
    * variance) or runaway dimensions are what anisotropy audits look
    * for. Components quantize to ×2²⁰ BIGINTs; mean and variance are
    * exact-integer sums with one double tree at the end
    * (n·Σv² − (Σv)² over n²·2⁴⁰). */
  val dimVariance: Q = Q(
    "sim_dim_variance",
    s"""WITH ex AS (
       |  SELECT i.i AS dim,
       |    CAST(FLOOR(embedding[i.i]::DOUBLE * $DimScale::DOUBLE
       |      + 0.5::DOUBLE) AS BIGINT) AS v
       |  FROM embeddings, UNNEST(RANGE(1, ${EmbDim + 1})) i(i)),
       |ag AS (
       |  SELECT dim, COUNT(*)::BIGINT AS n,
       |    SUM(CAST(v AS HUGEINT))::HUGEINT AS sv,
       |    SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT))::HUGEINT AS svv,
       |    MIN(v) AS mn, MAX(v) AS mx
       |  FROM ex GROUP BY 1)
       |SELECT CAST(dim AS BIGINT) AS dim, n,
       |  CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) / $DimScale::DOUBLE AS mean,
       |  (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
       |    - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
       |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       |       * $DimScale::DOUBLE * $DimScale::DOUBLE) AS variance,
       |  CAST(mn AS DOUBLE) / $DimScale::DOUBLE AS min_val,
       |  CAST(mx AS DOUBLE) / $DimScale::DOUBLE AS max_val
       |FROM ag
       |ORDER BY dim""".stripMargin) { (s, d) =>
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ex = embeddings(s, d)
      .select(posexplode(col("embedding")))
      .select((col("pos") + 1).cast("long").as("dim"),
        floor(col("col").cast("double") * DimScale + 0.5).cast("long")
          .as("v"))
    val nD = col("n").cast("double")
    ex.groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).as("sv"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("svv"),
        min("v").as("mn"), max("v").as("mx"))
      .select(col("dim"), col("n"),
        (col("sv").cast("double") / nD / DimScale).as("mean"),
        ((nD * col("svv").cast("double") -
          col("sv").cast("double") * col("sv").cast("double")) /
          (nD * nD * DimScale * DimScale)).as("variance"),
        (col("mn").cast("double") / DimScale).as("min_val"),
        (col("mx").cast("double") / DimScale).as("max_val"))
      .orderBy("dim")
  }

  val all: Seq[Q] = Seq(hardNegatives, marginAudit, dimVariance)
}
