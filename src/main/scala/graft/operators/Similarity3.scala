package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.functions.VectorFunctions.{cosine, duckCosine}

/** Third similarity batch: the model-eval surface over the embedding
  * table — a brute-force k-NN majority-vote classifier, the standard
  * "is this embedding space any good" probe (label prediction accuracy
  * of each held-out vector against its nearest labeled neighbors).
  */
object Similarity3 {

  private val EmbDim = 64
  private val K = 5

  /** k-NN label classification: every 20th vector is a held-out query;
    * its label is predicted by majority vote over its [[K]] nearest
    * remaining vectors by exact cosine, ties broken by (votes desc,
    * label asc) — fully deterministic, so the oracle mirrors it row
    * for row.
    *
    * 100 TB shape: the query slice broadcasts (bounded by the eval-set
    * size), the corpus is scanned once and never shuffled before the
    * rank window, and the per-query window is WindowGroupLimit-bounded
    * to [[K]] rows before the vote agg — the same plan skeleton as
    * `sim_topk_cosine`, whose scale path (bucketed ANN probes) applies
    * unchanged when the eval set outgrows broadcast. Scores are
    * sequential-fold doubles (codegen'd [[graft.functions.DotProduct]])
    * → bit-identical to DuckDB's list_reduce fold.
    */
  val knnClassify: Q = Q(
    "sim_knn_classify",
    s"""WITH q AS (
       |  SELECT vec_id AS q_id, embedding AS qe, label AS true_label
       |  FROM embeddings WHERE vec_id % 20 = 0),
       |c AS (
       |  SELECT vec_id AS n_id, embedding AS ce, label AS n_label
       |  FROM embeddings WHERE vec_id % 20 <> 0),
       |nn AS (
       |  SELECT q_id, true_label, n_label,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY ${duckCosine("qe", "ce", EmbDim)} DESC, n_id) AS rank
       |  FROM q JOIN c ON TRUE),
       |votes AS (
       |  SELECT q_id, true_label, n_label, COUNT(*) AS v
       |  FROM nn WHERE rank <= $K GROUP BY q_id, true_label, n_label),
       |pred AS (
       |  SELECT q_id, true_label, n_label AS pred_label,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY v DESC, n_label) AS rn
       |  FROM votes)
       |SELECT q_id, true_label, pred_label, pred_label = true_label AS correct
       |FROM pred WHERE rn = 1
       |ORDER BY q_id""".stripMargin) { (s, d) =>
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("label").as("true_label"))
    val c = e.filter(col("vec_id") % 20 =!= 0)
      .select(col("vec_id").as("n_id"), col("embedding").as("ce"),
        col("label").as("n_label"))
    val w = Window.partitionBy("q_id")
      .orderBy(cosine(col("qe"), col("ce")).desc, col("n_id"))
    val nn = c.join(broadcast(q))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
    val votes = nn.groupBy("q_id", "true_label", "n_label")
      .agg(count(lit(1)).as("v"))
    votes
      .withColumn("rn", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("v").desc, col("n_label"))))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("true_label"),
        col("n_label").as("pred_label"),
        (col("n_label") === col("true_label")).as("correct"))
      .orderBy("q_id")
  }

  val all: Seq[Q] = Seq(knnClassify)
}
