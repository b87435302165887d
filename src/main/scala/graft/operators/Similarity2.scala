package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.functions.VectorFunctions._

/** Product quantization (PQ) ANN — the memory-compression tier of the
  * similarity stack (SURVEY.md §2.5): each 64-dim float vector becomes
  * m=4 one-byte codes (64× smaller than float32), candidate scoring is
  * table lookups instead of float dot products, and only a short-listed
  * fraction of the corpus ever touches the full vectors again.
  *
  * The 100 TB shape:
  *   - codebooks are m·kc tiny centroids — trained once (at scale: on a
  *     sample), broadcast everywhere; the corpus encode is one map-side
  *     pass per subspace;
  *   - ADC (asymmetric distance computation) is a hash join of the
  *     exploded (vec_id, subspace, code) relation against a
  *     |Q|·m·kc-row lookup table, then a sum per (query, vector) —
  *     linear in corpus size, NO pairwise vector math;
  *   - exact re-rank touches only `shortlist` rows per query.
  * Codebook training is seeded k-means → deterministic, but
  * implementation-specific → rows-only driver check; `Similarity2Spec`
  * measures recall against the exact brute-force top-k. */
object Similarity2 {

  private val EmbDim = 64
  private val NumQueries = 10
  private val K = Similarity.K

  /** PQ encode + ADC shortlist + exact re-rank.
    * Output: (q_id, n_id, rank, sim). */
  def pqTopk(emb: DataFrame, numQueries: Int, k: Int,
      m: Int = 4, kc: Int = 16, shortlist: Int = 150): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._
    val sub = EmbDim / m

    val sliced = emb.select(
      Seq(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm")) ++
        (0 until m).map(j =>
          array_to_vector(slice(col("embedding"), j * sub + 1, sub))
            .as(s"sub_$j")): _*)

    // one seeded k-means per subspace; models stay in scope to encode the
    // corpus AND to hand their centers to the query-side lookup tables.
    // Fits are independent → submitted concurrently (the executor pool
    // is idle between each fit's tiny jobs), and each trains on a
    // seeded sample capped at [[Similarity.FitSampleCap]] rows — the
    // corpus-independent codebook cost that 100 TB demands. The sample
    // is materialized once and shared by all m fits.
    val subCols =
      sliced.select((0 until m).map(j => col(s"sub_$j")): _*).cache()
    // fitSample's sizing count materializes the cache; the m fits then
    // re-read the in-memory columns, never the parquet scan
    val fitDf = Similarity.fitSample(subCols)
    import scala.collection.parallel.CollectionConverters._
    val models = (0 until m).par.map { j =>
      new KMeans().setK(kc).setSeed(42L + j).setMaxIter(4)
        .setFeaturesCol(s"sub_$j").setPredictionCol(s"code_$j")
        .fit(fitDf)
    }.seq
    subCols.unpersist(blocking = false)
    val encoded = models.zipWithIndex
      .foldLeft(sliced) { case (df, (model, _)) => model.transform(df) }
      .select(Seq(col("vec_id")) ++
        (0 until m).map(j => col(s"code_$j")): _*)

    // exploded code relation: (vec_id, subspace j, code) — m rows/vector
    val codes = encoded.select(col("vec_id"),
        explode(array((0 until m).map(j =>
          struct(lit(j).as("j"), col(s"code_$j").as("code"))): _*)).as("jc"))
      .select(col("vec_id"), col("jc.j").as("j"), col("jc.code").as("code"))

    // query-side ADC lookup table: (q_id, j, code, partial squared L2) —
    // |Q|·m·kc rows, built driver-side from the broadcast-small centers
    val queryVecs = emb.filter(col("vec_id") < numQueries)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val lut = for {
      (qid, v) <- queryVecs.toSeq
      j <- 0 until m
      (center, code) <- models(j).clusterCenters.zipWithIndex
    } yield {
      val qSub = v.slice(j * sub, (j + 1) * sub)
      val d2 = center.toArray.zip(qSub)
        .map { case (c, q) => val t = c - q; t * t }.sum
      (qid, j, code, d2)
    }
    val lutDf = lut.toDF("q_id", "j", "code", "d2")

    // ADC: hash join on (j, code), sum the m partials per (query, vector)
    val w = Window.partitionBy("q_id").orderBy(col("adc"), col("n_id"))
    val short = codes
      .join(broadcast(lutDf), Seq("j", "code"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum("d2").as("adc"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("srank", row_number().over(w))
      .filter(col("srank") <= shortlist)
      .select("q_id", "n_id")

    // exact cosine re-rank over shortlist·|Q| rows only
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

  /** PQ ANN as a registered operator (approximate + k-means-seeded →
    * rows-only check; `Similarity2Spec` measures recall vs brute force). */
  val annPq: Q = Q.noOracle("sim_ann_pq") { (s, d) =>
    pqTopk(embeddings(s, d), numQueries = NumQueries, k = K)
  }

  val all: Seq[Q] = Seq(annPq)
}
