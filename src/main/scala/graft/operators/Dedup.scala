package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._
import graft.functions.VectorFunctions

/** Deduplication operators for LLM training-data pipelines (SURVEY.md
  * §2.5): exact, n-gram-Jaccard, MinHash-LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison —
  * exact dedup is one hash aggregation; Jaccard pairs come from an
  * inverted-index self-join on shingles (only docs sharing a shingle
  * meet); MinHash-LSH and SimHash bucket by signature bands so candidate
  * generation is a hash join; embedding near-dup's scale path is the
  * LSH-bucketed variant in [[Similarity]]. All hashing is computed
  * per-row with codegen'd expressions — no UDFs, no driver loops.
  */
object Dedup {

  val JaccardThreshold = 0.5

  /** distinct 3-gram word shingles of a document */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = split(trim(text), " ")
    // guard: sequence(1, size-2) would DESCEND for docs under n words
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*))))
  }

  private val duckShingles =
    """CASE WHEN LEN(STRING_SPLIT(TRIM(text), ' ')) < 3 THEN []::VARCHAR[]
      |  ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(TRIM(text), ' ')) - 1),
      |    i -> STRING_SPLIT(TRIM(text), ' ')[i] || ' ' || STRING_SPLIT(TRIM(text), ' ')[i+1] || ' ' || STRING_SPLIT(TRIM(text), ' ')[i+2])) END""".stripMargin

  /** Shared oracle: exact 3-gram-shingle Jaccard pairs ≥ threshold via an
    * inverted-index join — used for both the exact-Jaccard query and the
    * MinHash-LSH query (whose banding at b=16,r=2 has ≈1 recall at 0.5 on
    * any corpus, so its verified output equals the exact pair set). */
  private val duckJaccardPairs: String =
    s"""WITH sh AS (SELECT doc_id, $duckShingles AS s FROM documents),
       |ex AS (SELECT doc_id, LEN(s) AS n, UNNEST(s) AS shingle FROM sh),
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.n AS na, b.n AS nb, COUNT(*) AS inter
       |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT a_id, b_id, CAST(inter AS DOUBLE) / (na + nb - inter) AS sim
       |FROM pairs
       |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
       |ORDER BY a_id, b_id""".stripMargin

  /** Exact dedup: one representative (min doc_id) per identical
    * normalized text + copy count. Single hash aggregation — the 100 TB
    * plan is a shuffle on a 64-bit text hash, nothing else. */
  val exact: Q = Q(
    "dedup_exact",
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY LOWER(TRIM(text))
      |ORDER BY keep_id""".stripMargin) { (s, d) =>
    documents(s, d)
      .groupBy(lower(trim(col("text"))).as("norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")
  }

  /** Exact n-gram Jaccard near-dup: inverted-index self-join on distinct
    * shingles (docs only meet if they share one), count intersections,
    * single-division Jaccard. */
  val ngramJaccard: Q = Q("dedup_ngram_jaccard", duckJaccardPairs) { (s, d) =>
    jaccardPairs(documents(s, d)).orderBy("a_id", "b_id")
  }

  private def jaccardPairs(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("s"))
      .select(col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("shingle"))
    val a = sh.as("a"); val b = sh.as("b")
    a.join(b, col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("sim", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("sim") >= JaccardThreshold)
      .select("a_id", "b_id", "sim")
  }

  private val NumHashes = 32
  private val NumBands = 16 // × 2 rows/band: P(miss | j=0.5) = (1-0.25)^16 ≈ 1%

  /** MinHash signature columns: mh_i = min over shingles of a per-i
    * 64-bit hash — computed entirely per-row (no shuffle, no UDF). */
  def withMinhash(docs: DataFrame): DataFrame = {
    val sh = shingles(col("text"))
    docs.select(
      col("doc_id") +: col("text") +:
        (0 until NumHashes).map(i =>
          array_min(transform(sh, s => xxhash64(lit(i), s))).as(s"mh_$i")): _*)
  }

  /** MinHash-LSH near-dup: signature → band buckets → hash-join candidate
    * pairs → exact-Jaccard verification. The verified output equals the
    * exact pair set whenever banding recall holds (b=16, r=2 → miss
    * probability ≤(1-j²)^16, ≈1% at j=0.5, ~1e-7 at j=0.8), which the
    * DedupSpec asserts against the exact query; hence the same oracle. */
  val minhashLsh: Q = Q("dedup_minhash_lsh", duckJaccardPairs) { (s, d) =>
    val signed = withMinhash(documents(s, d))
    val bands = signed.select(
      col("doc_id"),
      posexplode(array((0 until NumBands).map(j =>
        xxhash64(lit(j), col(s"mh_${2 * j}"), col(s"mh_${2 * j + 1}"))): _*))
        .as(Seq("band", "sig")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val sh = documents(s, d).select(col("doc_id"), shingles(col("text")).as("s"))
    cand
      .join(sh.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sh.as("sb"), col("b_id") === col("sb.doc_id"))
      .withColumn("inter", size(array_intersect(col("sa.s"), col("sb.s"))))
      .withColumn("sim", col("inter").cast("double") /
        (size(col("sa.s")) + size(col("sb.s")) - col("inter")))
      .filter(col("sim") >= JaccardThreshold)
      .select("a_id", "b_id", "sim")
      .orderBy("a_id", "b_id")
  }

  /** 64-bit SimHash from shingle hashes: per-bit weighted vote, packed
    * back into one long. Hash-seeded → no SQL oracle; DedupSpec asserts
    * recall of the planted near-dup pairs. */
  def simhash(text: Column): Column = {
    val hashes = transform(shingles(text), s => xxhash64(s))
    val bitSums = (0 until 64).map(i =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1))
    (0 until 64).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(when(bitSums(i) > 0, lit(1L << i)).otherwise(lit(0L)))
    }
  }

  /** SimHash near-dup: bucket by 8-bit chunks (pigeonhole: hamming ≤ 7
    * guarantees a shared chunk; up to the ≤14 verify threshold found
    * w.h.p.), verify by true hamming distance. Chunk width is the
    * recall/candidate-volume dial: on this corpus the nearest random
    * pair sits at hamming ≈27, so ≤14 separates cleanly; at much larger
    * corpora widen the chunks (and multi-probe) to keep buckets sparse. */
  val simhashPairs: Q = Q.noOracle("dedup_simhash") { (s, d) =>
    val docs = documents(s, d).select(col("doc_id"), simhash(col("text")).as("sh"))
    val chunks = docs.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 8).map(k =>
        shiftrightunsigned(col("sh"), 8 * k).bitwiseAND(lit(0xFFL))): _*))
        .as(Seq("chunk_idx", "chunk")))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("bigint").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 14)
      .orderBy("a_id", "b_id")
  }

  private val EmbDim = 64
  val CosineThreshold = 0.4

  /** Embedding-cosine near-dup pairs (brute force — correctness
    * baseline; the bucketed scale path lives in [[Similarity]]). */
  val embeddingCosine: Q = Q(
    "dedup_embedding_cosine",
    s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |  ${VectorFunctions.duckCosine("a.embedding", "b.embedding", EmbDim)} AS sim
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE ${VectorFunctions.duckCosine("a.embedding", "b.embedding", EmbDim)} >= $CosineThreshold
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    val e = embeddings(s, d)
    val a = e.as("a"); val b = e.as("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim",
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("sim") >= CosineThreshold)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"), col("sim"))
      .orderBy("a_id", "b_id")
  }

  val all: Seq[Q] = Seq(exact, ngramJaccard, minhashLsh, simhashPairs,
    embeddingCosine)
}
