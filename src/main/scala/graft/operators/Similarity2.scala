package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.functions.VectorFunctions._

/** Product quantization (PQ) ANN — the memory-compression tier of the
  * similarity stack (SURVEY.md §2.5): each 64-dim float vector becomes
  * m=4 one-nibble codes (32× smaller than float32), candidate scoring is
  * table lookups instead of float dot products, and only a short-listed
  * fraction of the corpus ever touches the full vectors again.
  *
  * DETERMINISM (the r05 `no_oracle` row retired): subspace codes are
  * 4-bit hyperplane-LSH signatures over fixed xxhash64-derived planes
  * (36..51 of [[Similarity]]'s sign matrix — no k-means, no RNG state),
  * and the per-cell codebook centroids are corpus means computed with
  * fixed-point BIGINT sums (order-independent across partitions and
  * engines). Every remaining float reduction — the 16-term per-subspace
  * query↔centroid distance and the m-term ADC total — is an ordered
  * sequential fold, so Spark and DuckDB agree bit-for-bit and the driver
  * hash-checks the full output.
  *
  * The 100 TB shape:
  *   - encoding is one map-side sign pass per subspace (codegen'd HOFs);
  *   - the codebook is a hash aggregation on (subspace, code, pos) — at
  *     most m·kc·16 = 1024 rows of global state, map-side combined;
  *     fixed-point sums hold to ~5e14 rows per cell before BIGINT range
  *     matters (2^24-scale addends), and cells partition the corpus;
  *   - ADC is a hash join of the exploded (vec_id, subspace, code)
  *     relation against a |Q|·m·kc-row broadcast lookup table, then a
  *     sum per (query, vector) — linear in corpus size, NO pairwise
  *     vector math and no driver-side collect anywhere;
  *   - exact re-rank touches only `shortlist` rows per query. */
object Similarity2 {

  private val EmbDim = 64
  private val NumQueries = 10
  private val K = Similarity.K

  /** First sign-matrix plane of the PQ code planes (4 per subspace). */
  private[operators] val PqPlaneBase = 36
  private[operators] val PqM = 4
  private[operators] val PqBits = 4
  /** Fixed-point scale for order-independent centroid sums. */
  private[operators] val PqFp = 1048576.0 // 2^20
  /** ADC shortlist depth — shared by [[pqTopk]]'s default AND the oracle
    * SQL, so they cannot silently diverge (r06 advice). */
  private val Shortlist = 150

  private[operators] def sub = EmbDim / PqM // 16 dims per subspace

  /** 4-bit LSH code of subspace j: sign bits of planes
    * PqPlaneBase+4j..+3 over the 16-dim subvector (locally indexed) —
    * one codegen'd single-pass walk ([[graft.functions.SignMatrix]]),
    * bit-parity with the interpreted foldLeft shape it replaces
    * (proven in SignMatrixSpec). */
  private[operators] def codeCol(j: Int): Column =
    graft.functions.SignMatrix.bitsCol(
      slice(col("embedding"), j * sub + 1, sub), PqPlaneBase + j * PqBits,
      PqBits)

  /** Ordered sequential fold Σ field over array_sort(collect_list(
    * struct(ord, field))) — the order-pinned double sum both engines
    * reproduce exactly (plain SUM over doubles is order-unspecified). */
  private[operators] def orderedSum(ord: Column, value: Column, field: String): Column =
    aggregate(array_sort(collect_list(struct(ord, value.as(field)))),
      lit(0.0), (acc, x) => acc + x.getField(field))

  /** PQ encode + ADC shortlist + exact re-rank.
    * Output: (q_id, n_id, rank, sim). */
  def pqTopk(emb: DataFrame, numQueries: Int, k: Int,
      shortlist: Int = Shortlist): DataFrame = {
    // (vec_id, j, code): m rows/vector, codes map-side
    val enc = emb.select(
      Seq(col("vec_id"), col("embedding")) ++
        (0 until PqM).map(j => codeCol(j).as(s"code_$j")): _*)
    val codes = enc.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until PqM).map(j => col(s"code_$j")): _*))
        .as(Seq("j", "code")))
    // (vec_id, j, code, pos, comp): per-subspace components, pos local
    val comp = codes.select(col("vec_id"), col("j"), col("code"),
      posexplode(slice(col("embedding"), col("j") * sub + 1, lit(sub)))
        .as(Seq("pos", "comp")))
    // codebook: cell means via fixed-point BIGINT sums (exact integers →
    // order-independent), one double division at the end
    val cent = comp.groupBy("j", "code", "pos")
      .agg(count(lit(1)).as("n_cnt"),
        sum(floor(col("comp").cast("double") * PqFp + 0.5).cast("long"))
          .as("s_fp"))
      .select(col("j"), col("code"), col("pos"),
        (col("s_fp").cast("double") / col("n_cnt") / PqFp).as("cent"))
    // query subvector components (|Q|·m·16 rows)
    val qc = comp.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("j"), col("pos"),
        col("comp").cast("double").as("qv"))
    // ADC lookup table: (q_id, j, code) → partial squared L2 to the cell
    // centroid, summed over pos as an ordered fold — |Q|·m·kc rows
    val lut = cent.join(qc, Seq("j", "pos"))
      .select(col("q_id"), col("j"), col("code"),
        col("pos"),
        ((col("cent") - col("qv")) * (col("cent") - col("qv"))).as("sq"))
      .groupBy("q_id", "j", "code")
      .agg(orderedSum(col("pos"), col("sq"), "sq").as("d2"))
    // ADC: hash join on (j, code), ordered-fold the m partials
    val wS = Window.partitionBy("q_id").orderBy(col("adc"), col("n_id"))
    val short = codes.select(col("vec_id").as("n_id"), col("j"), col("code"))
      .join(broadcast(lut), Seq("j", "code"))
      .filter(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id")
      .agg(orderedSum(col("j"), col("d2"), "d2").as("adc"))
      .withColumn("srank", row_number().over(wS))
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

  /** [[pqTopk]] restated over DuckDB primitives: 16 inlined-sign
    * projections → per-subspace codes → fixed-point cell means →
    * ordered-fold LUT/ADC → shortlist → exact cosine re-rank. Every
    * float reduction is the identical sequential fold, so the whole
    * approximate pipeline is hash-checked exactly. */
  /** The PQ encode CTE chain (proj → enc → codes → comp) shared by
    * [[duckAnnPq]] and Similarity9's distortion audit — factoring it
    * keeps the two oracles encoding with the SAME planes/codes by
    * construction. */
  private[operators] lazy val duckCompCtes: String = {
    def planes(j: Int) = (0 until PqBits).map(b => PqPlaneBase + j * PqBits + b)
    val projCols = (0 until PqM).flatMap { j =>
      val sl = s"list_slice(embedding, ${j * sub + 1}, ${(j + 1) * sub})"
      planes(j).zipWithIndex.map { case (p, b) =>
        s"${Similarity.duckProjOver(p, sl, sub)} AS proj_${j}_$b"
      }
    }.mkString(",\n    ")
    val codeCols = (0 until PqM).map { j =>
      (0 until PqBits)
        .map(b => s"(CASE WHEN proj_${j}_$b >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << $b)")
        .mkString(" | ") + s" AS code_$j"
    }.mkString(",\n    ")
    val codeCase = (0 until PqM)
      .map(j => s"WHEN $j THEN code_$j").mkString(" ")
    s"""proj AS (
       |  SELECT vec_id, embedding,
       |    $projCols
       |  FROM embeddings),
       |enc AS (
       |  SELECT vec_id, embedding,
       |    $codeCols
       |  FROM proj),
       |codes AS (
       |  SELECT vec_id, embedding, js.j,
       |    CASE js.j $codeCase END AS code
       |  FROM enc CROSS JOIN (SELECT UNNEST(RANGE(0, $PqM)) AS j) js),
       |comp AS (
       |  SELECT vec_id, j, code,
       |    UNNEST(RANGE(0, $sub)) AS pos,
       |    UNNEST(list_slice(embedding, j * $sub + 1, (j + 1) * $sub)) AS comp
       |  FROM codes)""".stripMargin
  }

  private lazy val duckAnnPq: String = {
    s"""WITH $duckCompCtes,
       |cent AS (
       |  SELECT j, code, pos,
       |    CAST(CAST(SUM(CAST(FLOOR(comp::DOUBLE * $PqFp + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
       |      / COUNT(*) / $PqFp AS cent
       |  FROM comp GROUP BY 1, 2, 3),
       |qc AS (
       |  SELECT vec_id AS q_id, j, pos, comp::DOUBLE AS qv
       |  FROM comp WHERE vec_id < $NumQueries),
       |lut AS (
       |  SELECT q.q_id, c.j, c.code,
       |    LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE,
       |      LIST((c.cent - q.qv) * (c.cent - q.qv) ORDER BY c.pos)),
       |      (acc, x) -> acc + x) AS d2
       |  FROM cent c JOIN qc q ON q.j = c.j AND q.pos = c.pos
       |  GROUP BY 1, 2, 3),
       |adc AS (
       |  SELECT l.q_id, k.vec_id AS n_id,
       |    LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, LIST(l.d2 ORDER BY l.j)),
       |      (acc, x) -> acc + x) AS adc
       |  FROM codes k JOIN lut l ON l.j = k.j AND l.code = k.code
       |  WHERE k.vec_id <> l.q_id
       |  GROUP BY 1, 2),
       |short AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS srank
       |    FROM adc)
       |  WHERE srank <= $Shortlist)
       |SELECT q_id, n_id, rank, sim FROM (
       |  SELECT s.q_id, s.n_id,
       |    ${duckCosine("q.embedding", "c.embedding", EmbDim)} AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY s.q_id
       |      ORDER BY ${duckCosine("q.embedding", "c.embedding", EmbDim)} DESC, s.n_id) AS rank
       |  FROM short s
       |  JOIN embeddings q ON q.vec_id = s.q_id
       |  JOIN embeddings c ON c.vec_id = s.n_id)
       |WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin
  }

  /** PQ ANN as a registered operator — deterministic LSH-cell codebooks
    * → FULL oracle check; `Similarity2Spec` additionally measures recall
    * vs brute force. */
  val annPq: Q = Q("sim_ann_pq", duckAnnPq) { (s, d) =>
    pqTopk(embeddings(s, d), numQueries = NumQueries, k = K)
  }

  val all: Seq[Q] = Seq(annPq)
}
