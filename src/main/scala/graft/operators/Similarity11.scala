package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.functions.VectorFunctions._

/** IVF + PQ combined ANN — the production composition of the two
  * existing tiers (SURVEY.md §2.5; the FAISS IVFPQ recipe): the coarse
  * IVF quantizer restricts scoring to the probed ~nProbe/2^bits corpus
  * fraction, product-quantization ADC scores those candidates with
  * table lookups instead of float dot products, and only the ADC
  * shortlist ever touches full vectors again (exact cosine re-rank).
  * `sim_ann_ivf` scores every probed candidate with exact floats;
  * `sim_ann_pq` ADC-scans the WHOLE corpus — this tier does neither:
  * float math is O(|Q|·shortlist), candidate scoring is integer joins.
  *
  * DETERMINISM (full oracle check, same contract as both parents):
  * IVF cells and PQ codes are sign-LSH over fixed xxhash64 planes,
  * codebook centroids are fixed-point BIGINT means, and every float
  * reduction (LUT distances, ADC totals, the re-rank cosine) is an
  * ordered sequential fold — Spark and DuckDB agree bit-for-bit.
  *
  * The 100 TB shape:
  *   - one map-side pass encodes cell + m codes per vector (codegen'd
  *     single-pass sign walks);
  *   - the codebook/LUT is ≤ m·kc·16 = 1024 rows of broadcast state;
  *   - candidates = probed-cell hash join (the IVF pruning) feeding a
  *     (q_id, j, code) → d2 broadcast-LUT join and one hash agg — no
  *     pairwise float math, no corpus shuffle, no driver collect;
  *   - exact re-rank touches shortlist·|Q| vectors.
  *
  * Reference scope grounding: the stack the reference's consumer feeds
  * (main.py:12-55) stores embeddings for retrieval; this is the
  * at-scale serving tier for them. */
object Similarity11 {

  private val EmbDim = 64
  private val NumQueries = 10
  private val K = Similarity.K
  /** ADC shortlist depth before the exact re-rank. Shallower than
    * sim_ann_pq's 150: IVF has already pruned the candidate pool, so
    * the shortlist only needs to absorb PQ quantization error within
    * the probed fraction (measured on the 500-vector spec corpus:
    * depth 100 recovers 0.82 of what IVF finds with exact scoring;
    * depth 200 recovers all of it). Shared with the oracle SQL. */
  private val Shortlist = 100

  import Similarity.{IvfBits, IvfNProbe, IvfPlaneBase}
  import Similarity2.{PqM, orderedSum, codeCol}

  /** IVFPQ encode + probed-cell ADC + exact re-rank.
    * Output: (q_id, n_id, rank, sim). */
  def ivfpqTopk(emb: DataFrame, numQueries: Int, k: Int,
      nProbe: Int = IvfNProbe, shortlist: Int = Shortlist): DataFrame = {
    val spark = emb.sparkSession
    val sub = Similarity2.sub
    // ONE encode pass: IVF projections (planes 32..35, full vector) +
    // m PQ codes (planes 36..51, per subspace) per row, all codegen'd
    val projArr = graft.functions.SignMatrix
      .projectCol(col("embedding"), IvfPlaneBase, IvfBits)
    val enc = emb.select(
      Seq(col("vec_id"), col("embedding")) ++
        (0 until IvfBits).map(b =>
          element_at(projArr, b + 1).as(s"proj_$b")) ++
        (0 until PqM).map(j => codeCol(j).as(s"code_$j")): _*)
    val cellCol = (0 until IvfBits).foldLeft(lit(0L)) { (acc, b) =>
      acc.bitwiseOR(shiftleft(
        when(col(s"proj_$b") >= 0, lit(1L)).otherwise(lit(0L)), b))
    }
    val e = enc.withColumn("cell", cellCol)
    // PQ codebook + query LUT — the sim_ann_pq construction verbatim
    // (fixed-point means; ordered-fold per-subspace distances)
    val codes = e.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until PqM).map(j => col(s"code_$j")): _*))
        .as(Seq("j", "code")))
    val comp = codes.select(col("vec_id"), col("j"), col("code"),
      posexplode(slice(col("embedding"), col("j") * sub + 1, lit(sub)))
        .as(Seq("pos", "comp")))
    val cent = comp.groupBy("j", "code", "pos")
      .agg(count(lit(1)).as("n_cnt"),
        sum(floor(col("comp").cast("double") * Similarity2.PqFp + 0.5)
          .cast("long")).as("s_fp"))
      .select(col("j"), col("code"), col("pos"),
        (col("s_fp").cast("double") / col("n_cnt") / Similarity2.PqFp)
          .as("cent"))
    val qc = comp.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("j"), col("pos"),
        col("comp").cast("double").as("qv"))
    val lut = cent.join(qc, Seq("j", "pos"))
      .select(col("q_id"), col("j"), col("code"), col("pos"),
        ((col("cent") - col("qv")) * (col("cent") - col("qv"))).as("sq"))
      .groupBy("q_id", "j", "code")
      .agg(orderedSum(col("pos"), col("sq"), "sq").as("d2"))
    // IVF multi-probe set — the sim_ann_ivf construction verbatim
    val queries = e.filter(col("vec_id") < numQueries)
      .select(Seq(col("vec_id").as("q_id"), col("cell").as("q_cell")) ++
        (0 until IvfBits).map(b => col(s"proj_$b").as(s"q_proj_$b")): _*)
    import spark.implicits._
    val cells = (0L until (1L << IvfBits)).toDF("cell")
    val penalty = (0 until IvfBits).map { b =>
      when(shiftrightunsigned(col("q_cell"), b).bitwiseAND(lit(1L)) =!=
        shiftrightunsigned(col("cell"), b).bitwiseAND(lit(1L)),
        abs(col(s"q_proj_$b")))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val wp = Window.partitionBy("q_id").orderBy(col("penalty"), col("cell"))
    val probes = queries.crossJoin(broadcast(cells))
      .withColumn("penalty", penalty)
      .withColumn("prank", row_number().over(wp))
      .filter(col("prank") <= nProbe)
      .select("q_id", "cell")
    // probed-cell candidates scored by ADC only — no float dot here
    val candCodes = e
      .select(col("vec_id").as("n_id"), col("cell"),
        posexplode(array((0 until PqM).map(j => col(s"code_$j")): _*))
          .as(Seq("j", "code")))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
    val wS = Window.partitionBy("q_id").orderBy(col("adc"), col("n_id"))
    val short = candCodes
      .join(broadcast(lut), Seq("q_id", "j", "code"))
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

  /** [[ivfpqTopk]] restated over DuckDB primitives: the sim_ann_pq
    * encode/codebook/LUT CTE chain composed with the sim_ann_ivf
    * cell/probe chain; ADC runs only on probed-cell members; identical
    * ordered folds end-to-end, so the combined approximate pipeline is
    * hash-checked exactly. */
  private lazy val duckIvfPq: String = {
    val iprojCols = (0 until IvfBits)
      .map(b => s"${Similarity.duckProj(IvfPlaneBase + b)} AS iproj_$b")
      .mkString(",\n    ")
    val cellExpr = (0 until IvfBits)
      .map(b => s"(CASE WHEN iproj_$b >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << $b)")
      .mkString(" | ")
    val penaltyExpr = (0 until IvfBits)
      .map(b => s"(CASE WHEN ((q.q_cell >> $b) & 1) <> ((c.cell >> $b) & 1) THEN ABS(q.iproj_$b) ELSE 0.0 END)")
      .mkString(" + ")
    s"""WITH ${Similarity2.duckCompCtes},
       |cent AS (
       |  SELECT j, code, pos,
       |    CAST(CAST(SUM(CAST(FLOOR(comp::DOUBLE * ${Similarity2.PqFp} + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
       |      / COUNT(*) / ${Similarity2.PqFp} AS cent
       |  FROM comp GROUP BY 1, 2, 3),
       |qcq AS (
       |  SELECT vec_id AS q_id, j, pos, comp::DOUBLE AS qv
       |  FROM comp WHERE vec_id < $NumQueries),
       |lut AS (
       |  SELECT q.q_id, c.j, c.code,
       |    LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE,
       |      LIST((c.cent - q.qv) * (c.cent - q.qv) ORDER BY c.pos)),
       |      (acc, x) -> acc + x) AS d2
       |  FROM cent c JOIN qcq q ON q.j = c.j AND q.pos = c.pos
       |  GROUP BY 1, 2, 3),
       |iproj AS (
       |  SELECT vec_id, embedding,
       |    $iprojCols
       |  FROM embeddings),
       |isig AS (SELECT vec_id, embedding, $cellExpr AS cell,
       |         ${(0 until IvfBits).map(b => s"iproj_$b").mkString(", ")}
       |         FROM iproj),
       |iq AS (
       |  SELECT vec_id AS q_id, cell AS q_cell,
       |    ${(0 until IvfBits).map(b => s"iproj_$b").mkString(", ")}
       |  FROM isig WHERE vec_id < $NumQueries),
       |probes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q.q_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |        ORDER BY $penaltyExpr, c.cell) AS prank
       |    FROM iq q CROSS JOIN (SELECT UNNEST(RANGE(0, ${1 << IvfBits})) AS cell) c)
       |  WHERE prank <= $IvfNProbe),
       |adc AS (
       |  SELECT l.q_id, k.vec_id AS n_id,
       |    LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, LIST(l.d2 ORDER BY l.j)),
       |      (acc, x) -> acc + x) AS adc
       |  FROM probes p
       |  JOIN isig s ON s.cell = p.cell AND s.vec_id <> p.q_id
       |  JOIN codes k ON k.vec_id = s.vec_id
       |  JOIN lut l ON l.q_id = p.q_id AND l.j = k.j AND l.code = k.code
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

  /** IVF+PQ ANN as a registered operator — deterministic LSH cells AND
    * LSH-cell codebooks → FULL oracle check; `Similarity11Spec`
    * additionally measures recall vs brute force and vs its parents. */
  val ivfpqAdc: Q = Q("sim_ivfpq_adc", duckIvfPq) { (s, d) =>
    ivfpqTopk(embeddings(s, d), numQueries = NumQueries, k = K)
  }

  val all: Seq[Q] = Seq(ivfpqAdc)
}
