package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.Tables._

/** Sixth similarity batch — deterministic spectral analysis: the top
  * principal component of the JL-sketched embedding corpus by power
  * iteration, with EVERY reduction exact-integer so the result is
  * bit-reproducible on any engine and any partitioning:
  *
  *   - the 16-dim Achlioptas sketch (same sign-matrix planes 52–67 as
  *     `sim_random_projection`) quantizes to ×2²⁰ BIGINTs;
  *   - the covariance numerator C[i,j] = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ is exact
  *     DECIMAL(38,0) — one corpus pass for all 136 upper-triangle
  *     moments via a per-row pair expansion (no self-join);
  *   - five power-iteration rounds run on the 256-cell integer matrix
  *     with L∞ normalization by FLOOR(|mv|·2¹⁶ / max|mv|) applied to
  *     the ABSOLUTE value (floor = truncation for non-negatives, so
  *     Spark's truncating `div` and DuckDB's flooring `//` agree);
  *   - only the final L2 normalization and Rayleigh quotient touch
  *     doubles, as single mirrored trees.
  *
  * 100 TB shape: the corpus is scanned ONCE (map-side sketch + 136
  * products per row feeding one hash agg with map-side combine); the
  * iteration then runs entirely on 16/256-row broadcast relations —
  * the classic "reduce to sufficient statistics, then solve small"
  * shape, the same reason the covariance never materializes per-row. */
object Similarity6 {

  private val Dim = 16
  private val JlPlaneBase = 52
  /** sketch quantization: ×2²⁰ */
  private val QScale = 1048576L
  /** iteration-vector quantization: ×2¹⁶ (headroom so the Rayleigh
    * numerator stays far inside DECIMAL(38,0) at any corpus size) */
  private val VScale = 65536L
  private val Iterations = 5

  private val dec = DecimalType(38, 0)

  /** DuckDB: the quantized sketch array (1-based list). */
  private def duckSketch: String =
    (0 until Dim).map { j =>
      s"CAST(FLOOR(${Similarity.duckProj(JlPlaneBase + j)} * 0.25::DOUBLE" +
        s" * $QScale::DOUBLE + 0.5::DOUBLE) AS BIGINT)"
    }.mkString("[", ", ", "]")

  private def duckIterations: String =
    (1 to Iterations).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT c.i, SUM(c.cnum * p.vq)::HUGEINT AS mv
         |  FROM cm c JOIN it${k - 1} p ON p.j = c.j GROUP BY 1),
         |m$k AS (SELECT NULLIF(MAX(ABS(mv)), 0) AS m FROM r$k),
         |it$k AS (
         |  SELECT i AS j,
         |    CASE WHEN mv >= 0 THEN ((ABS(mv) * $VScale) // m)::BIGINT
         |         ELSE -(((ABS(mv) * $VScale) // m)::BIGINT) END AS vq
         |  FROM r$k, m$k)""".stripMargin
    }.mkString(",\n")

  /** Top principal component + Rayleigh eigenvalue of the sketched
    * corpus. Output: one row per sketch dimension with the sign-fixed
    * (first nonzero component positive), L2-normalized eigenvector
    * component, and the shared eigenvalue/corpus-size columns. */
  val pcaPower: Q = Q(
    "sim_pca_power",
    s"""WITH sk AS MATERIALIZED (SELECT vec_id, $duckSketch AS q FROM embeddings),
       |px AS MATERIALIZED (
       |  SELECT ii.i AS i, jj.j AS j,
       |    SUM(CAST(q[ii.i + 1] AS HUGEINT)
       |        * CAST(q[jj.j + 1] AS HUGEINT))::HUGEINT AS spp
       |  FROM sk, UNNEST(RANGE(0, $Dim)) ii(i), UNNEST(RANGE(0, $Dim)) jj(j)
       |  WHERE jj.j >= ii.i GROUP BY 1, 2),
       |sv AS MATERIALIZED (
       |  SELECT ii.i AS i, SUM(CAST(q[ii.i + 1] AS HUGEINT))::HUGEINT AS s
       |  FROM sk, UNNEST(RANGE(0, $Dim)) ii(i) GROUP BY 1),
       |nn AS (SELECT COUNT(*)::HUGEINT AS n FROM sk),
       |cu AS MATERIALIZED (
       |  SELECT p.i, p.j, (nn.n * p.spp - sa.s * sb.s)::HUGEINT AS cnum
       |  FROM px p CROSS JOIN nn
       |  JOIN sv sa ON sa.i = p.i JOIN sv sb ON sb.i = p.j),
       |cm AS MATERIALIZED (
       |  SELECT i, j, cnum FROM cu
       |  UNION ALL
       |  SELECT j, i, cnum FROM cu WHERE i < j),
       |it0 AS (SELECT UNNEST(RANGE(0, $Dim))::BIGINT AS j,
       |        CAST($VScale AS HUGEINT) AS vq),
       |$duckIterations,
       |sgn AS (
       |  SELECT CASE WHEN vq > 0 THEN 1 ELSE -1 END AS s
       |  FROM it$Iterations WHERE vq <> 0 ORDER BY j LIMIT 1),
       |den AS (SELECT SUM(vq * vq)::HUGEINT AS d FROM it$Iterations),
       |den4 AS (SELECT SUM(vq * vq)::HUGEINT AS d4
       |         FROM it${Iterations - 1}),
       |ray AS (
       |  SELECT SUM(p.vq * r.mv)::HUGEINT AS num
       |  FROM it${Iterations - 1} p
       |  JOIN r$Iterations r ON r.i = p.j)
       |SELECT it$Iterations.j::BIGINT AS dim,
       |  CAST(sgn.s * it$Iterations.vq AS DOUBLE)
       |    / SQRT(CAST(den.d AS DOUBLE)) AS component,
       |  CAST(ray.num AS DOUBLE)
       |    / (CAST(den4.d4 AS DOUBLE)
       |       * CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
       |       * $QScale::DOUBLE * $QScale::DOUBLE) AS eigenvalue,
       |  nn.n::BIGINT AS n
       |FROM it$Iterations, sgn, den, den4, ray, nn
       |ORDER BY dim""".stripMargin) { (s, d) =>
    val sk = embeddings(s, d)
      .select(col("vec_id"),
        transform(
          graft.functions.SignMatrix
            .projectCol(col("embedding"), JlPlaneBase, Dim, scale = 0.25),
          y => floor(y * QScale.toDouble + 0.5).cast("long")).as("q"))
      .localCheckpoint()
    // per-row upper-triangle pair expansion — 136 products per row, no
    // self-join, one hash agg with map-side combine
    val px = sk.select(explode(expr(
        s"""flatten(transform(sequence(0, ${Dim - 1}), i ->
           |  transform(sequence(i, ${Dim - 1}), j ->
           |    struct(i as i, j as j, q[i] * q[j] as p))))""".stripMargin))
        .as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
      .groupBy("i", "j").agg(sum(col("p").cast(dec)).as("spp"))
    val sv = sk.select(posexplode(col("q")).as(Seq("i", "qv")))
      .groupBy("i").agg(sum(col("qv").cast(dec)).as("s"))
    val nn = broadcast(sk.agg(count(lit(1)).cast(dec).as("n")))
    val cu = px.crossJoin(nn)
      .join(broadcast(sv.select(col("i"), col("s").as("sa"))), "i")
      .join(broadcast(sv.select(col("i").as("j"), col("s").as("sb"))), "j")
      .select(col("i"), col("j"),
        (col("n") * col("spp") - col("sa") * col("sb")).cast(dec)
          .as("cnum"))
    val cm = cu.select("i", "j", "cnum")
      .unionByName(cu.filter(col("i") < col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cnum")))
      .localCheckpoint()
    import s.implicits._
    var it = (0 until Dim).map(j => (j.toLong, VScale)).toDF("j", "vq")
      .select(col("j"), col("vq").cast(dec).as("vq"))
    var lastR: org.apache.spark.sql.DataFrame = null
    var lastIt = it
    for (_ <- 1 to Iterations) {
      lastIt = it
      val r = cm.join(it, Seq("j"))
        .groupBy("i").agg(sum(col("cnum") * col("vq")).cast(dec).as("mv"))
        .localCheckpoint()
      lastR = r
      val m = broadcast(r.agg(nullif(max(abs(col("mv"))), lit(0).cast(dec))
        .as("m")))
      it = r.crossJoin(m)
        .select(col("i").as("j"),
          when(col("mv") >= 0, expr(s"(abs(mv) * ${VScale}L) div m"))
            .otherwise(-expr(s"(abs(mv) * ${VScale}L) div m"))
            .cast(dec).as("vq"))
    }
    val sgn = broadcast(it.filter(col("vq") =!= 0).orderBy("j").limit(1)
      .select(when(col("vq") > 0, 1).otherwise(-1).as("s")))
    val den = broadcast(it.agg(sum(col("vq") * col("vq")).cast(dec).as("d")))
    val den4 = broadcast(lastIt
      .agg(sum(col("vq") * col("vq")).cast(dec).as("d4")))
    val ray = broadcast(lastIt.select(col("j"), col("vq").as("pvq"))
      .join(lastR.select(col("i").as("j"), col("mv")), "j")
      .agg(sum(col("pvq") * col("mv")).cast(dec).as("num")))
    it.crossJoin(sgn).crossJoin(den).crossJoin(den4).crossJoin(ray)
      .crossJoin(nn)
      .select(col("j").cast("long").as("dim"),
        ((col("s") * col("vq")).cast("double") /
          sqrt(col("d").cast("double"))).as("component"),
        (col("num").cast("double") /
          (col("d4").cast("double") *
            col("n").cast("double") * col("n").cast("double") *
            QScale.toDouble * QScale.toDouble)).as("eigenvalue"),
        col("n").cast("long").as("n"))
      .orderBy("dim")
  }

  val all: Seq[Q] = Seq(pcaPower)
}
