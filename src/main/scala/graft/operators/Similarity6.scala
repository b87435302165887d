package graft.operators

import org.apache.spark.sql.Column
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
    import graft.functions.Arith.idiv
    // r17: ONE corpus pass for ALL sufficient statistics. The former
    // shape checkpointed the CORPUS-sized sketch relation and re-scanned
    // it three times (pair products, per-dim sums, count), then ran the
    // five power rounds as per-round join+agg jobs over the 256-cell
    // checkpointed matrix (~7 Spark jobs of pure scheduling floor). Now
    // the per-row explode emits 136 pair products + 16 component values
    // + 1 count marker (153 structs/row) into a single map-side-combined
    // hash agg — no corpus materialization at any scale — and the whole
    // iteration runs as array arithmetic over the ONE assembled row
    // (guide §1.2 step 1: the iteration is O(Dim²) work, it never needed
    // a distributed plan, only the moment aggregation does; §2.4/§5).
    // Every arithmetic op is the same Catalyst node as before (same
    // decimal(38,0) sums/products, same `div` truncation), so the
    // integers — and the final doubles — are bit-identical.
    val sk = embeddings(s, d)
      .select(col("vec_id"),
        transform(
          graft.functions.SignMatrix
            .projectCol(col("embedding"), JlPlaneBase, Dim, scale = 0.25),
          y => floor(y * QScale.toDouble + 0.5).cast("long")).as("q"))
    val mo = sk.select(explode(expr(
        s"""concat(
           |  flatten(transform(sequence(0, ${Dim - 1}), i ->
           |    transform(sequence(i, ${Dim - 1}), j ->
           |      struct(i as i, j as j, q[i] * q[j] as p)))),
           |  transform(sequence(0, ${Dim - 1}), i ->
           |    struct(i as i, -1 as j, q[i] as p)),
           |  array(struct(-1 as i, -1 as j, 1L as p)))""".stripMargin))
        .as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
      .groupBy("i", "j").agg(sum(col("p").cast(dec)).as("v"))
    // moment lookup table keyed i·100+j (i, j ≥ −1 ⇒ keys unique); the
    // map keeps the matrix-assembly expression tree ~100 nodes — a
    // per-entry array-filter lookup (256 copies) made the optimizer's
    // alias-trimming walk a ~10⁵-node tree per pattern match
    val mp = mo.agg(
      map_from_entries(collect_list(
        struct((col("i") * 100 + col("j")).as("k"), col("v"))))
        .as("mp"))
    val seqDim = sequence(lit(0), lit(Dim - 1))
    // n = count marker; s = per-dim sums; m = the mirrored covariance
    // numerator matrix, flattened row-major (i*Dim + j), each entry the
    // SAME (n·spp − sᵢ·sⱼ) decimal op chain as the former cu/cm relation
    val withNs = mp.select(
      try_element_at(col("mp"), lit(-101)).as("n"),
      transform(seqDim, i => try_element_at(col("mp"), i * 100 - 1)).as("s"),
      col("mp"))
    val withM = withNs.select(col("n"),
      flatten(transform(seqDim, i => transform(seqDim, j =>
        (col("n") *
          try_element_at(col("mp"), least(i, j) * 100 + greatest(i, j)) -
          element_at(col("s"), i + 1) * element_at(col("s"), j + 1))
          .cast(dec)))).as("m"))
    // the five rounds run as ONE runtime fold over a (vq, pvq, mv, m)
    // state struct — a FIXED-size expression tree evaluated per round
    // at runtime. Two traps this shape dodges, both measured: chained
    // per-round Projects get transitively inlined by the planner's
    // alias trimming into a 16^(2·rounds)-node tree (multi-minute
    // optimizer stall), and a matrix captured from OUTSIDE the lambda
    // is a non-attribute capture that interpreted HOF evaluation
    // re-computes per array element — so the matrix rides in the fold's
    // INITIAL STATE (evaluated once) and every in-step reference is a
    // cheap getField on the lambda variable.
    val vq0 = transform(seqDim, _ => lit(VScale).cast(dec))
    val iterated = withM.select(col("n"),
      aggregate(sequence(lit(1), lit(Iterations)),
        struct(vq0.as("vq"), vq0.as("pvq"),
          transform(seqDim, _ => lit(null).cast(dec)).as("mv"),
          col("m").as("m")),
        (st, _) => {
          // mv = M·vq (exact decimal fold ≡ the former per-round hash
          // agg), then L∞ renormalize by truncating `div` — op-for-op
          // the former `(abs(mv) * VScale) div m`, m = NULLIF(max|mv|,0)
          val vq = st.getField("vq")
          val mv = transform(seqDim, i =>
            aggregate(seqDim, lit(0L).cast(dec), (acc, j) =>
              acc + element_at(st.getField("m"), i * Dim + j + 1) *
                element_at(vq, j + 1)))
          val mx = nullif(array_max(transform(mv, x => abs(x))),
            lit(0).cast(dec))
          struct(
            transform(mv, x =>
              when(x >= 0, idiv(abs(x) * lit(VScale), mx))
                .otherwise(-idiv(abs(x) * lit(VScale), mx))
                .cast(dec)).as("vq"),
            vq.as("pvq"), mv.as("mv"), st.getField("m").as("m"))
        }).as("st"))
    val cur = iterated.select(col("n"),
      col("st.vq").as("vq"), col("st.pvq").as("pvq"), col("st.mv").as("mv"))
    // sgn: first nonzero component (j order ≡ array order); the
    // isNotNull filter reproduces the former empty-`sgn` degenerate
    // behavior (all-zero vector ⇒ zero output rows)
    val scalars = cur.select(col("n"), col("vq"),
      when(try_element_at(filter(col("vq"), v => v =!= lit(0).cast(dec)), lit(1)) > 0,
        lit(1))
        .when(try_element_at(filter(col("vq"), v => v =!= lit(0).cast(dec)), lit(1)) < 0,
          lit(-1)).as("sgn"),
      aggregate(col("vq"), lit(0L).cast(dec),
        (acc, v) => acc + v * v).cast(dec).as("d"),
      aggregate(col("pvq"), lit(0L).cast(dec),
        (acc, v) => acc + v * v).cast(dec).as("d4"),
      aggregate(seqDim, lit(0L).cast(dec), (acc, j) =>
        acc + element_at(col("pvq"), j + 1) * element_at(col("mv"), j + 1))
        .cast(dec).as("num"))
      .filter(col("sgn").isNotNull)
    scalars
      .select(col("n"), col("sgn"), col("d"), col("d4"), col("num"),
        posexplode(col("vq")).as(Seq("pos", "vqv")))
      .select(col("pos").cast("long").as("dim"),
        ((col("sgn") * col("vqv")).cast("double") /
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
