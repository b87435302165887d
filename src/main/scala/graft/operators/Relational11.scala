package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.Tables._

/** Eleventh relational batch: the ClickHouse `corrMatrix` analogue —
  * the full Pearson correlation matrix over a set of row metrics from
  * ONE corpus pass. */
object Relational11 {

  private val dec = DecimalType(38, 0)

  /** Correlation matrix over the four lineitem metrics (quantity,
    * extendedprice, discount, tax), upper triangle as (m1, m2, corr)
    * rows.
    *
    * The whole matrix comes from a SINGLE map-side-combined hash
    * aggregation of exact fixed-point power sums: each metric is
    * quantized ×100 to a BIGINT (all four ship with ≤ 2 decimal
    * places), and the 15 sufficient statistics (n, four Σx, four Σx²,
    * six Σxy) accumulate in DECIMAL(38,0) ≡ HUGEINT — order-free, so
    * Spark's parallel partial aggregation and DuckDB's serial scan
    * produce bit-identical integers. Every pairwise correlation is
    * then one mirrored double tree over those integers:
    * (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)).
    *
    * 100 TB shape: map-only until the single-row reduce (15 columns of
    * partial sums per partition), then a driver-trivial 6-row
    * expansion — no shuffle of row data at any width, and adding a
    * metric costs one more sum column, not another pass. Integer
    * headroom: |n·Σxy| ≤ 10³⁸ holds to ~10¹² rows at these value
    * scales (cents ≤ 10⁷); past that, re-scale the quantization, not
    * the plan. */
  val q131CorrMatrix: Q = Q(
    "q131_corr_matrix",
    """WITH f AS (
      |  SELECT CAST(FLOOR(l_quantity*100.0::DOUBLE+0.5::DOUBLE) AS BIGINT) AS q,
      |         CAST(FLOOR(l_extendedprice*100.0::DOUBLE+0.5::DOUBLE) AS BIGINT) AS p,
      |         CAST(FLOOR(l_discount*100.0::DOUBLE+0.5::DOUBLE) AS BIGINT) AS d,
      |         CAST(FLOOR(l_tax*100.0::DOUBLE+0.5::DOUBLE) AS BIGINT) AS t
      |  FROM lineitem),
      |m AS MATERIALIZED (
      |  SELECT COUNT(*)::HUGEINT AS n,
      |    SUM(CAST(q AS HUGEINT)) AS sq, SUM(CAST(p AS HUGEINT)) AS sp,
      |    SUM(CAST(d AS HUGEINT)) AS sd, SUM(CAST(t AS HUGEINT)) AS st,
      |    SUM(CAST(q AS HUGEINT)*q) AS sqq, SUM(CAST(p AS HUGEINT)*p) AS spp,
      |    SUM(CAST(d AS HUGEINT)*d) AS sdd, SUM(CAST(t AS HUGEINT)*t) AS stt,
      |    SUM(CAST(q AS HUGEINT)*p) AS sqp, SUM(CAST(q AS HUGEINT)*d) AS sqd,
      |    SUM(CAST(q AS HUGEINT)*t) AS sqt, SUM(CAST(p AS HUGEINT)*d) AS spd,
      |    SUM(CAST(p AS HUGEINT)*t) AS spt, SUM(CAST(d AS HUGEINT)*t) AS sdt
      |  FROM f)
      |SELECT m1, m2,
      |  CAST(n*sxy - sx*sy AS DOUBLE)
      |    / (SQRT(CAST(n*sxx - sx*sx AS DOUBLE))
      |       * SQRT(CAST(n*syy - sy*sy AS DOUBLE))) AS corr
      |FROM (
      |  SELECT 'discount' AS m1, 'extendedprice' AS m2,
      |    n, sd AS sx, sp AS sy, sdd AS sxx, spp AS syy, spd AS sxy FROM m
      |  UNION ALL SELECT 'discount','quantity', n, sd, sq, sdd, sqq, sqd FROM m
      |  UNION ALL SELECT 'discount','tax', n, sd, st, sdd, stt, sdt FROM m
      |  UNION ALL SELECT 'extendedprice','quantity', n, sp, sq, spp, sqq, sqp FROM m
      |  UNION ALL SELECT 'extendedprice','tax', n, sp, st, spp, stt, spt FROM m
      |  UNION ALL SELECT 'quantity','tax', n, sq, st, sqq, stt, sqt FROM m)
      |ORDER BY m1, m2""".stripMargin) { (s, d) =>
    val f = lineitem(s, d).select(
      floor(col("l_quantity") * 100.0 + 0.5).cast("long").as("q"),
      floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("p"),
      floor(col("l_discount") * 100.0 + 0.5).cast("long").as("d"),
      floor(col("l_tax") * 100.0 + 0.5).cast("long").as("t"))
    def s1(a: String) = sum(col(a).cast(dec)).as(s"s_$a")
    def s2(a: String, b: String) =
      sum(col(a).cast(dec) * col(b)).as(s"s_$a$b")
    val m = f.agg(
      count(lit(1)).cast(dec).as("n"),
      s1("q"), s1("p"), s1("d"), s1("t"),
      s2("q", "q"), s2("p", "p"), s2("d", "d"), s2("t", "t"),
      s2("q", "p"), s2("q", "d"), s2("q", "t"),
      s2("p", "d"), s2("p", "t"), s2("d", "t"))
    // metric-name pairs (alphabetical), each mapped to its sufficient
    // statistics; Σxy references the q<p<d<t computation order
    val pairs = Seq(
      ("discount", "extendedprice", "s_d", "s_p", "s_dd", "s_pp", "s_pd"),
      ("discount", "quantity", "s_d", "s_q", "s_dd", "s_qq", "s_qd"),
      ("discount", "tax", "s_d", "s_t", "s_dd", "s_tt", "s_dt"),
      ("extendedprice", "quantity", "s_p", "s_q", "s_pp", "s_qq", "s_qp"),
      ("extendedprice", "tax", "s_p", "s_t", "s_pp", "s_tt", "s_pt"),
      ("quantity", "tax", "s_q", "s_t", "s_qq", "s_tt", "s_qt"))
    m.select(explode(array(pairs.map {
        case (m1, m2, sx, sy, sxx, syy, sxy) =>
          struct(lit(m1).as("m1"), lit(m2).as("m2"),
            ((col("n") * col(sxy) - col(sx) * col(sy)).cast("double") /
              (sqrt((col("n") * col(sxx) - col(sx) * col(sx)).cast("double")) *
                sqrt((col("n") * col(syy) - col(sy) * col(sy)).cast("double"))))
              .as("corr"))
      }: _*)).as("r"))
      .select(col("r.m1").as("m1"), col("r.m2").as("m2"),
        col("r.corr").as("corr"))
      .orderBy("m1", "m2")
  }

  /** Cramér's V between order priority and customer market segment —
    * the ClickHouse `cramersV` categorical-association shape: the
    * χ² statistic over the contingency table, normalized to [0, 1] by
    * n·(min(r, c) − 1).
    *
    * Exactness: cell counts, row/column totals, and n are exact
    * integers, so each χ² term is computed as the SCALED floor
    * quotient ⌊10⁹·(n·n_ij − r_i·c_j)² / (n·r_i·c_j)⌋ — a DECIMAL(38,0)
    * ≡ HUGEINT numerator (≤ ~10³⁴ at sf2) floor-divided exactly in
    * both engines (numerators are squares, hence non-negative:
    * truncation ≡ floor), then summed as BIGINTs. Only the FINAL
    * normalization touches doubles: v = √(χ²ₛ / (10⁹·n·(k−1))) — one
    * division and one square root of identical exact inputs.
    *
    * 100 TB shape: one orders⋈customer broadcast-or-shuffle join into
    * a 25-cell hash agg (the contingency table is
    * |priorities|×|segments|, corpus-independent); everything after
    * the agg is a ≤25-row computation. */
  val q133CramersV: Q = Q(
    "q133_cramers_v",
    """WITH j AS (
      |  SELECT o.o_orderpriority AS a, c.c_mktsegment AS b
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      |cells AS (SELECT a, b, COUNT(*)::HUGEINT AS nij FROM j GROUP BY 1, 2),
      |rt AS (SELECT a, SUM(nij) AS ri FROM cells GROUP BY 1),
      |ct AS (SELECT b, SUM(nij) AS cj FROM cells GROUP BY 1),
      |tot AS (SELECT SUM(nij) AS n,
      |               LEAST((SELECT COUNT(*) FROM rt),
      |                     (SELECT COUNT(*) FROM ct))::BIGINT AS k
      |        FROM cells),
      |terms AS (
      |  SELECT CAST((1000000000::HUGEINT
      |           * (tot.n * cells.nij - rt.ri * ct.cj)
      |           * (tot.n * cells.nij - rt.ri * ct.cj))
      |          // (tot.n * rt.ri * ct.cj) AS BIGINT) AS t
      |  FROM cells JOIN rt ON rt.a = cells.a
      |              JOIN ct ON ct.b = cells.b
      |              CROSS JOIN tot)
      |SELECT tot.n::BIGINT AS n, tot.k AS k,
      |  (SELECT SUM(t) FROM terms)::BIGINT AS chi2_scaled,
      |  SQRT(((SELECT SUM(t) FROM terms)::DOUBLE)
      |       / (1000000000.0::DOUBLE * tot.n::DOUBLE * (tot.k - 1)::DOUBLE))
      |    AS cramers_v
      |FROM tot""".stripMargin) { (s, d) =>
    val j = orders(s, d).join(customer(s, d),
        col("c_custkey") === col("o_custkey"))
      .select(col("o_orderpriority").as("a"), col("c_mktsegment").as("b"))
    val cells = j.groupBy("a", "b")
      .agg(count(lit(1)).cast(dec).as("nij"))
      .localCheckpoint(true) // ≤25 rows; stops re-running the join 3×
    val rt = cells.groupBy("a").agg(sum(col("nij")).as("ri"))
    val ct2 = cells.groupBy("b").agg(sum(col("nij")).as("cj"))
    val tot = cells.agg(sum(col("nij")).as("n"),
      least(countDistinct(col("a")), countDistinct(col("b")))
        .cast("long").as("k"))
    val terms = cells
      .join(broadcast(rt), "a").join(broadcast(ct2), "b")
      .crossJoin(broadcast(tot))
      .withColumn("dev", col("n") * col("nij") - col("ri") * col("cj"))
      .withColumn("t",
        expr("(CAST(1000000000 AS DECIMAL(38,0)) * dev * dev) div (n * ri * cj)"))
    terms.agg(first(col("n")).cast("long").as("n"),
        first(col("k")).as("k"),
        sum(col("t")).as("chi2_scaled"))
      .withColumn("cramers_v",
        sqrt(col("chi2_scaled").cast("double") /
          (lit(1000000000.0) * col("n").cast("double") *
            (col("k") - 1).cast("double"))))
      .select("n", "k", "chi2_scaled", "cramers_v")
  }

  val all: Seq[Q] = Seq(q131CorrMatrix, q133CramersV)
}
