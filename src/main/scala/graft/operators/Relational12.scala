package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Twelfth relational batch: three more ClickHouse-surface analogues —
  * categorical information value (WOE/IV), the tolerance-bounded ASOF
  * join, and SAMPLE-key estimation with its audit. */
object Relational12 {

  /** Weight-of-evidence / information value of the customer market
    * segment against a binary outcome (urgent-or-high order priority) —
    * the ClickHouse `categoricalInformationValue` shape, the standard
    * feature-screening statistic. All counts are exact BIGINTs; each
    * segment's WOE is PortableLn of ONE double division of exact
    * integer products (gᵢ·B)/(bᵢ·G), and its IV term multiplies that
    * by (gᵢ·B − bᵢ·G)/(G·B) — no cross-row double accumulation
    * anywhere (rows carry per-segment terms; the consumer sums five
    * numbers).
    *
    * 100 TB shape: one orders⋈customer join into a ≤|segments|-cell
    * agg; everything after is 5-row arithmetic. */
  val q140InformationValue: Q = Q(
    "q140_information_value",
    s"""WITH j AS (
       |  SELECT c.c_mktsegment AS seg,
       |    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      THEN 1 ELSE 0 END AS good
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
       |cells AS (
       |  SELECT seg,
       |    SUM(good)::BIGINT AS g,
       |    SUM(1 - good)::BIGINT AS b
       |  FROM j GROUP BY 1),
       |tot AS (SELECT SUM(g) AS gt, SUM(b) AS bt FROM cells),
       |withx AS (
       |  SELECT seg, g, b,
       |    CAST(g * bt AS DOUBLE) / CAST(b * gt AS DOUBLE) AS x,
       |    CAST(g * bt - b * gt AS DOUBLE) / CAST(gt * bt AS DOUBLE)
       |      AS share_diff
       |  FROM cells CROSS JOIN tot),
       |lnx AS (${graft.functions.PortableLn.sqlStages(
           "withx", Seq("seg", "g", "b", "share_diff"), "x", "woe")})
       |SELECT seg, g AS n_good, b AS n_bad, woe,
       |  share_diff * woe AS iv_term
       |FROM lnx
       |ORDER BY seg""".stripMargin) { (s, d) =>
    val j = orders(s, d).join(customer(s, d),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment").as("seg"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("good"))
    val cells = j.groupBy("seg")
      .agg(sum("good").as("g"), sum(lit(1L) - col("good")).as("b"))
    val tot = cells.agg(sum("g").as("gt"), sum("b").as("bt"))
    val withx = cells.crossJoin(broadcast(tot))
      .withColumn("x", (col("g") * col("bt")).cast("double") /
        (col("b") * col("gt")).cast("double"))
      .withColumn("share_diff",
        (col("g") * col("bt") - col("b") * col("gt")).cast("double") /
          (col("gt") * col("bt")).cast("double"))
    graft.functions.PortableLn.withLn(withx, "x", "woe")
      .select(col("seg"), col("g").as("n_good"), col("b").as("n_bad"),
        col("woe"), (col("share_diff") * col("woe")).as("iv_term"))
      .orderBy("seg")
  }

  private val TolMinutes = 2880L // 48h

  /** Tolerance-bounded ASOF join: for every purchase, the most recent
    * same-user signup at-or-before it, but only if it happened within
    * 48 h — otherwise the match is NULL (the kdb/ClickHouse
    * `ASOF ... tolerance` semantics that keeps stale quotes from
    * pairing with today's trades). Same single-pass union+window shape
    * as `q22_asof_join` (one user_id shuffle, no correlated re-scan);
    * the tolerance is a post-window predicate on exact µs integers. */
  val q141AsofTolerance: Q = Q(
    "q141_asof_tolerance",
    s"""SELECT event_id, user_id, ts,
       |  CASE WHEN asof_ts IS NOT NULL
       |         AND EPOCH_US(ts - asof_ts) <= ${TolMinutes * 60000000L}
       |    THEN asof_ts END AS asof_signup_ts,
       |  CASE WHEN asof_ts IS NOT NULL
       |         AND EPOCH_US(ts - asof_ts) <= ${TolMinutes * 60000000L}
       |    THEN EPOCH_US(ts - asof_ts) // 60000000 END AS lag_min
       |FROM (
       |  SELECT p.event_id, p.user_id, p.ts,
       |    (SELECT MAX(sg.ts) FROM events sg
       |     WHERE sg.user_id = p.user_id AND sg.event_type = 'signup'
       |       AND sg.ts <= p.ts) AS asof_ts
       |  FROM events p
       |  WHERE p.event_type = 'purchase')
       |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = events(s, d).filter(col("event_type").isin("signup", "purchase"))
      .withColumn("is_signup", (col("event_type") === "signup").cast("int"))
      .withColumn("signup_ts",
        when(col("event_type") === "signup", col("ts")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_signup").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagUs = unix_micros(col("ts")) - unix_micros(col("asof_ts"))
    val inTol = col("asof_ts").isNotNull &&
      lagUs <= TolMinutes * 60000000L
    ev.withColumn("asof_ts",
        last("signup_ts", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        when(inTol, col("asof_ts")).as("asof_signup_ts"),
        when(inTol, expr(s"(unix_micros(ts) - unix_micros(asof_ts)) div 60000000"))
          .as("lag_min"))
      .orderBy("event_id")
  }

  /** SAMPLE-key estimation audit (the ClickHouse `SAMPLE 1/8` model):
    * a deterministic 1-in-8 sample BY USER KEY (md5-60-bit hash of the
    * user id below 2⁵⁷ — the same portable hash as the simhash/HLL
    * tiers), with per-event-type event and distinct-user counts scaled
    * ×8 next to the exact values and their signed relative errors.
    * Sampling by KEY (not by row) is what lets a sampled query still
    * compute per-user aggregates correctly — and is the 100 TB
    * mechanism for interactive exploration: the sampled scan reads
    * ~1/8 of the corpus, and this audit quantifies what that costs in
    * accuracy. All sample membership is exact integer comparison;
    * estimates are exact ×8 integers; the only doubles are the two
    * final error ratios. */
  val q142SampleKeyAudit: Q = Q(
    "q142_sample_key_audit",
    """WITH h AS (
      |  SELECT event_type, user_id,
      |    CAST('0x' || SUBSTRING(MD5(CAST(user_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) < 144115188075855872 AS in_sample
      |  FROM events),
      |agg AS (
      |  SELECT event_type,
      |    COUNT(*)::BIGINT AS n_exact,
      |    COUNT(DISTINCT user_id)::BIGINT AS u_exact,
      |    SUM(CASE WHEN in_sample THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
      |    COUNT(DISTINCT CASE WHEN in_sample THEN user_id END)::BIGINT
      |      AS u_sampled
      |  FROM h GROUP BY 1)
      |SELECT event_type, n_exact, n_sampled, 8 * n_sampled AS n_est,
      |  CAST(8 * n_sampled - n_exact AS DOUBLE) / n_exact AS n_rel_err,
      |  u_exact, u_sampled, 8 * u_sampled AS u_est,
      |  CAST(8 * u_sampled - u_exact AS DOUBLE) / u_exact AS u_rel_err
      |FROM agg
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val h = events(s, d).select(col("event_type"), col("user_id"),
      (conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long") < 144115188075855872L).as("in_sample"))
    h.groupBy("event_type")
      .agg(count(lit(1)).as("n_exact"),
        countDistinct("user_id").cast("long").as("u_exact"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"),
        countDistinct(when(col("in_sample"), col("user_id")))
          .cast("long").as("u_sampled"))
      .select(col("event_type"), col("n_exact"), col("n_sampled"),
        (col("n_sampled") * 8).as("n_est"),
        ((col("n_sampled") * 8 - col("n_exact")).cast("double") /
          col("n_exact").cast("double")).as("n_rel_err"),
        col("u_exact"), col("u_sampled"),
        (col("u_sampled") * 8).as("u_est"),
        ((col("u_sampled") * 8 - col("u_exact")).cast("double") /
          col("u_exact").cast("double")).as("u_rel_err"))
      .orderBy("event_type")
  }

  /** SKYLINE (Pareto-frontier) operator — the classic database-research
    * operator (Börzsönyi et al.'s SKYLINE OF): per brand, the parts not
    * dominated in (size ↑, price ↓) — "no other part of the brand is at
    * least as large AND at least as cheap, strictly better in one".
    * The scalable shape is NOT a quadratic dominance self-join and NOT
    * a window over the parts table: one map-combined agg collapses to
    * the per-(brand, size) MIN-price spine (≤ |brands|·|sizes| rows —
    * dominance within a size class is decided by the min), a strict
    * running-min window over STRICTLY-larger sizes (RANGE frame on
    * size DESC excludes ties, unlike ROWS) marks frontier sizes, and a
    * semi-join back picks every part ON the frontier point — ties in
    * (size, price) are all reported, as skyline semantics require.
    * Prices compare in exact cents (×100 BIGINT).
    *
    * 100 TB shape: fact table touched twice (agg + the join-back),
    * both map-combined/hash; windows run over the bounded value spine
    * only. */
  val q151Skyline: Q = Q(
    "q151_skyline",
    """WITH p AS (
      |  SELECT p_brand, p_partkey, p_size,
      |    CAST(FLOOR(p_retailprice * 100.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
      |      AS cents
      |  FROM part),
      |spine AS (
      |  SELECT p_brand, p_size, MIN(cents) AS minc
      |  FROM p GROUP BY 1, 2),
      |marked AS (
      |  SELECT p_brand, p_size, minc,
      |    MIN(minc) OVER (PARTITION BY p_brand ORDER BY p_size DESC
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
      |  FROM spine),
      |frontier AS (
      |  SELECT p_brand, p_size, minc FROM marked
      |  WHERE m1 IS NULL OR minc < m1)
      |SELECT p.p_brand, p.p_partkey, p.p_size, p.cents
      |FROM p JOIN frontier f
      |  ON f.p_brand = p.p_brand AND f.p_size = p.p_size
      |     AND f.minc = p.cents
      |ORDER BY p.p_brand, p.p_size DESC, p.p_partkey""".stripMargin) { (s, d) =>
    val p = part(s, d).select(col("p_brand"), col("p_partkey"), col("p_size"),
      floor(col("p_retailprice") * 100.0 + 0.5).cast("long").as("cents"))
    val spine = p.groupBy("p_brand", "p_size").agg(min("cents").as("minc"))
    val w = Window.partitionBy("p_brand").orderBy(col("p_size").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val frontier = spine
      .withColumn("m1", min("minc").over(w))
      .filter(col("m1").isNull || col("minc") < col("m1"))
      .select(col("p_brand").as("fb"), col("p_size").as("fs"),
        col("minc").as("fc"))
    p.join(frontier, col("p_brand") === col("fb") &&
        col("p_size") === col("fs") && col("cents") === col("fc"))
      .select("p_brand", "p_partkey", "p_size", "cents")
      .orderBy(col("p_brand"), col("p_size").desc, col("p_partkey"))
  }

  val all: Seq[Q] = Seq(q140InformationValue, q141AsofTolerance,
    q142SampleKeyAudit, q151Skyline)
}
