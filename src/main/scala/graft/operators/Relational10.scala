package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Tenth relational batch — inventory/audience classification ops:
  * ABC (Pareto) revenue classification and the new-vs-returning user
  * split. Both are exact-integer to the final ratio. */
object Relational10 {

  /** ABC classification: parts ranked by revenue, bucketed at the
    * 80% / 95% cumulative-revenue marks (the classic Pareto inventory
    * split). The cumulative sum over the revenue-ranked part list is a
    * GLOBAL running sum — computed by the two-pass range-partitioned
    * [[ScalableWindows.globalRunningSum]], so no single task ever
    * sorts the whole part dimension; bucket tests are exact integer
    * cross-multiplications (100·cum ≤ 80·tot). */
  val q126AbcPareto: Q = Q(
    "q126_abc_pareto",
    """WITH r AS (
      |  SELECT l_partkey AS pk,
      |    SUM(CAST(FLOOR(l_extendedprice * 100.0::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT))::BIGINT AS cents
      |  FROM lineitem GROUP BY 1),
      |w AS (
      |  SELECT pk, cents,
      |    SUM(CAST(cents AS HUGEINT)) OVER (ORDER BY cents DESC, pk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(CAST(cents AS HUGEINT)) OVER () AS tot
      |  FROM r)
      |SELECT
      |  CASE WHEN 100 * cum <= 80 * tot THEN 'A'
      |       WHEN 100 * cum <= 95 * tot THEN 'B'
      |       ELSE 'C' END AS cls,
      |  COUNT(*)::BIGINT AS n_parts,
      |  CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0::DOUBLE
      |    AS revenue,
      |  CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
      |    / CAST(MAX(tot) AS DOUBLE) AS revenue_share
      |FROM w GROUP BY 1
      |ORDER BY cls""".stripMargin) { (s, d) =>
    val r = lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
        .as("cents"))
      // r17: three evaluations shared one corpus agg — the `tot`
      // broadcast, the range partitioner's sampling pass, and its
      // shuffle each re-ran the lineitem aggregation un-checkpointed
      .localCheckpoint(true)
    val tot = broadcast(r.agg(sum("cents").as("tot")))
    val rs = ScalableWindows.globalRunningSum(
      r, Seq(col("cents").desc, col("pk")), col("cents"), "rn", "cum")
    val cls = when(lit(100L) * col("cum") <= lit(80L) * col("tot"), "A")
      .when(lit(100L) * col("cum") <= lit(95L) * col("tot"), "B")
      .otherwise("C")
    rs.crossJoin(tot)
      .groupBy(cls.as("cls"))
      .agg(count(lit(1)).as("n_parts"),
        (sum("cents").cast("double") / 100.0).as("revenue"),
        (sum("cents").cast("double") / max("tot").cast("double"))
          .as("revenue_share"))
      .orderBy("cls")
  }

  /** New vs returning actives per day: a user is NEW on their first
    * active day, RETURNING on every later one. Two hash aggs over the
    * distinct (day, user) grid and one equi-join — the growth-
    * accounting decomposition every product dashboard leads with. */
  val q127NewVsReturning: Q = Q(
    "q127_new_vs_returning",
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |fu AS (SELECT user_id, MIN(day) AS first_day FROM du GROUP BY 1)
      |SELECT du.day,
      |  COUNT(*)::BIGINT AS n_active,
      |  SUM(CASE WHEN fu.first_day = du.day THEN 1 ELSE 0 END)::BIGINT
      |    AS n_new,
      |  SUM(CASE WHEN fu.first_day = du.day THEN 0 ELSE 1 END)::BIGINT
      |    AS n_returning,
      |  CAST(SUM(CASE WHEN fu.first_day = du.day THEN 1 ELSE 0 END)
      |    AS DOUBLE) / COUNT(*) AS pct_new
      |FROM du JOIN fu ON fu.user_id = du.user_id
      |GROUP BY 1
      |ORDER BY day""".stripMargin) { (s, d) =>
    val du = events(s, d)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .distinct()
      .localCheckpoint()
    val fu = du.groupBy("user_id").agg(min("day").as("first_day"))
    val isNew = when(col("first_day") === col("day"), 1L).otherwise(0L)
    du.join(fu, "user_id")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(isNew).as("n_new"),
        sum(lit(1L) - isNew).as("n_returning"),
        (sum(isNew).cast("double") / count(lit(1))).as("pct_new"))
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(q126AbcPareto, q127NewVsReturning)
}
