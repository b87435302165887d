package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** The warehouse layer DOWNSTREAM of the CDC stream (SURVEY.md §2.4): the
  * reference lands upserted state in ClickHouse (reference:
  * docker-compose.yml:155-174 provisions the sink; main.py:37-39 applies
  * the tombstone-skip that makes the landed state upsert-shaped;
  * debezium.json:18 `snapshot.mode=initial` makes the stream fully
  * determine table state). Real deployments then derive history tables,
  * snapshot diffs, and delivery audits from that changelog — the
  * operators here. Batch-shaped (the events table doubles as the
  * changelog: key = user_id, attribute = event_type, version = ts,
  * event_id), reusable unchanged inside foreachBatch.
  */
object Scd {

  /** SCD Type-2 dimension build: collapse the changelog to CHANGE rows
    * (runs of the same attribute value merge), then validity intervals
    * [eff_from, eff_to) via LEAD, open-ended for the current row.
    *
    * Scale: both windows partition by the key — ONE hash shuffle on
    * user_id feeds both passes (Catalyst reuses the exchange); no global
    * sort, no self-join. This is the minimal-movement SCD2 plan at any
    * data size.
    */
  def scd2(changelog: DataFrame, key: String, attr: String,
      version: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(version.map(col): _*)
    changelog
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
      .withColumn("eff_from", col(version.head))
      .withColumn("eff_to", lead(col(version.head), 1).over(w))
      .withColumn("is_current", col("eff_to").isNull)
      .drop("__prev")
  }

  val scd2History: Q = Q(
    "cdc_scd2_history",
    """SELECT user_id, event_type, eff_from, eff_to, eff_to IS NULL AS is_current
      |FROM (
      |  SELECT user_id, event_type, ts AS eff_from,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to
      |  FROM (
      |    SELECT user_id, event_type, ts, event_id,
      |      LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |    FROM events)
      |  WHERE prev IS NULL OR prev <> event_type)
      |ORDER BY user_id, eff_from""".stripMargin) { (s, d) =>
    scd2(events(s, d), "user_id", "event_type", Seq("ts", "event_id"))
      .select("user_id", "event_type", "eff_from", "eff_to", "is_current")
      .orderBy("user_id", "eff_from")
  }

  /** Incremental SCD2 maintenance — the foreachBatch form of [[scd2]]:
    * merge a micro-batch of changes into an existing history WITHOUT
    * rebuilding closed rows. Closed intervals are immutable; only the
    * open (eff_to IS NULL) row of each key that actually appears in the
    * batch is re-derived, together with the batch's own events. At scale
    * the touched set is |batch keys|, not |history| — the closed past is
    * never read past its key filter (partition/bucket the history by key
    * and the filter prunes).
    *
    * Precondition: batches arrive in version order per key (a batch never
    * carries an event older than the key's open interval) — the standard
    * contract for an ordered changelog; the upstream redelivery dedup
    * (ST5) and per-key ordering of the CDC source provide it.
    *
    * Invariant (spec-checked): applying batches incrementally yields
    * byte-identical history to running [[scd2]] over all events at once.
    */
  def scd2Merge(history: DataFrame, batch: DataFrame, key: String,
      attr: String, version: Seq[String]): DataFrame = {
    if (history.isEmpty)
      return scd2(batch, key, attr, version)
        .select(Seq(key, attr, "eff_from", "eff_to", "is_current").map(col): _*)
    val affectedKeys = batch.select(key).distinct()
    val affectedOpen = history
      .filter(col("eff_to").isNull)
      .join(affectedKeys, Seq(key), "left_semi")
    val untouched = history
      .join(affectedKeys, Seq(key), "left_anti")
    val closedPast = history.filter(col("eff_to").isNotNull)
      .join(affectedKeys, Seq(key), "left_semi")
    // re-derive from: the open row replayed as a pseudo-event at its
    // eff_from, plus the batch — scd2's change-collapse then closes the
    // open interval at the first REAL attribute change and drops
    // no-change redeliveries
    val replay = affectedOpen
      .select(Seq(col(key), col(attr)) ++
        version.zipWithIndex.map { case (v, i) =>
          (if (i == 0) col("eff_from") else lit(-1L)).as(v) }: _*)
    val rebuilt = scd2(
      replay.unionByName(batch.select((Seq(key, attr) ++ version).map(col): _*)),
      key, attr, version)
    closedPast.unionByName(untouched)
      .unionByName(rebuilt.select(
        Seq(key, attr, "eff_from", "eff_to", "is_current").map(col): _*))
  }

  /** Snapshot diff (change-data-feed between two as-of states): the
    * materialized state at T1 vs at T2, classified per key as
    * c(reate)/u(pdate)/d(elete). 'error' rows act as tombstones, exactly
    * like [[Cdc.materialize]].
    *
    * Scale: each side is one latest-per-key window over a filtered scan;
    * both shuffles hash on user_id, so the FULL OUTER join that follows
    * is co-partitioned — Catalyst plans it without a third exchange.
    */
  def snapshotDiff(changelog: DataFrame, key: String, version: Seq[Column],
      tombstone: Column, t1: Column, t2: Column, ts: Column): DataFrame = {
    def stateAt(cut: Column): DataFrame =
      Cdc.materialize(changelog.filter(ts < cut), Seq(key), version, tombstone)
    val s1 = stateAt(t1).select(col(key), col("event_id").as("old_event_id"))
    val s2 = stateAt(t2).select(col(key), col("event_id").as("new_event_id"))
    s1.join(s2, Seq(key), "full_outer")
      .withColumn("op",
        when(col("old_event_id").isNull, "c")
          .when(col("new_event_id").isNull, "d")
          .otherwise("u"))
      .filter(col("op") =!= "u" || col("old_event_id") =!= col("new_event_id"))
  }

  val snapshotDiffQ: Q = Q(
    "cdc_snapshot_diff",
    """WITH s1 AS (
      |  SELECT user_id, event_id FROM (
      |    SELECT user_id, event_id, event_type,
      |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00')
      |  WHERE rn = 1 AND event_type <> 'error'),
      |s2 AS (
      |  SELECT user_id, event_id FROM (
      |    SELECT user_id, event_id, event_type,
      |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts < TIMESTAMP '2024-01-31 00:00:00')
      |  WHERE rn = 1 AND event_type <> 'error')
      |SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
      |  s1.event_id AS old_event_id, s2.event_id AS new_event_id,
      |  CASE WHEN s1.user_id IS NULL THEN 'c'
      |       WHEN s2.user_id IS NULL THEN 'd' ELSE 'u' END AS op
      |FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
      |WHERE s1.user_id IS NULL OR s2.user_id IS NULL
      |   OR s1.event_id <> s2.event_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    snapshotDiff(events(s, d), "user_id",
        Seq(col("ts"), col("event_id")),
        tombstone = col("event_type") === "error",
        t1 = lit("2024-01-16 00:00:00").cast("timestamp"),
        t2 = lit("2024-01-31 00:00:00").cast("timestamp"),
        ts = col("ts"))
      .select("user_id", "old_event_id", "new_event_id", "op")
      .orderBy("user_id")
  }

  /** Delivery-gap audit (S2's bounded-replay counterpart): which sequence
    * ids are missing from a changelog whose ids should be dense? A lost
    * micro-batch shows up as a run of absent ids. A deterministic
    * synthetic loss (event_id ≡ 13 mod 97) stands in for the dropped
    * delivery.
    *
    * Scale: the run-start probe `id+1 NOT IN ids` is a broadcast-free
    * shuffled LEFT ANTI self-join on the id — fully distributed, unlike
    * the textbook global-ORDER-BY-LEAD formulation whose unpartitioned
    * window would serialize 100 TB through one task.
    */
  val gapAudit: Q = Q(
    "cdc_gap_audit",
    """WITH delivered AS (SELECT event_id FROM events WHERE event_id % 97 <> 13),
      |mx AS (SELECT MAX(event_id) AS m FROM delivered)
      |SELECT d.event_id + 1 AS gap_start
      |FROM delivered d, mx
      |WHERE d.event_id + 1 NOT IN (SELECT event_id FROM delivered)
      |  AND d.event_id < mx.m
      |ORDER BY gap_start""".stripMargin) { (s, d) =>
    val delivered = events(s, d).select("event_id")
      .filter(col("event_id") % 97 =!= 13)
    val mx = delivered.agg(max("event_id").as("m"))
    delivered
      .select((col("event_id") + 1).as("gap_start"))
      .join(delivered, col("gap_start") === col("event_id"), "left_anti")
      .join(broadcast(mx), col("gap_start") <= col("m"))
      .select("gap_start")
      .orderBy("gap_start")
  }

  /** Referential-integrity audit over the landed tables: orphaned
    * foreign keys per relationship — the CDC-lake health check that
    * catches out-of-order table snapshots or dropped deliveries (a child
    * row landing before/without its parent). Each relationship is one
    * LEFT ANTI join (hash, broadcast when the parent is a dim) feeding a
    * single-row count; the union of per-relationship summaries is
    * constant-size regardless of data volume. */
  val fkAudit: Q = Q(
    "cdc_fk_audit",
    """SELECT rel, n_orphans FROM (
      |  SELECT 'orders->customer' AS rel, COUNT(*) AS n_orphans
      |  FROM orders o WHERE NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'lineitem->orders', COUNT(*)
      |  FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'customer->nation', COUNT(*)
      |  FROM customer c WHERE NOT EXISTS
      |    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
      |ORDER BY rel""".stripMargin) { (s, d) =>
    def orphans(rel: String, child: org.apache.spark.sql.DataFrame,
        parent: org.apache.spark.sql.DataFrame,
        childKey: String, parentKey: String) =
      child.join(parent, col(childKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(rel).as("rel"), col("n_orphans"))
    orphans("orders->customer", orders(s, d), customer(s, d),
        "o_custkey", "c_custkey")
      .unionAll(orphans("lineitem->orders", lineitem(s, d), orders(s, d),
        "l_orderkey", "o_orderkey"))
      .unionAll(orphans("customer->nation", customer(s, d),
        broadcast(nation(s, d)), "c_nationkey", "n_nationkey"))
      .orderBy("rel")
  }

  /** Stream-freshness report: per event type, last-seen time and lag
    * behind the freshest record anywhere — the monitoring query a CDC
    * operator alarms on. One hash aggregate; the global max attaches as
    * a one-row broadcast; lag stays exact µs integers. */
  val freshness: Q = Q(
    "cdc_freshness",
    """WITH per_type AS (
      |  SELECT event_type, COUNT(*) AS n, MAX(ts) AS last_seen
      |  FROM events GROUP BY 1),
      |head AS (SELECT MAX(last_seen) AS head_ts FROM per_type)
      |SELECT event_type, n, last_seen,
      |  EPOCH_US(head_ts) - EPOCH_US(last_seen) AS lag_us
      |FROM per_type, head
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val perType = events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("ts").as("last_seen"))
    val head = perType.agg(max("last_seen").as("head_ts"))
    perType.crossJoin(broadcast(head))
      .select(col("event_type"), col("n"), col("last_seen"),
        (unix_micros(col("head_ts")) - unix_micros(col("last_seen")))
          .as("lag_us"))
      .orderBy("event_type")
  }

  /** Duplicate-delivery audit (completes the trio with [[gapAudit]] and
    * [[fkAudit]]): sequence ids delivered more than once — the signature
    * of a replayed micro-batch landing without idempotent upsert. A
    * deterministic synthetic redelivery (event_id ≡ 7 mod 101 doubled)
    * stands in for the replay. One codegen'd hash aggregate; the HAVING
    * prunes map-side. */
  val dupAudit: Q = Q(
    "cdc_dup_audit",
    """WITH delivered AS (
      |  SELECT event_id FROM events
      |  UNION ALL
      |  SELECT event_id FROM events WHERE event_id % 101 = 7)
      |SELECT event_id, COUNT(*) AS n_deliveries
      |FROM delivered
      |GROUP BY event_id
      |HAVING COUNT(*) > 1
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ids = events(s, d).select("event_id")
    ids.unionAll(ids.filter(col("event_id") % 101 === 7))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_deliveries"))
      .filter(col("n_deliveries") > 1)
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(scd2History, snapshotDiffQ, gapAudit, fkAudit,
    freshness, dupAudit)
}
