package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.Tables._

/** CDC semantics (SURVEY.md §2.2, §2.4), factored as batch transforms so
  * the DuckDB oracle can check them and the streaming layer can reuse them
  * unchanged inside foreachBatch.
  *
  * Reference grounding: the Debezium connectors apply ExtractNewRecordState
  * (reference: debezium.json:27-28, all.json:26-27) so consumed values are
  * after-images and deletes arrive as null-value tombstones that the
  * consumer skips (reference: main.py:37-39). snapshot.mode=initial
  * (reference: debezium.json:18) makes the stream fully determine table
  * state, so "materialize" = latest non-tombstone row per key — the
  * ClickHouse ReplacingMergeTree-FINAL equivalent. created_at rides as a
  * Debezium MicroTimestamp raw long (reference: schema.avsc:17-29).
  */
object Cdc {

  /** Latest row per key under a version order — the upsert-materialization
    * primitive (ST2). One shuffle on the key columns; at 100 TB this is
    * the minimal-movement plan (partition by PK, per-partition top-1, no
    * global sort). AQE handles skewed keys.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version.map(_.desc): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Upsert + delete propagation (ST2 + ST3): materialized state = latest
    * row per key, dropped entirely when that latest row is a tombstone. */
  def materialize(
      changelog: DataFrame,
      keys: Seq[String],
      version: Seq[Column],
      isTombstone: Column): DataFrame =
    latestByKey(changelog.withColumn("__graft_del", isTombstone), keys, version)
      .filter(!col("__graft_del"))
      .drop("__graft_del")

  /** Raw Debezium envelope shape for the non-unwrapped mode
    * (FIXTURES.md §1.2; reference: debezium.json:27-28 is what removes it
    * upstream in the reference topology). */
  def envelopeSchema(row: StructType): StructType = StructType(Seq(
    StructField("before", row, nullable = true),
    StructField("after", row, nullable = true),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false)))

  /** D4: ExtractNewRecordState as a Spark projection — after-image of
    * creates/updates/snapshot-reads; deletes drop out (their after is
    * null, i.e. the tombstone the reference consumer skips,
    * reference: main.py:37-39). */
  def unwrapEnvelope(envelopes: DataFrame): DataFrame =
    envelopes.filter(col("op") =!= "d").select(col("after.*"))

  /** D5: tombstone routing — (upserts, deleteKeys). */
  def routeTombstones(records: DataFrame, valueCol: String, keyCols: Seq[String])
      : (DataFrame, DataFrame) =
    (records.filter(col(valueCol).isNotNull),
      records.filter(col(valueCol).isNull).select(keyCols.map(col): _*))

  /** D8: Debezium MicroTimestamp (µs-since-epoch long) → Spark timestamp. */
  def microsToTs(c: Column): Column = timestamp_micros(c)

  // ── oracle-checked query entries over the events changelog ──
  // events doubles as a changelog: key = user_id, version = (ts, event_id).

  /** ST2 upsert materialization: latest event per user. */
  val upsertLatest: Q = Q(
    "cdc_upsert_latest",
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    latestByKey(events(s, d), Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  /** ST2+ST3: materialized state with delete propagation — users whose
    * latest change is a tombstone ('error' stands in for the null-value
    * tombstone of the reference stream) disappear from the state. */
  val tombstoneState: Q = Q(
    "cdc_tombstone_state",
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    materialize(events(s, d), Seq("user_id"),
        Seq(col("ts"), col("event_id")),
        isTombstone = col("event_type") === "error")
      .select("user_id", "event_id", "event_type")
      .orderBy("user_id")
  }

  /** ST5: at-least-once redelivery dedup — the doubled changelog collapses
    * back to the original under key dedup, so downstream aggregates are
    * delivery-count-independent. */
  val dedupRedelivery: Q = Q(
    "cdc_dedup_redelivery",
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    ev.unionAll(ev) // simulated duplicate delivery (poll-loop re-read)
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(val4(col("value"))).as("total_value"))
      .orderBy("event_type")
  }

  /** D4 envelope unwrap, batch-shaped: wrap each event in a Debezium-style
    * envelope (signup→c, error→d, else u), then ExtractNewRecordState —
    * deletes drop, after-images project out. */
  val envelopeUnwrap: Q = Q(
    "cdc_envelope_unwrap",
    """SELECT event_id, user_id, value
      |FROM events
      |WHERE event_type <> 'error'
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val op = when(col("event_type") === "signup", "c")
      .when(col("event_type") === "error", "d")
      .otherwise("u")
    val row = struct(col("event_id"), col("user_id"), col("value"))
    val envelopes = events(s, d).select(
      when(op =!= "c", row).as("before"),
      when(op =!= "d", row).as("after"),
      op.as("op"),
      unix_millis(col("ts")).as("ts_ms"))
    unwrapEnvelope(envelopes).orderBy("event_id")
  }

  /** D8 MicroTimestamp round trip: timestamp → raw µs long (the wire form
    * of schema.avsc's created_at) → timestamp again. */
  val microTsRoundtrip: Q = Q(
    "cdc_micro_ts_roundtrip",
    """SELECT event_id, EPOCH_US(ts) AS us, MAKE_TIMESTAMP(EPOCH_US(ts)) AS ts_rt
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    events(s, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        microsToTs(unix_micros(col("ts"))).as("ts_rt"))
      .orderBy("event_id")
  }

  /** Delivery-order audit: per key, how often the append order
    * (event_id — the WAL/offset order the reference consumer reads in)
    * runs BACKWARDS in event time, and by how much. The "can downstream
    * treat append order as time order" monitoring row: version-gated
    * upserts (cdc_upsert_latest, the JDBC MERGE sink) are safe under
    * inversions, while naive last-write-wins is not — this query is how
    * a deployment measures that risk.
    *
    * The driver fixture's append order IS time-ordered, so (the
    * [[dedupRedelivery]] convention) the audited stream synthesizes the
    * failure in-query: every 97th event is re-delivered late (offset
    * +10⁹ — a connector retry landing after newer rows), creating real
    * inversions for the audit to find. One window + one agg on the
    * same user_id shuffle; all arithmetic exact µs BIGINTs. */
  val orderInversions: Q = Q(
    "cdc_order_inversions",
    """WITH st AS (
      |  SELECT user_id, EPOCH_US(ts) AS t, event_id FROM events
      |  UNION ALL
      |  SELECT user_id, EPOCH_US(ts), event_id + 1000000000
      |  FROM events WHERE event_id % 97 = 0),
      |v AS (
      |  SELECT user_id, t,
      |    LAG(t) OVER (PARTITION BY user_id ORDER BY event_id) AS pt
      |  FROM st)
      |SELECT user_id,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN pt IS NOT NULL AND t < pt THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_inversions,
      |  CAST(MAX(CASE WHEN pt IS NOT NULL AND t < pt THEN pt - t
      |           ELSE 0 END) AS BIGINT) AS max_backstep_us
      |FROM v
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val base = events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
    val st = base.unionAll(
      base.filter(col("event_id") % 97 === 0)
        .select(col("user_id"), col("t"),
          (col("event_id") + 1000000000L).as("event_id")))
    val w = Window.partitionBy("user_id").orderBy(col("event_id"))
    st.withColumn("pt", lag(col("t"), 1).over(w))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("pt").isNotNull && col("t") < col("pt"), 1L)
          .otherwise(0L)).cast("bigint").as("n_inversions"),
        max(when(col("pt").isNotNull && col("t") < col("pt"),
          col("pt") - col("t")).otherwise(0L)).cast("bigint")
          .as("max_backstep_us"))
      .orderBy("user_id")
  }

  /** Key-skew audit of the change stream: the histogram of
    * changes-per-key plus each multiplicity's share of total traffic —
    * the replication-planning readout (a handful of hot rows receiving
    * most updates is what melts a partition-by-PK sink; the reference
    * topology inherits whatever skew the Postgres workload has, and an
    * operator needs to SEE it before choosing sink partitioning /
    * salting). Two hash aggregations: per-key counts, then the
    * multiplicity spine — output bounded by the max per-key
    * multiplicity, never by corpus size; the share is one exact
    * integer division surfaced as double. */
  val keySkewAudit: Q = Q(
    "cdc_key_skew_audit",
    """WITH pk AS (
      |  SELECT user_id, COUNT(*)::BIGINT AS c FROM events GROUP BY 1),
      |tot AS (SELECT SUM(c)::BIGINT AS total, COUNT(*)::BIGINT AS n_keys
      |        FROM pk)
      |SELECT pk.c AS changes_per_key, COUNT(*)::BIGINT AS n_keys,
      |  (pk.c * COUNT(*))::BIGINT AS n_changes,
      |  CAST(pk.c * COUNT(*) AS DOUBLE) / MIN(tot.total) AS traffic_share
      |FROM pk CROSS JOIN tot
      |GROUP BY pk.c
      |ORDER BY changes_per_key""".stripMargin) { (s, d) =>
    val pk = events(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
    val tot = broadcast(pk.agg(sum("c").as("total")))
    pk.crossJoin(tot)
      .groupBy("c")
      .agg(count(lit(1)).as("n_keys"), min("total").as("total"))
      .select(col("c").as("changes_per_key"), col("n_keys"),
        (col("c") * col("n_keys")).as("n_changes"),
        ((col("c") * col("n_keys")).cast("double") / col("total"))
          .as("traffic_share"))
      .orderBy("changes_per_key")
  }

  /** The ACT step after [[keySkewAudit]]'s SEE step: derive the sink
    * partition plan from the observed per-key traffic. Strategy (the
    * standard salted-partitioning rule for a partition-by-PK sink over
    * `SinkParts` base partitions): a key whose traffic exceeds one
    * partition's fair share is split across
    * `ceil(share · SinkParts)` salted sub-partitions, so no single
    * sink partition receives more than ~1/SinkParts of the stream even
    * under a zipfian head; uniform keys keep 1. Emitted as the
    * salt-parts histogram (n_keys / n_changes / traffic share per
    * salt count) — bounded by SinkParts rows, never by key count.
    *
    * Exactness: salt_parts is PURE INTEGER arithmetic
    * (`(c·SinkParts + total − 1) div total` — ceiling division, no
    * doubles to disagree on), and the one share division is a single
    * mirrored double op routed through BIGINT casts (the
    * HUGEINT→DOUBLE r10/r12 defect class is avoided by casting
    * SUM(c) to BIGINT before the DOUBLE cast). 100 TB shape: two hash
    * aggregations + a broadcast 1-row total, identical to the audit.
    * On the round-13 skew corpus (`tools/SkewUp`) the injected
    * 25/12.5/6.25% head reads back as salt_parts 8/5/3 (ceiling
    * division rounds the just-above-nominal shares up) while all
    * 14,997 uniform keys keep 1 — oracle-verified on that corpus. */
  /** base sink partition count for [[sinkPartitionPlan]] */
  private val SinkParts = 32

  val sinkPartitionPlan: Q = Q(
    "cdc_sink_partition_plan",
    s"""WITH pk AS (
       |  SELECT user_id, COUNT(*)::BIGINT AS c FROM events GROUP BY 1),
       |t AS (SELECT SUM(c)::BIGINT AS total FROM pk),
       |plan AS (
       |  SELECT user_id, c, total,
       |    (c * $SinkParts + total - 1) // total AS salt_parts
       |  FROM pk CROSS JOIN t)
       |SELECT CAST(salt_parts AS BIGINT) AS salt_parts,
       |  COUNT(*)::BIGINT AS n_keys,
       |  SUM(c)::BIGINT AS n_changes,
       |  CAST(SUM(c)::BIGINT AS DOUBLE) / MIN(total) AS traffic_share
       |FROM plan
       |GROUP BY salt_parts
       |ORDER BY salt_parts""".stripMargin) { (s, d) =>
    val pk = events(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
    val tot = broadcast(pk.agg(sum("c").as("total")))
    pk.crossJoin(tot)
      .withColumn("salt_parts",
        expr(s"(c * $SinkParts + total - 1) div total"))
      .groupBy("salt_parts")
      .agg(count(lit(1)).as("n_keys"), sum("c").as("n_changes"),
        min("total").as("total"))
      .select(col("salt_parts"), col("n_keys"), col("n_changes"),
        (col("n_changes").cast("double") / col("total"))
          .as("traffic_share"))
      .orderBy("salt_parts")
  }

  /** Payload schema-drift audit: per JSON key appearing in the change
    * payload (`events.props` stands in for the Debezium `after` image,
    * whose column set drifts when the captured table's DDL changes —
    * the reference inherits new columns silently via schema-registry
    * evolution, schema.avsc / registry config in docker-compose), the
    * key's lifetime (first/last day seen), day coverage, event count
    * and share, and its value-domain width (distinct serialized
    * values, lexicographic min/max). A key whose first_day is recent =
    * a NEW column arrived upstream; a key whose last_day stalls = a
    * DROPPED column — both need sink-DDL action before the upsert
    * MERGE starts silently nulling.
    *
    * Oracle robustness: the DuckDB side extracts each value via a
    * QUOTED json path (`'$."' || key || '"'`) so keys containing `.`
    * or `[` — which an unquoted `'$.' || key` would mis-parse as path
    * structure — extract correctly. Remaining documented assumptions
    * (held by the `events.props` generator and asserted sufficient by
    * the hash gate): keys contain no `"` (a quoted-path escape has no
    * portable spelling across both engines) and objects carry no
    * duplicate keys (Spark's `from_json` map keeps the LAST duplicate;
    * JSON semantics for duplicates are undefined, so parity there is
    * out of scope for a drift audit).
    *
    * Exact integers/strings everywhere; the one share division is a
    * single mirrored double op. 100 TB shape: one generator-explode of
    * the key map (map-side), one hash agg keyed by (key) with
    * map-side-combinable counts/min/max, plus a broadcast 1-row total;
    * COUNT(DISTINCT day/val) shuffles only (key, day)/(key, val)
    * pairs — bounded by key-cardinality × domain, never corpus-wide
    * state. */
  val propsDrift: Q = Q(
    "cdc_props_drift",
    """WITH t AS (SELECT COUNT(*)::BIGINT AS total FROM events),
      |e AS (SELECT CAST(ts AS DATE) AS day, props,
      |        UNNEST(json_keys(props)) AS key FROM events),
      |v AS (SELECT day, key,
      |        json_extract_string(props, '$."' || key || '"') AS val
      |      FROM e)
      |SELECT key, COUNT(*)::BIGINT AS n_events,
      |  COUNT(DISTINCT day)::BIGINT AS n_days,
      |  MIN(day) AS first_day, MAX(day) AS last_day,
      |  COUNT(DISTINCT val)::BIGINT AS n_values,
      |  MIN(val) AS min_val, MAX(val) AS max_val,
      |  CAST(COUNT(*) AS DOUBLE) / MIN(t.total) AS coverage
      |FROM v CROSS JOIN t
      |GROUP BY key
      |ORDER BY key""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val tot = broadcast(ev.agg(count(lit(1)).as("total")))
    val v = ev
      .select(to_date(col("ts")).as("day"),
        explode(from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
          .as(Seq("key", "val")))
    v.crossJoin(tot)
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("day").as("n_days"),
        min("day").as("first_day"), max("day").as("last_day"),
        countDistinct("val").as("n_values"),
        min("val").as("min_val"), max("val").as("max_val"),
        (count(lit(1)).cast("double") / min("total")).as("coverage"))
      .orderBy("key")
  }

  val all: Seq[Q] = Seq(
    upsertLatest, tombstoneState, dedupRedelivery, envelopeUnwrap,
    microTsRoundtrip, orderInversions, keySkewAudit, sinkPartitionPlan,
    propsDrift)
}
