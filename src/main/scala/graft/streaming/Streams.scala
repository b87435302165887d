package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.operators.Cdc

/** Structured-Streaming layer (SURVEY.md §2.4 ST1–ST6): watermarked
  * event-time windows, stream dedup, arbitrary keyed state, and the
  * foreachBatch upsert sink that reuses the batch CDC transforms
  * unchanged. All builders take unbounded DataFrames from any source
  * (Kafka in production, MemoryStream in tests) — the plans are
  * incrementalized by MicroBatchExecution, and state stores shard by the
  * grouping key, so parallelism scales with partitions exactly like the
  * batch plans.
  */
object Streams {

  /** ST4: watermarked tumbling/sliding window aggregation. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      watermark: String,
      windowLen: String,
      slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), windowLen, s)
      case None    => window(col(tsCol), windowLen)
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(w.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("total"))
  }

  /** ST4: session windows — gap-based grouping per user. */
  def sessionCounts(events: DataFrame, tsCol: String, watermark: String,
      gap: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("win"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("user_id"), col("n"))

  /** ST5: at-least-once redelivery dedup bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      watermark: String, idCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream join: purchases matched to the signups of the same
    * user within a bounded interval. Both sides carry watermarks so the
    * join state is GC-able — the condition bounds how long a signup is
    * retained (the production-correct shape; an unbounded stream-stream
    * join would accumulate state forever). */
  def purchasesWithSignup(
      signups: DataFrame,
      purchases: DataFrame,
      maxAge: String = "1 hour"): DataFrame = {
    val sg = signups.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
    val pu = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value"))
    pu.join(sg,
      col("p_user") === col("s_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $maxAge"))
      .select(col("p_user").as("user_id"), col("purchase_ts"),
        col("signup_ts"), col("value"))
  }

  /** Stream-static enrichment: the canonical CDC pattern of joining a
    * change stream against a slowly-changing dimension snapshot. The
    * static side is broadcast (re-read per micro-batch when the
    * underlying files change — Spark re-plans the static relation each
    * batch), so the stream never shuffles; at 100 TB/day of stream the
    * dim side stays a map-side hash lookup. Left join keeps events whose
    * key has no dim row yet (late-arriving dimension). */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key),
      "left_outer")

  /** Stream-stream LEFT OUTER interval join: like [[purchasesWithSignup]]
    * but purchases with no signup in the window are EMITTED (null-padded)
    * once the watermark proves no match can still arrive — the unmatched
    * rows surface exactly when their join state expires, which is why an
    * outer stream-stream join REQUIRES both the watermark and the time
    * bound (Spark rejects it otherwise). State stays GC-able: each side
    * is dropped as soon as the interval + watermark passes. */
  def purchasesWithSignupOuter(
      signups: DataFrame,
      purchases: DataFrame,
      maxAge: String = "1 hour"): DataFrame = {
    val sg = signups.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
    val pu = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value"))
    pu.join(sg,
      col("p_user") === col("s_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $maxAge"),
      "left_outer")
      .select(col("p_user").as("user_id"), col("purchase_ts"),
        col("signup_ts"), col("value"))
  }

  /** S9 production wiring: a foreachBatch body that appends each decoded
    * micro-batch to the at-rest parquet changelog (append-only, so the
    * write is idempotent-safe under retries when paired with the
    * checkpoint; state is recovered via Compaction.stateView /
    * compact). Partition by a demux key at scale. */
  def changelogAppend(path: String, partitionCols: Seq[String] = Nil)
      : (DataFrame, Long) => Unit =
    (batch, _) =>
      graft.sources.ParquetSink.writePartitioned(
        batch, path, partitionCols, mode = "append")

  /** ST6 state record: per-user running aggregate. */
  final case class UserState(user_id: Long, n_events: Long, total: Double)
  final case class UserEvent(user_id: Long, event_type: String, value: Double)

  /** ST6: arbitrary keyed state via mapGroupsWithState — running per-user
    * totals that survive across micro-batches. */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserState] =
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[UserState, UserState](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(uid, 0L, 0.0))
          var n = prev.n_events; var t = prev.total
          batch.foreach { e => n += 1; t += e.value }
          val next = UserState(uid, n, t)
          state.update(next)
          next
      }(Encoders.product[UserState], Encoders.product[UserState])

  /** ST6 session record emitted when a session CLOSES. */
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)
  final case class SessionAcc(startMs: Long, lastMs: Long, n: Long)

  /** Fold a batch of event times into (sessions closed NOW, open tail).
    * Times are processed in sorted EVENT-TIME order and a gap > gapMs
    * always splits — so two events farther apart than the gap can never
    * share a session, even when they land in one micro-batch or arrive
    * before the close timer fires (session boundaries are a property of
    * the data, not of batch/watermark alignment). An event older than
    * gap before the open session's start (below-watermark straggler)
    * closes immediately as its own singleton. Shared by both sessionizer
    * implementations so their semantics cannot drift. */
  private[graft] def foldSessions(prev: Option[SessionAcc],
      times: Seq[Long], gapMs: Long): (List[SessionAcc], SessionAcc) = {
    var closed = List.empty[SessionAcc]
    var acc = prev.orNull
    for (t <- times.sorted) {
      if (acc == null) acc = SessionAcc(t, t, 1L)
      else if (t > acc.lastMs + gapMs) {
        closed ::= acc; acc = SessionAcc(t, t, 1L)
      } else if (t < acc.startMs - gapMs) {
        closed ::= SessionAcc(t, t, 1L)
      } else acc = SessionAcc(math.min(acc.startMs, t),
        math.max(acc.lastMs, t), acc.n + 1)
    }
    (closed.reverse, acc)
  }

  private def toClosed(uid: Long, s: SessionAcc, gapMs: Long): ClosedSession =
    ClosedSession(uid, new java.sql.Timestamp(s.startMs),
      new java.sql.Timestamp(s.lastMs + gapMs), s.n)

  /** ST6 deep form: sessionization via flatMapGroupsWithState with
    * EVENT-TIME timeout — the arbitrary-state generalization of
    * session_window (use this shape when the per-session logic can't be
    * an aggregate: emit-on-close, per-session enrichment, custom merge).
    * A session closes, and its single record is emitted, only when the
    * watermark passes last-event + gap; state for the key is removed, so
    * store size tracks ACTIVE sessions only. */
  def sessionizeWithTimeout(events: Dataset[UserEvent2], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[ClosedSession] =
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionAcc, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[UserEvent2], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(toClosed(uid, s, gapMs))
          } else {
            // gap-aware fold: intra-batch (or cross-batch pre-timeout)
            // gaps close sessions NOW; only the open tail stays in state
            val (done, open) = foldSessions(state.getOption,
              batch.map(_.ts.getTime).toSeq, gapMs)
            state.update(open)
            // close when the watermark passes the gap after the last event
            state.setTimeoutTimestamp(open.lastMs + gapMs)
            done.iterator.map(toClosed(uid, _, gapMs))
          }
      }(Encoders.product[SessionAcc], Encoders.product[ClosedSession])

  final case class UserEvent2(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** ST6, Spark-4-native form: the same emit-on-close sessionizer as
    * [[sessionizeWithTimeout]], rebuilt on `transformWithState` — typed
    * `ValueState` replaces the single `GroupState` blob and the close
    * condition is an explicit EVENT-TIME TIMER (re-armed to last-event +
    * gap on every batch) instead of `setTimeoutTimestamp`. Requires the
    * RocksDB state store provider — the same store that gives 100 TB
    * streams changelog checkpointing and out-of-heap state; see
    * [[sessionizeTransformWithState]] for the conf. `StreamingSpec`
    * drives both implementations through one golden scenario. */
  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, UserEvent2, ClosedSession] {
    @transient private var acc: ValueState[SessionAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[SessionAcc](
        "session", Encoders.product[SessionAcc], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[UserEvent2],
        tv: TimerValues): Iterator[ClosedSession] = {
      // gap-aware fold (shared with the flatMapGroupsWithState form):
      // intra-batch gaps close sessions NOW, not at the next timer
      val (done, open) = foldSessions(
        if (acc.exists()) Some(acc.get()) else None,
        rows.map(_.ts.getTime).toSeq, gapMs)
      acc.update(open)
      // one live timer per key: drop the stale close time, re-arm at
      // last-event + gap (fires when the WATERMARK passes it)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(open.lastMs + gapMs)
      done.iterator.map(toClosed(uid, _, gapMs))
    }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val closed = if (acc.exists()) {
        val s = acc.get()
        Iterator(ClosedSession(uid, new java.sql.Timestamp(s.startMs),
          new java.sql.Timestamp(s.lastMs + gapMs), s.n))
      } else Iterator.empty
      acc.clear()
      closed
    }
  }

  /** [[SessionProcessor]] wired into a stream. Callers must run with
    * `spark.sql.streaming.stateStore.providerClass =
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    * (transformWithState rejects the default HDFS-backed store). */
  def sessionizeTransformWithState(events: Dataset[UserEvent2], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[ClosedSession] =
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())(
        Encoders.product[ClosedSession])

  /** Streaming NEAR-dup dedup: the foreachBatch form of
    * [[graft.operators.Dedup.incremental]]. The index at `indexDir` is a
    * POSTINGS table (doc_id, shingle): each micro-batch is shingled
    * once, paired against the index as old⋈new + new⋈new joins, and its
    * postings are appended. Old docs are never re-shingled and old⋈old
    * is never re-paired, so the expensive work (text processing, pair
    * join fan-out) tracks the batch; the remaining corpus-proportional
    * component is one linear postings scan per batch for the DF-cap
    * gate and exact set sizes — removable by maintaining df/size tables
    * incrementally, kept here for score-exactness with the one-shot
    * computation. Every near-dup pair is emitted exactly once, in the
    * batch where its SECOND document arrives, so the union of all
    * emitted pairs equals the batch-free
    * [[graft.operators.Dedup.jaccardPairs]] over the full corpus
    * (StreamingSpec asserts this golden). A shingle whose document
    * frequency crosses [[graft.operators.Dedup.ShingleDfCap]] between
    * batches can shift later scores vs a one-shot run — at-scale caveat
    * shared by every incremental stop-gram filter, impossible at test
    * SF where the cap is never reached. Emit-then-append is
    * at-least-once under retries (same contract as the Kafka source);
    * the downstream pair consumer dedups on (a_id, b_id) if it needs
    * exactly-once. */
  def nearDupIncrementalBatch(batch: DataFrame, indexDir: String): DataFrame = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // shingle ONLY the batch; the corpus contributes its stored postings
    val newPost = Dedup.shingleRows(batch)
    val allPost =
      if (fs.exists(path)) spark.read.parquet(indexDir).unionByName(newPost)
      else newPost
    val sh = Dedup.capPostings(allPost)
    val newIds = batch.select(col("doc_id"))
    val shNew = sh.join(broadcast(newIds), Seq("doc_id"))
    val shOld = sh.join(broadcast(newIds), Seq("doc_id"), "left_anti")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val on = shOld.as("a").join(shNew.as("b"),
        col("a.shingle") === col("b.shingle"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"))
    val nn = shNew.as("a").join(shNew.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    val pairs = on.union(nn)
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n", "nb"), "b_id")
      .withColumn("sim", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
      .filter(col("sim") >= Dedup.JaccardThreshold)
      .select("a_id", "b_id", "sim")
      // materialize BEFORE the index append so the pair set reflects
      // the pre-append corpus even under lazy re-evaluation
      .localCheckpoint(true)
    newPost.write.mode("append").parquet(indexDir)
    pairs
  }

  /** ST1+ST2+ST3: an idempotent upsert sink for foreachBatch. Maintains
    * keyed state (here an in-memory map; in production the same merge
    * runs as a MERGE INTO / ReplacingMergeTree insert) by replaying each
    * micro-batch through the *batch* CDC materialization logic — the
    * exactly-once-on-sink upgrade of the reference's at-least-once
    * consumer (reference: main.py:27-55). */
  final class UpsertMemorySink(keyCol: String, versionCols: Seq[String],
      tombstoneCol: String) {
    private val state = TrieMap.empty[Any, (Seq[Any], Row)]

    /** merge one micro-batch; within-batch dedup via Cdc.latestByKey,
      * cross-batch via version comparison (idempotent under replay). */
    def merge(batch: DataFrame): Unit = {
      val compacted = Cdc.latestByKey(batch, Seq(keyCol), versionCols.map(col))
      compacted.collect().foreach { row =>
        val k = row.getAs[Any](keyCol)
        val v = versionCols.map(row.getAs[Any])
        val newer = state.get(k).forall { case (oldV, _) => gt(v, oldV) }
        if (newer) {
          if (row.getAs[Boolean](tombstoneCol)) state.remove(k)
          else state.put(k, (v, row))
        }
      }
    }

    /** strict "newer than" on the first differing version component.
      * Unsupported component types throw instead of silently ordering —
      * defaulting to true would let a STALE row overwrite fresh state on
      * out-of-order redelivery. */
    private def gt(a: Seq[Any], b: Seq[Any]): Boolean =
      a.zip(b).find { case (x, y) => x != y } match {
        case None => true // equal versions: replay of the same record
        case Some((x: Long, y: Long)) => x > y
        case Some((x: Int, y: Int)) => x > y
        case Some((x: java.sql.Timestamp, y: java.sql.Timestamp)) => x.after(y)
        case Some((x: java.time.Instant, y: java.time.Instant)) => x.isAfter(y)
        case Some((x: Double, y: Double)) => x > y
        case Some((x: String, y: String)) => x > y
        case Some((x, y)) => throw new IllegalArgumentException(
          s"unsupported version column type for upsert ordering: " +
            s"${x.getClass.getName} vs ${y.getClass.getName}")
      }

    def snapshot: Map[Any, Row] = state.map { case (k, (_, r)) => k -> r }.toMap
  }
}
