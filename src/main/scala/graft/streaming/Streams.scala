package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.expressions.Window
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

  /** Keyed session buffer: ALL of a user's not-yet-emitted sessions
    * (any of which a future admissible event may still extend or
    * bridge), not just the newest open tail. */
  final case class SessionBuf(sessions: Seq[SessionAcc])

  /** Merge previously-buffered sessions and a batch of event times into
    * maximal gap-separated intervals: sort by start, fold, and join any
    * neighbor whose start is within gapMs of the running end. An event
    * that lands BETWEEN two buffered sessions and within gap of both
    * bridges them into one (counts add) — the out-of-order case a
    * single-open-tail fold gets wrong. Shared by both sessionizer
    * implementations so their semantics cannot drift. */
  private[graft] def mergeIntervals(prev: Seq[SessionAcc], times: Seq[Long],
      gapMs: Long): List[SessionAcc] = {
    val all = (prev ++ times.map(t => SessionAcc(t, t, 1L)))
      .sortBy(s => (s.startMs, s.lastMs))
    var out = List.empty[SessionAcc]
    for (s <- all) out match {
      case h :: t if s.startMs <= h.lastMs + gapMs =>
        out = SessionAcc(h.startMs, math.max(h.lastMs, s.lastMs), h.n + s.n) :: t
      case _ => out = s :: out
    }
    out.reverse
  }

  /** Sessions safe to emit at watermark `wm`: close (last + gap) is
    * STRICTLY before the watermark — an admissible event t ≥ wm then
    * satisfies t − last > gap, so nothing can extend or bridge them.
    * A session with close == wm must wait: an event at exactly t == wm
    * is admissible and within gap. Returns (emit, keep). */
  private[graft] def splitByWatermark(ss: Seq[SessionAcc], wm: Long,
      gapMs: Long): (Seq[SessionAcc], Seq[SessionAcc]) =
    ss.partition(s => s.lastMs + gapMs < wm)

  private def toClosed(uid: Long, s: SessionAcc, gapMs: Long): ClosedSession =
    ClosedSession(uid, new java.sql.Timestamp(s.startMs),
      new java.sql.Timestamp(s.lastMs + gapMs), s.n)

  /** ST6 deep form: sessionization via flatMapGroupsWithState with
    * EVENT-TIME timeout — the arbitrary-state generalization of
    * session_window (use this shape when the per-session logic can't be
    * an aggregate: emit-on-close, per-session enrichment, custom merge).
    *
    * A session is emitted ONLY once the watermark strictly passes its
    * close (last event + gap): until then an admissible out-of-order
    * event in a later micro-batch could still extend it — or bridge two
    * buffered sessions into one ([[mergeIntervals]]) — so emitting at
    * the first intra-batch gap would make output depend on batch
    * alignment. State therefore holds every not-yet-safe session, and
    * one event-time timer (the earliest pending close) re-checks after
    * each watermark advance; emitted sessions leave state, so store
    * size tracks pending sessions only. */
  def sessionizeWithTimeout(events: Dataset[UserEvent2], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[ClosedSession] =
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionBuf, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[UserEvent2], state: GroupState[SessionBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val merged =
            if (state.hasTimedOut) state.getOption.map(_.sessions).getOrElse(Nil)
            else mergeIntervals(state.getOption.map(_.sessions).getOrElse(Nil),
              batch.map(_.ts.getTime).toSeq, gapMs)
          val (done, keep) = splitByWatermark(merged, wm, gapMs)
          if (keep.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(SessionBuf(keep))
            // earliest pending close; clamp above the watermark (a keep
            // close may equal wm, which setTimeoutTimestamp rejects)
            state.setTimeoutTimestamp(
              math.max(keep.map(_.lastMs).min + gapMs, wm + 1))
          }
          done.sortBy(_.startMs).iterator.map(toClosed(uid, _, gapMs))
      }(Encoders.product[SessionBuf], Encoders.product[ClosedSession])

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
    @transient private var buf: ValueState[SessionBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[SessionBuf](
        "sessions", Encoders.product[SessionBuf], TTLConfig.NONE)

    private def prev: Seq[SessionAcc] =
      if (buf.exists()) buf.get().sessions else Nil

    /** emit watermark-safe sessions, keep the rest, re-arm one timer at
      * the earliest pending close (shared by both callbacks — the same
      * watermark-gated rule as [[sessionizeWithTimeout]]) */
    private def flush(uid: Long, merged: Seq[SessionAcc],
        wm: Long): Iterator[ClosedSession] = {
      val (done, keep) = splitByWatermark(merged, wm, gapMs)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (keep.isEmpty) buf.clear()
      else {
        buf.update(SessionBuf(keep))
        getHandle.registerTimer(
          math.max(keep.map(_.lastMs).min + gapMs, wm + 1))
      }
      done.sortBy(_.startMs).iterator.map(toClosed(uid, _, gapMs))
    }

    override def handleInputRows(uid: Long, rows: Iterator[UserEvent2],
        tv: TimerValues): Iterator[ClosedSession] =
      flush(uid,
        mergeIntervals(prev, rows.map(_.ts.getTime).toSeq, gapMs),
        tv.getCurrentWatermarkInMs())

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] =
      flush(uid, prev, tv.getCurrentWatermarkInMs())
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
    * [[graft.operators.Dedup.incremental]]. The index at `indexDir`
    * holds three batchId-partitioned tables:
    *
    *   - `postings/batch_id=N` — (doc_id, shingle) for batch N's docs;
    *   - `df/batch_id=N` — batch N's per-shingle posting counts;
    *   - `sizes/batch_id=N` — batch N's per-doc capped set sizes.
    *
    * Each micro-batch is shingled once and paired as old⋈new + new⋈new
    * joins: old docs are never re-shingled, old⋈old is never re-paired.
    * The DF-cap gate and set sizes now come from the df/sizes DELTA
    * tables (vocabulary- and doc-proportional aggregates), NOT from a
    * linear re-scan of the postings index — the r04 finding. Only the
    * pairing join itself reads stored postings, which is the index's
    * job. Capping only the new side of the join is exact: a shared
    * shingle contributes to the intersection iff it survives the cap on
    * the arriving side. A doc's set size is fixed at arrival (capped
    * against df-as-of-arrival); a shingle crossing
    * [[graft.operators.Dedup.ShingleDfCap]] between batches can shift
    * later scores vs a one-shot run — the incremental stop-gram caveat,
    * impossible at test SF where the cap is never reached.
    *
    * IDEMPOTENT under foreachBatch retries: every read filters to
    * batch_id < this batch (a retry's own leftover partitions are
    * invisible) and every write OVERWRITES this batch's partition, so
    * re-running a batch rewrites the same files instead of
    * double-counting document frequencies and set sizes. Every pair is
    * emitted exactly once, in the batch where its SECOND document
    * arrives; the union of all emissions equals the batch-free
    * [[graft.operators.Dedup.jaccardPairs]] over the full corpus
    * (StreamingSpec asserts this golden, plus retry-idempotence). */
  def nearDupIncrementalBatch(batch: DataFrame, indexDir: String,
      batchId: Long): DataFrame = {
    val (pairsPlan, newPost, batchDf, newSizes, newSigs) =
      nearDupBatchRelations(batch, indexDir, batchId)
    // materialize BEFORE the index writes so the pair set reflects
    // the pre-append corpus even under lazy re-evaluation
    val pairs = pairsPlan.localCheckpoint(true)
    newPost.write.mode("overwrite")
      .parquet(s"$indexDir/postings/batch_id=$batchId")
    batchDf.write.mode("overwrite")
      .parquet(s"$indexDir/df/batch_id=$batchId")
    newSizes.write.mode("overwrite")
      .parquet(s"$indexDir/sizes/batch_id=$batchId")
    newSigs.write.mode("overwrite")
      .parquet(s"$indexDir/sets/batch_id=$batchId")
    pairs
  }

  /** the per-batch relations, pre-materialization — split out so specs
    * can assert the PAIR PLAN's scale shape (one postings scan, one
    * signature-table scan, no corpus-wide cap window) before
    * localCheckpoint makes it opaque.
    *
    * Scale shape (r05): candidate generation joins the postings index
    * against the BATCH'S PREFIX postings only — each arriving doc's
    * n − ⌈n/3⌉ + 1 rarest shingles under the CURRENT global DF order
    * (the df delta table the index already maintains). Restricting only
    * the batch side is complete: the stored side carries every shingle,
    * so the pair's smallest-ranked common shingle always matches, and
    * ⌈n/3⌉ (not ⌈n/2⌉) is the bound that stays valid even where the
    * incremental DF cap bites (sim ≥ t ⟹ inter ≥ t·n_new/(1+t)
    * regardless of the stored side's capped size). Intersections are
    * then counted on per-doc SORTED HASH SIGNATURES from the new
    * `sets/` index table (old docs) and the capped batch (new docs) via
    * the codegen'd merge — candidate-bounded work, instead of counting
    * matches across the full old⋈new postings join, whose output grows
    * with corpus × batch vocabulary overlap. */
  private[graft] def nearDupBatchRelations(batch: DataFrame,
      indexDir: String, batchId: Long)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    def readPrior(name: String, cols: String*): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$name")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        Some(spark.read.parquet(p.toString)
          .filter(col("batch_id") < batchId) // retries see only priors
          .select(cols.map(col): _*))
      else None
    }
    // shingle ONLY the batch (batch-sized; reused by df/cap/sizes/joins)
    // shingleRows' contract requires one row per doc_id; an
    // at-least-once source can redeliver a doc WITHIN a batch, which
    // would otherwise inflate df/set sizes (cross-batch redelivery is
    // handled by the batchId-keyed idempotent writes below)
    val newPost = Dedup.shingleRows(oneRowPerKey(batch, "doc_id"))
      .localCheckpoint(true)
    val batchDf = newPost.groupBy("shingle").agg(count(lit(1)).as("cnt"))
    // current document frequency = prior per-batch deltas + this batch:
    // a sum over per-batch AGGREGATES, never a postings re-scan
    val dfAll = readPrior("df", "shingle", "cnt")
      .map(_.unionByName(batchDf)).getOrElse(batchDf)
    val dfNow = dfAll.groupBy("shingle").agg(sum("cnt").as("df"))
    val overCap = dfNow.filter(col("df") > Dedup.ShingleDfCap)
      .select("shingle")
    val cappedNew = newPost.join(overCap, Seq("shingle"), "left_anti")
    val newSizes = cappedNew.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val sizes = readPrior("sizes", "doc_id", "n")
      .map(_.unionByName(newSizes)).getOrElse(newSizes)
    // per-doc sorted hash signature of the FULL (uncapped) arrival set —
    // what the index stores; intersections against it reproduce the
    // previous match-count semantics (old side uncapped, new side
    // capped) exactly
    val newSigs = newPost.groupBy("doc_id")
      .agg(sort_array(collect_set(xxhash64(col("shingle")))).as("sig"))
    // batch-side prefix under the current global order (batch-sized
    // windows — keyed by doc_id, never corpus-wide)
    val wDoc = Window.partitionBy("doc_id")
    val rankedNew = cappedNew.join(dfNow, "shingle")
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("rn", row_number().over(
        wDoc.orderBy(col("df"), col("shingle"))))
    val prefixNew = rankedNew
      .filter(col("rn") <= col("n") - floor((col("n") + lit(2)) / lit(3)) + 1)
      .select("doc_id", "shingle")
    val oldPost = readPrior("postings", "doc_id", "shingle")
    val onCand = oldPost match {
      case Some(op) => op.as("a").join(prefixNew.as("b"),
          col("a.shingle") === col("b.shingle"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"))
      case None => newPost.limit(0)
        .select(col("doc_id").as("a_id"), col("doc_id").as("b_id"))
    }
    val nnCand = prefixNew.as("a").join(prefixNew.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    val cand = onCand.union(nnCand).distinct()
    // signature lookup: old docs resolve to their stored (uncapped)
    // arrival signature, new docs to the capped batch signature
    val cappedSigs = cappedNew.groupBy("doc_id")
      .agg(sort_array(collect_set(xxhash64(col("shingle")))).as("sig"))
    val lookup = readPrior("sets", "doc_id", "sig")
      .map(_.unionByName(cappedSigs)).getOrElse(cappedSigs)
    val pairs = cand
      .join(lookup.select(col("doc_id").as("a_id"), col("sig").as("sa")), "a_id")
      .join(lookup.select(col("doc_id").as("b_id"), col("sig").as("sb")), "b_id")
      .withColumn("inter",
        graft.functions.SortedIntersectCount(col("sa"), col("sb")))
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n", "nb"), "b_id")
      .withColumn("sim", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
      .filter(col("sim") >= Dedup.JaccardThreshold)
      .select("a_id", "b_id", "sim")
    (pairs, newPost, batchDf, newSizes, newSigs)
  }

  /** DETERMINISTIC within-batch redelivery collapse: one row per key,
    * the survivor being the lexicographic max over the non-key columns
    * (one hash agg). `dropDuplicates` keeps an ARBITRARY row — if a
    * "redelivery" ever carried an updated payload, which payload
    * entered downstream state would then differ across runs and
    * foreachBatch retries. Shared by the near-dup index and the
    * curation pipeline so their pick rules cannot drift. */
  private def oneRowPerKey(batch: DataFrame, key: String): DataFrame = {
    val payloadCols = batch.columns.filterNot(_ == key).toSeq
    batch.groupBy(key)
      .agg(max(struct(payloadCols.map(col): _*)).as("_r"))
      .select(col(key) +: payloadCols.map(c => col(s"_r.$c").as(c)): _*)
  }

  /** Streaming END-TO-END curation: the foreachBatch form of
    * [[graft.operators.TextAnalysis3.keepList]]. Each micro-batch lands
    * its arriving docs' keep/drop decisions AND re-emits previously
    * decided docs whose decision a later arrival invalidates, so the
    * upsert materialization of all emissions (latest batch per doc
    * wins) equals the one-shot keep list over the docs seen so far — in
    * ANY arrival order (StreamingSpec asserts sorted and shuffled).
    *
    * Decision flags are MONOTONE (false→true only), which is what makes
    * revision = OR-merge + recomputed precedence sound:
    *   - holdout / quality: static per-doc rules, final at arrival;
    *   - exact_dup: a later, smaller-id doc of the same normalized text
    *     flips the stored keeper;
    *   - near_dup: [[nearDupIncrementalBatch]] emits each qualifying
    *     pair when its second member arrives; the pair's max id flips;
    *   - contaminated: an arriving holdout doc flips every stored
    *     training doc sharing one of its 5-shingles.
    *
    * State at `stateDir` (all batchId-partitioned; reads filter
    * batch_id < current, writes overwrite their own partition →
    * idempotent under foreachBatch retries, the near-dup index scheme):
    *   - `nd/`        — the [[nearDupIncrementalBatch]] index;
    *   - `norms/`     — per-batch (norm, min_id) keeper deltas;
    *   - `ho5/`       — per-batch distinct holdout 5-shingles;
    *   - `tr5/`       — per-batch training-doc 5-shingle postings;
    *   - `decisions/` — per-batch emitted flag rows.
    *
    * The 100 TB shape: exact-dedup state is grouped/joined by norm
    * (hash agg + hash join, never collected); contamination is the
    * decontaminate inverted-index join (holdout side is orders of
    * magnitude smaller); flip re-emission semi-joins the decisions
    * table on the flipped-doc set only. Assumes cross-batch
    * exactly-once per doc_id upstream (ST5 stream dedup); within-batch
    * redelivery is collapsed deterministically like the near-dup
    * index. */
  def curationIncrementalBatch(batch: DataFrame, stateDir: String,
      batchId: Long): DataFrame = {
    import graft.operators.{Dedup, TextAnalysis3}
    val spark = batch.sparkSession
    def readPrior(name: String, cols: String*): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/$name")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        Some(spark.read.parquet(p.toString)
          .filter(col("batch_id") < batchId) // retries see only priors
          .select(cols.map(col): _*))
      else None
    }
    // near-dup pairs first (maintains its own nd/ index tables)
    val pairs = nearDupIncrementalBatch(batch, s"$stateDir/nd", batchId)
    val ndDocs = pairs.select(col("b_id").as("doc_id")).distinct()
      .withColumn("nd_hit", lit(true))
    // deterministic one-row-per-doc, same rule as the near-dup index
    val docs = oneRowPerKey(batch, "doc_id").localCheckpoint(true)
    // --- exact-dedup keeper deltas ---
    val batchNorms = docs.select(col("doc_id"),
      lower(trim(col("text"))).as("norm"))
    val batchMin = batchNorms.groupBy("norm").agg(min("doc_id").as("min_id"))
    val oldMin = readPrior("norms", "norm", "min_id")
      .map(_.groupBy("norm").agg(min("min_id").as("old_min")))
    val curMin = oldMin match {
      case Some(om) => batchMin
        .unionByName(om.select(col("norm"), col("old_min").as("min_id")))
        .groupBy("norm").agg(min("min_id").as("cur_min"))
      case None => batchMin.select(col("norm"), col("min_id").as("cur_min"))
    }
    val arrivingExd = batchNorms.join(curMin, "norm")
      .filter(col("doc_id") > col("cur_min"))
      .select("doc_id").withColumn("ex_hit", lit(true))
    // the stored keeper flips iff this batch brought a smaller id
    val flippedExd = oldMin match {
      case Some(om) => om.join(batchMin, "norm")
        .filter(col("min_id") < col("old_min"))
        .select(col("old_min").as("doc_id"))
      case None => docs.select("doc_id").limit(0)
    }
    // --- contamination (5-shingle overlap with the holdout split) ---
    val sh5 = docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 5)).as("s"))
      .distinct()
    val batchHo5 = sh5.filter(TextAnalysis3.isHoldout(col("doc_id")))
      .select("s").distinct()
    val batchTr5 = sh5.filter(!TextAnalysis3.isHoldout(col("doc_id")))
    val allHo5 = readPrior("ho5", "s")
      .map(_.unionByName(batchHo5).distinct()).getOrElse(batchHo5)
    val arrivingCont = batchTr5.join(allHo5, "s")
      .select("doc_id").distinct().withColumn("ct_hit", lit(true))
    val flippedCont = readPrior("tr5", "doc_id", "s") match {
      case Some(tr) => tr.join(batchHo5, "s").select("doc_id").distinct()
      case None => docs.select("doc_id").limit(0)
    }
    // --- arriving decisions: full flag row per batch doc ---
    val arriving = docs.select(col("doc_id"),
        TextAnalysis3.isHoldout(col("doc_id")).as("holdout"),
        TextAnalysis3.qualityBad(col("text")).as("quality_bad"))
      .join(arrivingExd, Seq("doc_id"), "left")
      .join(ndDocs, Seq("doc_id"), "left")
      .join(arrivingCont, Seq("doc_id"), "left")
      .select(col("doc_id"), col("holdout"), col("quality_bad"),
        coalesce(col("ex_hit"), lit(false)).as("exact_dup"),
        coalesce(col("nd_hit"), lit(false)).as("near_dup"),
        coalesce(col("ct_hit"), lit(false)).as("contaminated"))
    // --- flips: previously-decided docs gaining a flag this batch ---
    val flipSet = flippedExd
      .select(col("doc_id"), lit(true).as("f_ex"), lit(false).as("f_nd"),
        lit(false).as("f_ct"))
      .unionByName(ndDocs.select(col("doc_id"), lit(false).as("f_ex"),
        lit(true).as("f_nd"), lit(false).as("f_ct")))
      .unionByName(flippedCont.select(col("doc_id"), lit(false).as("f_ex"),
        lit(false).as("f_nd"), lit(true).as("f_ct")))
      .groupBy("doc_id")
      .agg(max("f_ex").as("f_ex"), max("f_nd").as("f_nd"),
        max("f_ct").as("f_ct"))
      .join(docs.select("doc_id"), Seq("doc_id"), "left_anti")
    val flipped = readPrior("decisions", "doc_id", "holdout", "quality_bad",
        "exact_dup", "near_dup", "contaminated") match {
      case Some(dec) =>
        // flags are monotone, so OR across emissions == latest row
        dec.groupBy("doc_id").agg(max("holdout").as("holdout"),
            max("quality_bad").as("quality_bad"),
            max("exact_dup").as("exact_dup"),
            max("near_dup").as("near_dup"),
            max("contaminated").as("contaminated"))
          .join(flipSet, "doc_id")
          .select(col("doc_id"), col("holdout"), col("quality_bad"),
            (col("exact_dup") || col("f_ex")).as("exact_dup"),
            (col("near_dup") || col("f_nd")).as("near_dup"),
            (col("contaminated") || col("f_ct")).as("contaminated"))
      case None => arriving.limit(0)
    }
    val emitted = arriving.unionByName(flipped)
      .withColumn("reason", TextAnalysis3.curationReason)
      .withColumn("kept", col("reason") === "kept")
      .localCheckpoint(true) // materialize BEFORE the state writes
    batchMin.write.mode("overwrite")
      .parquet(s"$stateDir/norms/batch_id=$batchId")
    batchHo5.write.mode("overwrite")
      .parquet(s"$stateDir/ho5/batch_id=$batchId")
    batchTr5.write.mode("overwrite")
      .parquet(s"$stateDir/tr5/batch_id=$batchId")
    emitted.drop("reason", "kept").write.mode("overwrite")
      .parquet(s"$stateDir/decisions/batch_id=$batchId")
    emitted.select("doc_id", "reason", "kept")
  }

  /** ST6 incremental twin of
    * [[graft.operators.Curation.recurationDelta]] — the streaming face
    * of the CDC × curation composition: each micro-batch of document
    * edits (doc_id, text, version) emits the keys whose curation
    * verdict CHANGED relative to the pre-batch state, exactly the rows
    * an epoch planner consumes to patch its keep list between full
    * rebuilds.
    *
    * Semantics per batch:
    *   1. within-batch compaction — deterministic survivor
    *      max(version, text) per key (the [[oneRowPerKey]] rule
    *      extended with the version);
    *   2. the NEW latest per touched key folds the compacted batch
    *      against stored state, so a STALE redelivery (version ≤
    *      stored) can never regress a verdict — the same
    *      version-gating contract as [[graft.sources.JdbcUpsertSink]];
    *   3. the OLD verdict comes from the stored latest text if any
    *      prior batch touched the key, else from the epoch flag row
    *      (its quality_bad IS the epoch text's gate — no epoch text
    *      re-read);
    *   4. per-row gates (holdout, quality) recompute; the relational
    *      gates ride FROZEN from `epochFlags` (the
    *      [[graft.operators.TextAnalysis3.curationFlags]] snapshot) —
    *      the rebuild-on-epoch adjudication the batch query documents.
    *
    * Emissions are deltas vs the pre-batch state, so a doc edited and
    * then REVERTED emits twice (old→new, new→old) while the one-shot
    * query over the final changelog sees nothing — the latest emission
    * per key always equals the one-shot verdict over the same total
    * edit set (RecurationStreamSpec proves both: golden ≡ one-shot on
    * the registered query's own edit stream split across batches with
    * cross-batch redelivery, and the revert case folding back to the
    * epoch verdict).
    *
    * Scope: EDITS to epoch documents (the inner epoch-flags join).
    * Brand-new documents have no prior verdict to delta against —
    * arrivals are [[curationIncrementalBatch]]'s contract, which emits
    * their first full flag row.
    *
    * State at `stateDir/docs` is batchId-partitioned; reads filter
    * batch_id < current and writes overwrite only their own partition
    * → idempotent under foreachBatch retries (the house index scheme).
    * 100 TB shape: one hash agg + two key joins per batch, all
    * O(|batch| + touched keys); the epoch flags join prunes to batch
    * keys; nothing rescans the corpus. */
  def recurationDeltaBatch(batch: DataFrame, stateDir: String,
      batchId: Long, epochFlags: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis3
    val spark = batch.sparkSession
    def latest(df: DataFrame): DataFrame = df
      .groupBy("doc_id")
      .agg(max(struct(col("version"), col("text"))).as("_r"))
      .select(col("doc_id"), col("_r.version").as("version"),
        col("_r.text").as("text"))
    val compacted = latest(batch.select("doc_id", "version", "text"))
      .localCheckpoint(true)
    val priorLatest = {
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/docs")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        latest(spark.read.parquet(p.toString)
          .filter(col("batch_id") < batchId)
          .select("doc_id", "version", "text"))
      else compacted.limit(0)
    }
    val newLatest = latest(compacted.unionByName(priorLatest))
      .join(compacted.select("doc_id"), "doc_id") // touched keys only
    def verdict(qualityBad: Column): Column =
      when(col("holdout"), "holdout")
        .when(qualityBad, "quality")
        .when(col("exact_dup"), "exact_dup")
        .when(col("near_dup"), "near_dup")
        .when(col("contaminated"), "contaminated")
        .otherwise("kept")
    val emitted = newLatest.select(col("doc_id"), col("text").as("new_text"))
      .join(priorLatest.select(col("doc_id"), col("text").as("old_text"))
        .withColumn("has_prior", lit(true)), Seq("doc_id"), "left")
      .join(epochFlags, "doc_id")
      .select(col("doc_id"),
        verdict(when(coalesce(col("has_prior"), lit(false)),
            TextAnalysis3.qualityBad(col("old_text")))
          .otherwise(col("quality_bad"))).as("old_reason"),
        verdict(TextAnalysis3.qualityBad(col("new_text"))).as("new_reason"))
      .filter(col("old_reason") =!= col("new_reason"))
      .localCheckpoint(true) // materialize BEFORE the state write
    compacted.write.mode("overwrite")
      .parquet(s"$stateDir/docs/batch_id=$batchId")
    emitted
  }

  /** Incremental corpus-drift monitor — the streaming face of
    * `text_kl_drift`: each micro-batch folds its (source, word) counts
    * into a batchId-partitioned count table and re-emits the per-source
    * KL divergence over the CUMULATIVE corpus so far. After batch N the
    * output is definitionally the one-shot `text_kl_drift` answer over
    * the union of batches 1..N (same [[graft.operators.TextAnalysis6.klFromCounts]] plan on
    * the summed counts — the spec proves it in sorted AND shuffled
    * arrival order).
    *
    * State: `counts/batch_id=N` holds batch N's (source, w, c) rows;
    * a retry overwrites ONLY its own partition and reads priors
    * (batch_id < current) plus its own recomputed counts → idempotent
    * under foreachBatch's at-least-once contract.
    *
    * 100 TB shape: the per-batch count agg is batch-sized and
    * map-combined; the cumulative re-aggregation is vocabulary-bounded
    * (counts, not tokens — rereading N batch partitions of
    * per-batch-vocab rows, not N batches of raw text); everything
    * after is sources × 256 exactly like the batch query. A long-lived
    * deployment compacts `counts/` periodically the same way the
    * near-dup index compacts its postings. */
  /** ST6 incremental twin of the LSH ANN tier
    * ([[graft.operators.Similarity.annTopk]]): the banded signature
    * index maintained across embedding micro-batches. The signature is
    * row-local (one codegen'd sign-matrix pass — no corpus state), so
    * the index IS incrementally maintainable: each batch appends its
    * (vec_id, band, bsig, embedding, nrm) postings to its own
    * partition; a query run against the accumulated index is exactly
    * the one-shot [[graft.operators.Similarity.annLsh]] over the union
    * of all arrived vectors (StreamingSpec golden, any arrival order —
    * signatures don't depend on arrival). Retries overwrite only their
    * own partition → idempotent.
    *
    * 100 TB shape: per batch, one map-side signature pass + append;
    * the query-side bucket join and WindowGroupLimit re-rank read the
    * at-rest postings — the same plan as the batch tier, with the
    * index build amortized across arrivals instead of recomputed. */
  def annIncrementalBatch(batch: DataFrame, stateDir: String,
      batchId: Long, numQueries: Int, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{dot, norm}
    import graft.operators.Similarity
    val spark = batch.sparkSession
    val postings = batch.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"),
        Similarity.lshSignature(col("embedding"), bits = 32).as("sig"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(array((0 until 8).map(b =>
          shiftrightunsigned(col("sig"), 4 * b).bitwiseAND(lit(0xFL))): _*))
          .as(Seq("band", "bsig")))
    postings.write.mode("overwrite")
      .parquet(s"$stateDir/postings/batch_id=$batchId")
    val banded = spark.read.parquet(s"$stateDir/postings")
      .filter(col("batch_id") <= batchId)
      .select("vec_id", "embedding", "nrm", "band", "bsig")
    val queries = banded.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("band"), col("bsig"))
    val cand = banded
      .join(queries, Seq("band", "bsig"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("vec_id").as("n_id"), col("embedding").as("c_emb"), col("nrm"))
      .distinct()
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    cand
      .withColumn("sim",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("nrm")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
      .orderBy("q_id", "rank")
  }

  /** ST6 incremental twin of the MEDIA signature near-dup family
    * ([[graft.operators.Multimodal2]]'s image aHash / audio fingerprint
    * / frame-sequence tiers, r14 VERDICT task 2): the banded 64-bit
    * signature index maintained across micro-batches, ONE maintainer
    * for every modality because each tier reduces to the same relation
    * — (doc_id, block, hash) where `block` is the modality's blocking
    * key (image geometry, audio duration class, frame count) and
    * `hash` the codegen'd 64-bit signature.
    *
    * Contract: signatures are row-local and immutable per doc (derived
    * from the media bytes — an append-only media corpus), so the index
    * is incrementally maintainable without re-signing old docs. Per
    * batch the emitted rows are PAIR DELTAS (a_id, b_id, block,
    * hamming, op∈{add,remove}) whose running fold (adds minus removes)
    * after batch N equals the one-shot banded pair set
    * ([[graft.operators.Multimodal2]]'s bandedHammingPairs semantics:
    * 4×16-bit bands, bucket join under the cap, exact Hamming verify)
    * over all docs arrived through batch N — MediaDedupStreamSpec
    * asserts the golden across batches, under cross-batch redelivery,
    * AND across a cap crossing.
    *
    * The delta algebra is exact because candidacy is MONOTONE: bucket
    * populations only grow, so a pair can gain candidacy only when one
    * endpoint arrives (adds join new docs against the accumulated
    * capped postings at current counts) and lose it only when its last
    * supporting bucket crosses the cap (removes re-check exactly the
    * stored pairs whose endpoints share a JUST-crossed bucket — never
    * re-added, never re-scanned). Re-checked work per batch is bounded
    * by |batch| + Σ(members of buckets crossing this batch) ≤ cap per
    * bucket — never the corpus.
    *
    * State at `stateDir` is batchId-partitioned (`sigs/batch_id=N`,
    * `cnts/batch_id=N`, `deltas/batch_id=N`); reads filter batch_id <
    * current, writes overwrite only their own partition → idempotent
    * under foreachBatch retries (the house index scheme). 100 TB
    * shape: per batch one band explode + three key equi-joins, all
    * bounded by batch and crossed-bucket sizes; bucket counts fold
    * from the batchId-partitioned COUNT-DELTA table (the
    * [[nearDupIncrementalBatch]] df-table pattern — vocabulary-
    * bounded, never a posting re-aggregation); only the pairing join
    * itself reads the stored postings, which is the index's job; the
    * signature pass happened upstream where the media bytes were read
    * once. */
  def mediaDedupIncrementalBatch(batch: DataFrame, stateDir: String,
      batchId: Long, threshold: Int = 3,
      cap: Long = graft.operators.Dedup.BandBucketCap): DataFrame = {
    val spark = batch.sparkSession
    def readPrior(name: String, cols: String*): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/$name")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        Some(spark.read.parquet(p.toString)
          .filter(col("batch_id") < batchId).select(cols.map(col): _*))
      else None
    }
    val priorSigs = readPrior("sigs", "doc_id", "block", "hash")
    // within-batch redelivery: signatures are immutable per doc, so
    // distinct IS the compaction; cross-batch redelivery: already-known
    // docs are not "new" (their pairs were emitted on first arrival)
    val batchSigs = batch.select("doc_id", "block", "hash").distinct()
    val newSigs = (priorSigs match {
      case Some(p) => batchSigs.join(p.select("doc_id"), Seq("doc_id"),
        "left_anti")
      case None => batchSigs
    }).localCheckpoint(true)
    val allSigs = (priorSigs match {
      case Some(p) => p.unionByName(newSigs)
      case None => newSigs
    }).localCheckpoint(true)
    def bandsOf(sigs: DataFrame): DataFrame = sigs.select(
      col("doc_id"), col("block"),
      posexplode(array((0 until 4).map(k =>
        (shiftright(col("hash"), 16 * k) bitwiseAND 0xFFFFL)): _*))
        .as(Seq("band", "sig")))
    val key = Seq("block", "band", "sig")
    val allBands = bandsOf(allSigs)
    // bucket counts from the count-DELTA table: this batch's per-bucket
    // counts are one batch-sized agg; cumulative counts fold stored
    // per-batch counts (vocabulary-bounded rows, never postings)
    val batchCnts = bandsOf(newSigs).groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val priorCnts = readPrior("cnts", "block", "band", "sig", "c")
    val cnts = (priorCnts match {
      case Some(p) => p.unionByName(batchCnts)
      case None => batchCnts
    }).groupBy(key.map(col): _*).agg(sum("c").as("n_now"))
    val capped = cnts.filter(col("n_now") <= cap).select(key.map(col): _*)
    // --- adds: new docs × accumulated postings, capped buckets only ---
    val newBands = bandsOf(newSigs)
    val candRaw = newBands.join(capped, key)
      .join(allBands.select(col("doc_id").as("o_id"), col("block"),
        col("band"), col("sig")), key)
      .filter(col("doc_id") =!= col("o_id"))
      .select(least(col("doc_id"), col("o_id")).as("a_id"),
        greatest(col("doc_id"), col("o_id")).as("b_id"), col("block"))
      .distinct()
    val hashes = allSigs.select(col("doc_id"), col("hash"))
    val adds = candRaw
      .join(hashes.select(col("doc_id").as("a_id"), col("hash").as("ha")), "a_id")
      .join(hashes.select(col("doc_id").as("b_id"), col("hash").as("hb")), "b_id")
      .select(col("a_id"), col("b_id"), col("block"),
        bit_count(col("ha") bitwiseXOR col("hb")).cast("bigint").as("hamming"))
      .filter(col("hamming") <= threshold)
      .withColumn("op", lit("add"))
    // --- removes: stored pairs whose last support crossed the cap ---
    val removes = readPrior("deltas", "a_id", "b_id", "block", "hamming", "op")
      .map { deltas =>
        val statePairs = deltas.filter(col("op") === "add")
          .select("a_id", "b_id", "block", "hamming")
          .join(deltas.filter(col("op") === "remove")
            .select("a_id", "b_id"), Seq("a_id", "b_id"), "left_anti")
        val prevCnts = priorCnts.map(_.groupBy(key.map(col): _*)
            .agg(sum("c").as("n_prev")))
          .getOrElse(cnts.limit(0).withColumnRenamed("n_now", "n_prev"))
        val crossed = cnts.filter(col("n_now") > cap)
          .join(prevCnts.filter(col("n_prev") <= cap), key)
          .select(key.map(col): _*)
        val crossedMembers = allBands.join(crossed, key)
        val suspects = statePairs
          .join(crossedMembers.select(col("doc_id").as("a_id"),
            col("block"), col("band"), col("sig")), Seq("a_id", "block"))
          .join(crossedMembers.select(col("doc_id").as("b_id"),
            col("block"), col("band"), col("sig")),
            Seq("b_id", "block", "band", "sig"))
          .select("a_id", "b_id", "block", "hamming").distinct()
        val supported = suspects
          .join(allBands.select(col("doc_id").as("a_id"), col("block"),
            col("band"), col("sig")), Seq("a_id", "block"))
          .join(allBands.select(col("doc_id").as("b_id"), col("block"),
            col("band"), col("sig")), Seq("b_id", "block", "band", "sig"))
          .join(capped, key)
          .select("a_id", "b_id").distinct()
        suspects.join(supported, Seq("a_id", "b_id"), "left_anti")
          .withColumn("op", lit("remove"))
      }.getOrElse(adds.limit(0))
    val emitted = adds.unionByName(removes)
      .localCheckpoint(true) // materialize BEFORE the state writes
    newSigs.write.mode("overwrite")
      .parquet(s"$stateDir/sigs/batch_id=$batchId")
    batchCnts.write.mode("overwrite")
      .parquet(s"$stateDir/cnts/batch_id=$batchId")
    emitted.write.mode("overwrite")
      .parquet(s"$stateDir/deltas/batch_id=$batchId")
    emitted
  }

  /** ST6 incremental twin of
    * [[graft.operators.EventAnalytics4.q92DeltaSum]]: per-user deltaSum
    * maintained across micro-batches with bounded per-batch state — one
    * stored row per (user, batch): reading count, internal
    * positive-step sum, and the first/last ×10⁴ fixed-point readings in
    * (ts, event_id) order. Contract: batches arrive time-ordered per
    * user (the CDC-replay / monotone-source case — the same
    * sorted-arrival contract the curation twin documents for its
    * golden). The cumulative answer folds the stored aggregates per
    * user in batch_id order: Σ internal sums + Σ cross-boundary
    * positive steps (lag over ≤|batches| rows per user).
    *
    * Idempotence: a retry overwrites ONLY its own `agg/batch_id=`
    * partition and reads priors (batch_id < current) → re-running a
    * failed batch cannot double-count. 100 TB shape: the per-batch agg
    * is one window + hash agg on user_id (batch-sized); the fold reads
    * |users|·|batches| aggregate rows, never raw events. */
  def deltaSumIncrementalBatch(batch: DataFrame, stateDir: String,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val wB = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val agg = batch
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .withColumn("pv4", lag(col("v4"), 1).over(wB))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("bn"),
        sum(when(col("pv4").isNotNull && col("v4") > col("pv4"),
          col("v4") - col("pv4")).otherwise(0L)).as("bacc"),
        min_by(col("v4"), struct(col("t"), col("event_id"))).as("first_v4"),
        max_by(col("v4"), struct(col("t"), col("event_id"))).as("last_v4"))
    agg.write.mode("overwrite").parquet(s"$stateDir/agg/batch_id=$batchId")
    val aggPath = new org.apache.hadoop.fs.Path(s"$stateDir/agg")
    val all = spark.read.parquet(aggPath.toString)
      .filter(col("batch_id") < batchId)
      .select("user_id", "batch_id", "bn", "bacc", "first_v4", "last_v4")
      .unionByName(agg.withColumn("batch_id", lit(batchId))
        .select("user_id", "batch_id", "bn", "bacc", "first_v4", "last_v4"))
    val wF = Window.partitionBy("user_id").orderBy(col("batch_id"))
    all
      .withColumn("prev_last", lag(col("last_v4"), 1).over(wF))
      .groupBy("user_id")
      .agg(
        sum(col("bn")).as("n_events"),
        ((sum(col("bacc")) +
          sum(when(col("prev_last").isNotNull &&
            col("first_v4") > col("prev_last"),
            col("first_v4") - col("prev_last")).otherwise(0L)))
          .cast("double") / 10000.0).as("delta_sum"))
  }

  def klDriftIncrementalBatch(batch: DataFrame, stateDir: String,
      batchId: Long): DataFrame = {
    import graft.operators.{TextAnalysis, TextAnalysis6}
    val spark = batch.sparkSession
    val counts = oneRowPerKey(batch, "doc_id")
      .select(col("source"), explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    counts.write.mode("overwrite")
      .parquet(s"$stateDir/counts/batch_id=$batchId")
    val prior = {
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/counts")
      spark.read.parquet(p.toString)
        .filter(col("batch_id") < batchId)
        .select("source", "w", "c")
    }
    val cumulative = prior.unionByName(counts)
      .groupBy("source", "w").agg(sum("c").as("c"))
    TextAnalysis6.klFromCounts(cumulative)
  }

  /** ST1+ST2+ST3: an idempotent upsert sink for foreachBatch. Maintains
    * keyed state (here an in-memory map; in production the same merge
    * runs as a MERGE INTO / ReplacingMergeTree insert) by replaying each
    * micro-batch through the *batch* CDC materialization logic — the
    * exactly-once-on-sink upgrade of the reference's at-least-once
    * consumer (reference: main.py:27-55).
    *
    * TEST/DEMO ONLY: `merge` collects each micro-batch to the driver to
    * feed the in-memory map, so it is bounded by driver memory and NOT a
    * production path. The set-based production sink with the same merge
    * semantics is [[graft.sources.JdbcUpsertSink]] (MERGE INTO per
    * batch, state in the target store, nothing collected). */
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
  /** ST6 incremental twin of `q136_hll_portable`: per micro-batch the
    * (event_type, bucket)→max-rank register deltas land as an
    * overwrite-own-partition parquet state (retry-idempotent), and the
    * cumulative registers are the per-key MAX across batches — HLL
    * state is a join-semilattice, so arrival ORDER AND DUPLICATION are
    * both irrelevant (a strictly stronger contract than the
    * time-ordered deltaSum twin). Output = the one-shot estimator
    * minus its exact-count audit column: streaming exact distinct is
    * precisely the state HLL exists to avoid. */
  def hllIncrementalBatch(batch: DataFrame, stateDir: String,
      batchId: Long): DataFrame = {
    import graft.operators.EventAnalytics12
    val spark = batch.sparkSession
    val regs = EventAnalytics12.hllRanks(
        batch.select("event_type", "user_id"))
      .groupBy("event_type", "bucket").agg(max("rank").as("mj"))
    regs.write.mode("overwrite").parquet(s"$stateDir/regs/batch_id=$batchId")
    val all = spark.read
      .parquet(new org.apache.hadoop.fs.Path(s"$stateDir/regs").toString)
      .filter(col("batch_id") < batchId)
      .select("event_type", "bucket", "mj")
      .unionByName(regs)
      .groupBy("event_type", "bucket").agg(max("mj").as("mj"))
    EventAnalytics12.hllEstimate(all,
      all.select("event_type").distinct())
  }

  /** ST6 incremental twin of `q137_quantile_sketch`: per micro-batch
    * the (event_type, v4)→count deltas land as an
    * overwrite-own-partition parquet state (retry-idempotent), the
    * cumulative value counts are the per-key SUM across batches, and
    * the output runs the IDENTICAL factored estimator tail
    * (`EventAnalytics13.quantileFromValueCounts`) over them — so
    * golden ≡ one-shot in ANY arrival order (counts are a commutative
    * monoid). Unlike the HLL twin's join-semilattice, a sum does NOT
    * absorb duplicate DELIVERY of the same rows in different batches —
    * that contract stays where it belongs, on the upstream dedup stage
    * (`cdc_dedup_redelivery` / `Streams.dedupEvents`); what IS
    * absorbed is a retry of the same batch id. */
  def quantileIncrementalBatch(batch: DataFrame, stateDir: String,
      batchId: Long): DataFrame = {
    import graft.operators.EventAnalytics13
    val spark = batch.sparkSession
    val vcB = batch
      .select(col("event_type"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .groupBy("event_type", "v4").agg(count(lit(1)).as("c"))
    vcB.write.mode("overwrite").parquet(s"$stateDir/vc/batch_id=$batchId")
    val all = spark.read
      .parquet(new org.apache.hadoop.fs.Path(s"$stateDir/vc").toString)
      .filter(col("batch_id") < batchId)
      .select("event_type", "v4", "c")
      .unionByName(vcB)
      .groupBy("event_type", "v4").agg(sum("c").as("c"))
    EventAnalytics13.quantileFromValueCounts(spark, all)
  }

  /** ST6 incremental twin of `q143_survival_km`: per micro-batch the
    * per-user (min signup ts, min purchase ts) and the batch max ts
    * land as overwrite-own-partition parquet state; the cumulative
    * state is min/min/max across batches — a JOIN-SEMILATTICE, so
    * arrival ORDER and DUPLICATE DELIVERY are both absorbed (the HLL
    * twin's contract, stronger than the count-monoid quantile twin) —
    * and the output runs the IDENTICAL factored estimator
    * (`EventAnalytics14.survivalFromState`). The censoring end is the
    * running max over ALL events, exactly the one-shot's `mx`, so the
    * curve after the final batch equals the one-shot on the same
    * corpus. */
  def survivalIncrementalBatch(batch: DataFrame, stateDir: String,
      batchId: Long): DataFrame = {
    import graft.operators.EventAnalytics14
    val spark = batch.sparkSession
    val uB = batch.groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("s_ts"),
        min(when(col("event_type") === "purchase", col("ts"))).as("p_ts"),
        max(col("ts")).as("b_mx"))
    uB.write.mode("overwrite").parquet(s"$stateDir/users/batch_id=$batchId")
    val all = spark.read
      .parquet(new org.apache.hadoop.fs.Path(s"$stateDir/users").toString)
      .filter(col("batch_id") < batchId)
      .select("user_id", "s_ts", "p_ts", "b_mx")
      .unionByName(uB)
      .groupBy("user_id")
      .agg(min("s_ts").as("s_ts"), min("p_ts").as("p_ts"),
        max("b_mx").as("b_mx"))
      .localCheckpoint(true) // three consumers below
    val su = all.filter(col("s_ts").isNotNull).select("user_id", "s_ts")
    val pu = all.filter(col("p_ts").isNotNull).select("user_id", "p_ts")
    val mx = all.agg(max("b_mx").as("m_ts"))
    EventAnalytics14.survivalFromState(su, pu, mx)
  }

  // ------------------------------------------------------------------
  // ST6 incremental twin of `curation_pack_delta` — the O(edits) as-of
  // path the batch query's scaladoc documents (r15 VERDICT task 4)
  // ------------------------------------------------------------------

  /** One-time epoch initialization for [[packDeltaIncrementalBatch]]:
    * materialize the epoch packing state — for EVERY document (kept or
    * not) its token count, the pack keep-gate, and the EXCLUSIVE
    * prefix sum of kept-token contributions by doc_id. This is the
    * epoch pack the incremental query patches; it is computed ONCE
    * (the same [[graft.operators.ScalableWindows.globalRunningSum]]
    * two-pass as the registered `curation_pack_bins`) and every
    * subsequent micro-batch reads it at rest instead of re-tokenizing
    * and re-summing the corpus. */
  def packDeltaEpochInit(docs: DataFrame, stateDir: String): Unit = {
    import graft.operators.{ScalableWindows, TextAnalysis3}
    val base = docs.select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tok"),
        (!TextAnalysis3.isHoldout(col("doc_id")) &&
          !TextAnalysis3.qualityBad(col("text"))).as("kept"))
      .withColumn("__c", when(col("kept"), col("n_tok")).otherwise(lit(0L)))
    ScalableWindows.globalRunningSum(base, Seq(col("doc_id")), col("__c"),
        "__rn", "__cum")
      .select(col("doc_id"), col("n_tok"), col("kept"),
        (col("__cum") - col("__c")).as("cum_excl"))
      .write.mode("overwrite").parquet(s"$stateDir/epoch")
  }

  /** ST6 incremental twin of
    * [[graft.operators.Curation.packDelta]] (`curation_pack_delta`) —
    * the O(edits) as-of path that batch query's scaladoc documents:
    * per micro-batch of document edits (doc_id, text, version), emit
    * the DELTA of the chunk-invalidation set (vs the pre-batch set)
    * WITHOUT the O(corpus) two-pass re-pack the one-shot query runs.
    *
    * The invariant that makes this exact: the post-edit prefix sum at
    * any doc d equals the EPOCH prefix sum at d plus the running sum
    * of per-edit token CORRECTIONS at edits ≤ d (a step function with
    * one step per effective edit). So the new placement of every doc
    * is an AS-OF lookup of that step function against the at-rest
    * epoch state — never a re-tokenization, never a corpus-wide
    * running-sum rebuild. Concretely, per batch:
    *
    *   1. within-batch compaction + batchId-partitioned edit state,
    *      version-gated exactly like [[recurationDeltaBatch]] (stale
    *      cross-batch redeliveries fold to the SAME latest-per-key and
    *      short-circuit to an empty emission);
    *   2. two correction step tables — from the pre-batch edit set and
    *      the post-batch edit set — each O(|edits|): per effective
    *      edit, delta = (kept'·n_tok') − (kept_epoch·n_tok_epoch),
    *      running-summed by [[graft.operators.ScalableWindows.globalRunningSum]];
    *   3. the epoch state is read WITH a doc_id ≥ m pushdown, m = the
    *      smallest doc whose effective edit changed this batch — every
    *      doc before m has identical corrections under both step
    *      functions and provably identical placement (the prefix-
    *      stability argument of the batch query, now load-bearing);
    *   4. each suffix doc picks up its correction via
    *      [[graft.operators.Joins.binnedRangeJoin]] over the step
    *      intervals (a HASH join — no global sort, no nested loop),
    *      once per step function; rows whose pre/post delta-vs-epoch
    *      rows differ emit: op=upsert carries the current
    *      invalidation row, op=retract marks a doc RESTORED to its
    *      epoch placement (corrections cancelled).
    *
    * Folding emissions (latest per doc across batches, dropping
    * retracts) after batch N reproduces the registered
    * `curation_pack_delta` over the total edit set — PackDeltaStreamSpec
    * proves golden ≡ one-shot across batches, under cross-batch
    * redelivery, and through a full revert (every emission retracted).
    *
    * Cost shape: per batch O(|batch| + |edits| + |affected suffix|):
    * the only corpus-sized relation touched is the at-rest epoch state
    * and its scan is pruned to doc_id ≥ m by parquet pushdown (the
    * spec asserts the plan contains NO documents-table scan and
    * carries the GreaterThanOrEqual pushdown). The affected suffix is
    * the true answer's own size — the emission IS that set's change.
    * At the registered 1/7 edit fraction the one-shot two-pass remains
    * the right BATCH plan (the batch query's adjudication); this twin
    * is the CDC-maintenance path where edit fractions are tiny. */
  def packDeltaIncrementalBatch(batch: DataFrame, stateDir: String,
      batchId: Long, cap: Long): DataFrame = {
    import graft.operators.{Joins, ScalableWindows, TextAnalysis3}
    val spark = batch.sparkSession
    val epoch = spark.read.parquet(s"$stateDir/epoch")
    def latest(df: DataFrame): DataFrame = df
      .groupBy("doc_id")
      .agg(max(struct(col("version"), col("text"))).as("_r"))
      .select(col("doc_id"), col("_r.version").as("version"),
        col("_r.text").as("text"))
    val compacted = latest(batch.select("doc_id", "version", "text"))
      .localCheckpoint(true)
    val prior = {
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/edits")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        spark.read.parquet(p.toString)
          .filter(col("batch_id") < batchId)
          .select("doc_id", "version", "text")
      else compacted.limit(0).select("doc_id", "version", "text")
    }
    compacted.write.mode("overwrite")
      .parquet(s"$stateDir/edits/batch_id=$batchId")
    val prevLatest = latest(prior).localCheckpoint(true)
    val allLatest = latest(prior.unionByName(compacted)).localCheckpoint(true)
    val emptyOut = epoch.limit(0).select(col("doc_id"),
      lit("").as("change"), lit(0L).as("old_first_chunk"),
      lit(0L).as("new_first_chunk"), lit(0L).as("old_chunk_offset"),
      lit(0L).as("new_chunk_offset"), lit("").as("op"))
    // m = smallest doc whose EFFECTIVE edit changed this batch; a pure
    // redelivery (every latest unchanged) emits nothing, by state
    val changed = allLatest.select(col("doc_id"), col("version").as("__va"))
      .join(prevLatest.select(col("doc_id"), col("version").as("__vp")),
        Seq("doc_id"), "left")
      .filter(!(col("__va") <=> col("__vp")))
    val mRow = changed.agg(min("doc_id")).head()
    if (mRow.isNullAt(0)) return emptyOut
    val m = mRow.getLong(0)
    val maxDoc = epoch.agg(max("doc_id")).head().getLong(0)
    // per effective edit (epoch-scoped): post-edit gate/count and the
    // token correction vs the doc's epoch contribution
    def editInfo(lat: DataFrame): DataFrame = lat
      .join(epoch.select(col("doc_id"), col("n_tok").as("__en"),
        col("kept").as("__ek")), Seq("doc_id"))
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("f_n"),
        (!TextAnalysis3.isHoldout(col("doc_id")) &&
          !TextAnalysis3.qualityBad(col("text"))).as("f_k"),
        col("__en"), col("__ek"))
      .withColumn("delta",
        when(col("f_k"), col("f_n")).otherwise(lit(0L)) -
          when(col("__ek"), col("__en")).otherwise(lit(0L)))
      .localCheckpoint(true)
    // correction step function as [start, end) intervals carrying the
    // INCLUSIVE running correction; sentinel covers (-inf, first step)
    def intervals(ei: DataFrame): (DataFrame, Long) = {
      val steps = ei.filter(col("delta") =!= 0L).select("doc_id", "delta")
      val n = steps.count()
      if (n == 0L)
        (spark.range(1).select(lit(-1L).as("__start"),
          lit(maxDoc + 1).as("__end"), lit(0L).as("__r")), 1L)
      else {
        val withR = ScalableWindows.globalRunningSum(steps,
          Seq(col("doc_id")), col("delta"), "__rn", "__r")
        val nxt = withR.select((col("__rn") - 1).as("__rn"),
          col("doc_id").as("__next"))
        val iv = withR.join(nxt, Seq("__rn"), "left")
          .select(col("doc_id").as("__start"),
            coalesce(col("__next"), lit(maxDoc + 1)).as("__end"), col("__r"))
        val firstS = iv.agg(min("__start")).head().getLong(0)
        (iv.unionByName(spark.range(1).select(lit(-1L).as("__start"),
          lit(firstS).as("__end"), lit(0L).as("__r"))), n)
      }
    }
    val suffix = epoch.filter(col("doc_id") >= m)
    // delta-vs-epoch row for every suffix doc under one step function
    def placed(ei: DataFrame, tag: String): DataFrame = {
      val (iv, n) = intervals(ei)
      val w = math.max(1L, (maxDoc + 2) / math.max(n, 32L))
      val asOf = Joins.binnedRangeJoin(iv, suffix, "doc_id",
          "__start", "__end", w)
        .select(col("doc_id"), col("n_tok"), col("kept"), col("cum_excl"),
          col("__r"))
        .join(ei.select(col("doc_id"), col("delta").as("__own"),
          col("f_n"), col("f_k")), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tok"), col("kept"), col("cum_excl"),
          (col("__r") - coalesce(col("__own"), lit(0L))).as("__rx"),
          coalesce(col("f_n"), col("n_tok")).as("__cn"),
          coalesce(col("f_k"), col("kept")).as("__ck"))
      asOf.select(col("doc_id"),
          col("kept"), col("__ck"),
          expr(s"cum_excl div $cap").as("__ofc"),
          expr(s"(cum_excl + n_tok - 1) div $cap").as("__olc"),
          expr(s"cum_excl % $cap").as("__ooff"),
          expr(s"(cum_excl + __rx) div $cap").as("__nfc"),
          expr(s"(cum_excl + __rx + __cn - 1) div $cap").as("__nlc"),
          expr(s"(cum_excl + __rx) % $cap").as("__noff"),
          col("n_tok"), col("__cn"))
        .withColumn("__has",
          (col("kept") || col("__ck")) &&
            (!col("kept") || !col("__ck") ||
              col("__ofc") =!= col("__nfc") || col("__olc") =!= col("__nlc") ||
              col("__ooff") =!= col("__noff") || col("n_tok") =!= col("__cn")))
        .select(col("doc_id"),
          col("__has").as(s"has_$tag"),
          when(col("__has"),
            when(!col("kept"), "added").when(!col("__ck"), "removed")
              .otherwise("moved")).as(s"chg_$tag"),
          when(col("__has") && col("kept"), col("__ofc")).as(s"ofc_$tag"),
          when(col("__has") && col("__ck"), col("__nfc")).as(s"nfc_$tag"),
          when(col("__has") && col("kept"), col("__ooff")).as(s"ooff_$tag"),
          when(col("__has") && col("__ck"), col("__noff")).as(s"noff_$tag"))
    }
    val cur = placed(editInfo(allLatest), "n")
    val prev = placed(editInfo(prevLatest), "p")
    cur.join(prev, Seq("doc_id"))
      .filter((col("has_n") || col("has_p")) &&
        !(col("has_n") && col("has_p") &&
          col("chg_n") <=> col("chg_p") && col("ofc_n") <=> col("ofc_p") &&
          col("nfc_n") <=> col("nfc_p") && col("ooff_n") <=> col("ooff_p") &&
          col("noff_n") <=> col("noff_p")))
      .select(col("doc_id"),
        coalesce(col("chg_n"), lit("")).as("change"),
        col("ofc_n").as("old_first_chunk"),
        col("nfc_n").as("new_first_chunk"),
        col("ooff_n").as("old_chunk_offset"),
        col("noff_n").as("new_chunk_offset"),
        when(col("has_n"), "upsert").otherwise("retract").as("op"))
  }
}
