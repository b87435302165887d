package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine telemetry (the system.query_log / console-monitoring role of
  * the reference's provisioned stack, engine-side): listener-based
  * capture of batch query executions and streaming micro-batch progress.
  *
  * Both listeners are push-based callbacks on the driver — zero overhead
  * on executors and no change to query plans. At scale this is the feed
  * a metrics pipeline tails; here it lands in bounded in-memory buffers
  * the caller drains.
  */
object Telemetry {

  final case class BatchQueryMetric(
      funcName: String,
      durationNs: Long,
      outputRows: Option[Long],
      failed: Boolean)

  final case class MicroBatchMetric(
      queryName: String,
      batchId: Long,
      inputRows: Long,
      batchDurationMs: Long)

  /** Batch-side: records every DataFrame action on the session. */
  final class BatchRecorder extends QueryExecutionListener {
    private[graft] val buf = new ArrayBuffer[BatchQueryMetric]
    private val MaxEntries = 10000

    private def record(m: BatchQueryMetric): Unit = buf.synchronized {
      if (buf.size < MaxEntries) buf += m
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      record(BatchQueryMetric(funcName, durationNs,
        qe.executedPlan.metrics.get("numOutputRows").map(_.value),
        failed = false))

    override def onFailure(funcName: String, qe: QueryExecution,
        error: Exception): Unit =
      record(BatchQueryMetric(funcName, 0L, None, failed = true))

    def drain(): Seq[BatchQueryMetric] = buf.synchronized {
      val out = buf.toSeq; buf.clear(); out
    }
  }

  /** Streaming-side: micro-batch progress per query name. */
  final class StreamRecorder extends StreamingQueryListener {
    private[graft] val buf = new ArrayBuffer[MicroBatchMetric]
    private val MaxEntries = 10000

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      buf.synchronized {
        if (buf.size < MaxEntries)
          buf += MicroBatchMetric(
            Option(e.progress.name).getOrElse(e.progress.id.toString),
            e.progress.batchId, e.progress.numInputRows,
            e.progress.batchDuration)
      }

    def drain(): Seq[MicroBatchMetric] = buf.synchronized {
      val out = buf.toSeq; buf.clear(); out
    }
  }

  private val attached = TrieMap.empty[SparkSession, (BatchRecorder, StreamRecorder)]

  /** Attach both recorders to a session (idempotent per session). */
  def attach(spark: SparkSession): (BatchRecorder, StreamRecorder) =
    attached.getOrElseUpdate(spark, {
      val b = new BatchRecorder
      val s = new StreamRecorder
      spark.listenerManager.register(b)
      spark.streams.addListener(s)
      (b, s)
    })
}
