package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.JdbcUpsertSink

/** Streaming throughput micro-bench (r12 VERDICT task 7): the CDC
  * upsert pipeline has end-to-end correctness evidence
  * (CrashRecoverySpec, the incremental twins) but no recorded
  * events/s or per-batch latency — the reference's operational metric
  * (its consumer loop is row-at-a-time Python into ClickHouse). This
  * drives the SAME sink the correctness spec proves: a checkpointed
  * MemoryStream of CDC-shaped rows → foreachBatch → version-gated
  * MERGE into Derby (the in-container stand-in for the OLAP store).
  *
  * Two passes isolate the sink: a NOOP pass (foreachBatch counts the
  * batch — pure micro-batch machinery) and the MERGE pass; the delta
  * is what the JDBC landing costs. Each micro-batch is timed
  * individually (addData → processAllAvailable), so p50/max per-batch
  * latency is real, not total/n. Keys cycle over a space smaller than
  * the row count, so the MERGE exercises the insert AND update paths
  * every batch; ~3% of rows are tombstones for the delete path.
  *
  * Usage: runMain graft.tools.StreamBench [nBatches rowsPerBatch]
  * Prints one JSON line.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(20)
    val rowsPer = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
    val keySpace = rowsPer * 4L // 4 batches to first revisit: update-heavy tail
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._

    def rows(b: Int): Seq[(Long, String, Long, Boolean)] =
      (0 until rowsPer).map { i =>
        val id = (b.toLong * rowsPer + i) % keySpace
        (id, s"user_${id}_v$b", b.toLong + 1, (id % 37) == 0)
      }

    /** run one pass: per-batch millis, driven batch-by-batch */
    def pass(name: String, body: (org.apache.spark.sql.DataFrame, Long) => Unit)
        : Seq[Double] = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"sbench_$name").toString
      implicit val sq = spark.sqlContext
      val mem = MemoryStream[(Long, String, Long, Boolean)]
      val q = mem.toDF
        .toDF("id", "username", "version", "__deleted")
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", ckpt)
        .start()
      val times = (0 until nBatches).map { b =>
        mem.addData(rows(b))
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e6
      }
      q.stop()
      times
    }

    def stats(ts: Seq[Double]): (Double, Double, Double) = {
      val s = ts.sorted
      (s(s.size / 2), s.last, ts.sum)
    }

    // warmup: absorb codegen/stream-init so pass 1 isn't penalized
    pass("warm", (df, _) => { df.count(); () })

    val noop = pass("noop", (df, _) => { df.count(); () })
    val url = "jdbc:derby:memory:graft_sbench;create=true"
    val merge = JdbcUpsertSink(url, "sbench_latest", "id", "version", "__deleted")
    val merged = pass("merge", (df, id) => merge(df, id))

    // sanity: the landed table must hold latest-per-key over all input
    val landed = spark.read
      .jdbc(url, "\"sbench_latest\"", new java.util.Properties).count()
    val totalRows = nBatches.toLong * rowsPer
    val (np50, nmax, nsum) = stats(noop)
    val (mp50, mmax, msum) = stats(merged)
    spark.stop()
    println(
      f"""{"metric":"stream_upsert","batches":$nBatches,"rows_per_batch":$rowsPer,"total_rows":$totalRows,"merge_events_per_sec":${totalRows / (msum / 1000)}%.0f,"merge_p50_batch_ms":$mp50%.1f,"merge_max_batch_ms":$mmax%.1f,"noop_events_per_sec":${totalRows / (nsum / 1000)}%.0f,"noop_p50_batch_ms":$np50%.1f,"noop_max_batch_ms":$nmax%.1f,"landed_keys":$landed}""")
  }
}
