package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Throughput for the O(edits) pack-delta maintainer
  * ([[Streams.packDeltaIncrementalBatch]], r15 VERDICT task 4) — the
  * "spec-proven AND measured" bar the other streaming twins met
  * (TwsBench, MediaDedupBench). The claim worth a number here is the
  * COST SHAPE, not raw rows/sec: per batch O(|batch| + |edits| +
  * |affected suffix|) with the only corpus-sized input pruned to
  * doc_id ≥ m by parquet pushdown. So the bench drives REAL corpus
  * epochs at two sizes and two edit placements:
  *
  *   - `tail`: edits land in the doc_id tail (the CDC-realistic
  *     "recent documents get re-edited" case) — m is near max(doc_id),
  *     the pruned epoch scan and the emission are both small, and
  *     per-batch time should be near-CONSTANT across a 10× epoch
  *     (that flatness IS the no-corpus-rescan claim, measured);
  *   - `uniform`: edits spread over the whole id space — m is small,
  *     the affected suffix approaches the corpus, and the emission is
  *     the true answer's own size (every later doc's placement
  *     shifts). Growth here is the ANSWER growing, not the algorithm
  *     regressing; the tail tier is the control that proves it.
  *
  * Each batch doubles the text of a disjoint id slice (the
  * PackDeltaStreamSpec edit rule) and re-delivers ~10% of the prior
  * batch's rows verbatim, so the timed path pays the version-gated
  * compaction and cross-batch state read the production loop pays.
  * Epoch init (the ONE O(corpus) two-pass, amortized over the epoch's
  * whole edit lifetime) is timed separately and reported.
  *
  * Appends to committed records/packdelta.jsonl (round-stamped).
  *
  * Usage: runMain graft.tools.PackDeltaBench [nBatches] [epochDirs...]
  */
object PackDeltaBench {
  private val Cap = 2048L

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(6)
    val epochDirs = {
      val d = args.drop(1).toSeq
      if (d.nonEmpty) d
      else Seq("/root/testdata/sf0.1", "/tmp/sf1").filter(p =>
        new java.io.File(p).isDirectory)
    }
    val per = 500
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))

    val cells = epochDirs.map { dir =>
      val docs = graft.Tables.documents(spark, dir)
        .select("doc_id", "text").localCheckpoint(true)
      val n = docs.count()
      val maxId = docs.agg(max("doc_id")).head().getLong(0)

      def editBatch(b: Int, tail: Boolean): DataFrame = {
        val ids =
          if (tail) col("doc_id") > maxId - (b + 1).toLong * per &&
            col("doc_id") <= maxId - b.toLong * per
          else col("doc_id") % (n / per) === b.toLong
        val t = trim(col("text"))
        docs.filter(ids).select(col("doc_id"),
          lit(b + 2L).as("version"),
          concat(t, lit(" "), t).as("text"))
      }

      def tier(tail: Boolean, state: String): String = {
        var emitted = 0L
        var prev: Option[DataFrame] = None
        val times = (0 until nBatches).map { b =>
          val fresh = editBatch(b, tail).localCheckpoint(true)
          val batch = prev match { // ~10% cross-batch redelivery
            case Some(p) => fresh.unionByName(
              p.filter(col("doc_id") % 10 === 0))
            case None => fresh
          }
          prev = Some(fresh)
          val t0 = System.nanoTime()
          emitted += Streams
            .packDeltaIncrementalBatch(batch, state, b.toLong, Cap)
            .count()
          (System.nanoTime() - t0) / 1e6
        }
        val s = times.sorted
        val totalEdits = nBatches.toLong * per
        f""""${if (tail) "tail" else "uniform"}":{"edits_per_sec":${totalEdits / (times.sum / 1000)}%.0f,"p50_batch_ms":${s(s.size / 2)}%.1f,"max_batch_ms":${s.last}%.1f,"emitted":$emitted}"""
      }

      def run(tail: Boolean): String = {
        val state = java.nio.file.Files
          .createTempDirectory(s"packdeltabench").toString
        val t0 = System.nanoTime()
        Streams.packDeltaEpochInit(docs, state)
        val initMs = (System.nanoTime() - t0) / 1e6
        val body = tier(tail, state)
        f"""$body,"epoch_init_ms_${if (tail) "tail" else "uniform"}":$initMs%.0f"""
      }

      // warm-up on the first epoch only: codegen + parquet writer init
      if (dir == epochDirs.head) {
        val w = java.nio.file.Files
          .createTempDirectory("packdeltawarm").toString
        val head = docs.filter(col("doc_id") < 2000).localCheckpoint(true)
        Streams.packDeltaEpochInit(head, w)
        val t = trim(col("text"))
        Streams.packDeltaIncrementalBatch(
          head.filter(col("doc_id") < 50).select(col("doc_id"),
            lit(2L).as("version"), concat(t, lit(" "), t).as("text")),
          w, 0L, Cap).count()
      }

      val label = dir.split('/').last
      s""""$label":{"docs":$n,${run(tail = true)},${run(tail = false)}}"""
    }

    spark.stop()
    val line = s"""{"metric":"pack_delta_bench","batches":$nBatches,""" +
      s""""per_batch_edits":$per,"epochs":{${cells.mkString(",")}}}"""
    println(line)
    ScalePair.append("records/packdelta.jsonl", line)
  }
}
