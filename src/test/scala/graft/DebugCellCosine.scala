package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver: cell-geometry sweep for [[graft.operators.Dedup.cellCosinePairs]]
  * at a given SF dir. For each bits setting, measures end-to-end wall
  * time and the verified pair count (which must be IDENTICAL across
  * bits — the cell grid is a pruning device, never a semantic one).
  * Usage: runMain graft.DebugCellCosine /tmp/sf1 4 6 8 10 */
object DebugCellCosine {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[dbg] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(argv: Array[String]): Unit = {
    val dir = argv.headOption.getOrElse("/root/testdata/sf0.1")
    val bitsList = if (argv.length > 1) argv.drop(1).map(_.toInt).toSeq else Seq(4, 6, 8, 10)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("dbg-cellcosine").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(s, dir)
    val n = emb.count()
    println(s"[dbg] n=$n auto bits=${graft.operators.Dedup.autoCellBits(n)}")
    for (bits <- bitsList) {
      val pairs = time(s"cellCosinePairs bits=$bits") {
        graft.operators.Dedup.cellCosinePairs(emb,
          graft.operators.Dedup.CosineThreshold, bits).count()
      }
      println(s"[dbg]   bits=$bits verified pairs=$pairs")
    }
    s.stop()
  }
}
