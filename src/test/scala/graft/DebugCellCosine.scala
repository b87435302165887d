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

  /** Experimental member-level-pruned variant — MEASURED AND RETIRED
    * (r08): identical cell geometry, but each (member,
    * surviving-cell-pair) is additionally screened by the triangle
    * inequality against the OTHER cell's centroid
    * (θ(a, c_j) − r_j ≤ thr ⟺ cos(a, c_j) ≥ cos(thr + r_j), with a
    * float-centroid slack that only ever ADDS candidates) on BOTH join
    * sides before the |Ai|·|Bj| block join. At sf2 / bits 9 it verifies
    * the identical 453 556 pairs but costs 30.5 s vs the production
    * path's 21.8 s in the same JVM: with ~80-row cells the radii are
    * already wide relative to arccos(0.4), the screen rejects too few
    * members to repay one extra dot per (member, cell-pair) plus the
    * doubled broadcast-join fan-out. Kept as the reproducible negative
    * result; revisit only for corpora with tight clusters (small radii)
    * or higher thresholds, where the screen's floor cos(thr + r) is
    * meaningfully above the threshold itself. */
  def memberPruned(emb: org.apache.spark.sql.DataFrame, threshold: Double,
      bits: Int): org.apache.spark.sql.DataFrame = {
    import graft.functions.VectorFunctions
    import graft.operators.{Dedup, Similarity}
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col("vec_id"), col("embedding"),
      VectorFunctions.norm(col("embedding")).as("nrm"),
      Similarity.lshSignature(col("embedding"), bits).as("cell"))
      .localCheckpoint(true)
    val cent = e.select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(sum(col("x").cast("double")).as("sx"))
      .groupBy("cell")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("sx")))),
        s => s.getField("sx")).as("cvec"))
    val cellStats = e.join(cent, "cell")
      .select(col("cell"), col("cvec"),
        (aggregate(zip_with(col("embedding"), col("cvec"),
          (a, c) => a.cast("double") * c), lit(0.0), (acc, x) => acc + x) /
          (col("nrm") * sqrt(aggregate(zip_with(col("cvec"), col("cvec"),
            (a, b) => a * b), lit(0.0), (acc, x) => acc + x)))).as("cosang"))
      .groupBy("cell")
      .agg(first(col("cvec")).as("cvec"),
        max(acos(greatest(lit(-1.0), least(lit(1.0), col("cosang")))))
          .as("radius"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val thrAngle = math.acos(threshold)
    val slack = 1e-6
    val fslack = 1e-3 // float-centroid slack for the member screen
    def ang(u: Array[Double], v: Array[Double]): Double = {
      var d = 0.0; var nu = 0.0; var nv = 0.0; var i = 0
      while (i < u.length) { d += u(i) * v(i); nu += u(i) * u(i); nv += v(i) * v(i); i += 1 }
      val denom = math.sqrt(nu) * math.sqrt(nv)
      if (denom < 1e-300) 0.0
      else math.acos(math.max(-1.0, math.min(1.0, d / denom)))
    }
    def fnorm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    // surviving ordered cell pairs, each carrying the OPPOSITE cell's
    // float centroid, its norm, and the member-screen cosine floor
    val surviving = for {
      (ci, vi, ri) <- cellStats
      (cj, vj, rj) <- cellStats
      if ang(vi, vj) - ri - rj <= thrAngle + slack
    } yield (ci, cj,
      vj.map(_.toFloat), fnorm(vj), math.cos(math.min(math.Pi, thrAngle + rj)),
      vi.map(_.toFloat), fnorm(vi), math.cos(math.min(math.Pi, thrAngle + ri)))
    val pairCells = broadcast(surviving.toSeq
      .toDF("ci", "cj", "cvj", "cnj", "thj", "cvi", "cni", "thi"))
    val aF = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("nrm").as("a_nrm"), col("cell").as("ci"))
      .join(pairCells, "ci")
      .filter(VectorFunctions.dot(col("a_emb"), col("cvj")) /
        (col("a_nrm") * col("cnj")) >= col("thj") - fslack)
      .select("a_id", "a_emb", "a_nrm", "ci", "cj")
    val bF = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("nrm").as("b_nrm"), col("cell").as("cj"))
      .join(pairCells.select("ci", "cj", "cvi", "cni", "thi"), "cj")
      .filter(VectorFunctions.dot(col("b_emb"), col("cvi")) /
        (col("b_nrm") * col("cni")) >= col("thi") - fslack)
      .select("b_id", "b_emb", "b_nrm", "ci", "cj")
    aF.join(bF, Seq("ci", "cj"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", VectorFunctions.dot(col("a_emb"), col("b_emb")) /
        (col("a_nrm") * col("b_nrm")))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
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
      val mp = time(s"memberPruned    bits=$bits") {
        memberPruned(emb,
          graft.operators.Dedup.CosineThreshold, bits).count()
      }
      println(s"[dbg]   bits=$bits member-pruned pairs=$mp")
    }
    s.stop()
  }
}
