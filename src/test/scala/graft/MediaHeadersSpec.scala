package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaHeaders

/** Codec-free header parsing against REAL byte layouts of each format. */
class MediaHeadersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private val png = bytes(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
    0, 0, 0, 13, 'I', 'H', 'D', 'R',
    0, 0, 1, 0x40, // width 320 BE
    0, 0, 0, 0xF0, // height 240 BE
    8, 6, 0, 0, 0)
  private val gif = bytes('G', 'I', 'F', '8', '9', 'a',
    3, 0, 2, 0, 0, 0, 0) // 3×2 LE
  private val bmp = bytes('B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
    40, 0, 0, 0, 16, 0, 0, 0, 8, 0, 0, 0) // 16×8 LE at 18/22
  private val jpeg = bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10,
    'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
    0xFF, 0xC0, 0x00, 0x11, 8, 0x00, 0x02, 0x00, 0x03, 1, 0, 0, 0) // 3×2
  private val wav = bytes('R', 'I', 'F', 'F', 36, 0, 0, 0, 'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, 2, 0,
    0x44, 0xAC, 0, 0) // 44100 Hz LE at 24
  private val junk = bytes(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)

  test("sniffs formats and extracts geometry from real header layouts") {
    val df = Seq(("png", png), ("gif", gif), ("bmp", bmp), ("jpeg", jpeg),
        ("wav", wav), ("junk", junk))
      .toDF("label", "media")
      .select(col("label"),
        MediaHeaders.format(col("media")).as("fmt"),
        MediaHeaders.width(col("media")).as("w"),
        MediaHeaders.height(col("media")).as("h"),
        MediaHeaders.wavRate(col("media")).as("rate"))
      .as[(String, String, Option[Int], Option[Int], Option[Int])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(df("png") === (("png", Some(320), Some(240), None)))
    assert(df("gif") === (("gif", Some(3), Some(2), None)))
    assert(df("bmp") === (("bmp", Some(16), Some(8), None)))
    assert(df("jpeg") === (("jpeg", Some(3), Some(2), None)))
    assert(df("wav") === (("wav", None, None, Some(44100))))
    assert(df("junk") === (("unknown", None, None, None)))
  }

  test("expressions run inside whole-stage codegen (no fallback)") {
    // repartition first: ConvertToLocalRelation would otherwise fold the
    // projection over the local Seq driver-side and leave no codegen stage
    val df = Seq(("x", png)).toDF("label", "media")
      .repartition(1)
      .select(MediaHeaders.width(col("media")).as("w"))
    // execute df ITSELF (not a derived Dataset), then inspect: AQE's
    // pre-execution plan has no codegen stages planned yet
    val rows = df.collect()
    assert(rows.head.getInt(0) === 320)
    // the "*(n)" prefix marks a WholeStageCodegen stage in plan strings;
    // a CodegenFallback expression would render an unstarred Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
