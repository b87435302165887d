package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL registration of the round-2 native expressions. */
class ExtensionsSpec2 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("word_shingles / media_format / image_width callable from SQL") {
    GraftExtensions.register(spark)
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c','d'), 2) AS s")
      .collect()(0).getSeq[String](0)
    assert(sh === Seq("a b", "b c", "c d"))
    val sh3 = spark.sql("SELECT word_shingles(array('a','b','c')) AS s")
      .collect()(0).getSeq[String](0)
    assert(sh3 === Seq("a b c"))
    val row = spark.sql(
      """SELECT media_format(png) AS fmt, image_width(png) AS w,
        |       image_height(png) AS h
        |FROM (SELECT unhex(concat('89504E470D0A1A0A', '0000000D', '49484452',
        |        '00000140', '000000F0', '0806000000')) AS png)""".stripMargin)
      .collect()(0)
    assert(row.getString(0) === "png")
    assert(row.getInt(1) === 320)
    assert(row.getInt(2) === 240)
  }

  test("bmp_build / bmp_channel_sum callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT media_format(b) AS fmt, image_width(b) AS w,
        |       bmp_channel_sum(b, 2) AS sr,
        |       bmp_channel_sum(b, 2, true) AS wsr
        |FROM (SELECT bmp_build(41L, 3, 2) AS b)""".stripMargin)
      .collect()(0)
    assert(row.getString(0) === "bmp")
    assert(row.getInt(1) === 3)
    var s = 0L; var ws = 0L
    for (x <- 0 until 3; y <- 0 until 2) {
      val r = (x.toLong * y + 41L) % 256
      s += r; ws += (x + 1).toLong * (y + 1) * r
    }
    assert(row.getLong(2) === s)
    assert(row.getLong(3) === ws)
  }

  test("png_build / png chunk walkers callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT png_chunk_count(b) AS n, png_idat_bytes(b) AS ib,
        |       png_crc_valid_chunks(b) AS ok,
        |       png_chunk_count(unhex('DEADBEEF')) AS bad
        |FROM (SELECT png_build(10L) AS b)""".stripMargin)
      .collect()(0)
    // seed 10: 2 tEXt + 3 IDAT + IHDR + IEND = 7 chunks; 10 % 5 == 0
    // → one bit-rotted IDAT CRC
    assert(row.getLong(0) === 7L)
    assert(row.getLong(1) ===
      (0L until 3L).map(i => (10 + 7 * i) % 13 + 1).sum)
    assert(row.getLong(2) === 6L)
    assert(row.isNullAt(3))
  }

  test("jpeg / mp4 walkers callable from SQL") {
    GraftExtensions.register(spark)
    // mp4_build is intentionally not a SQL function (the walkers are the
    // public surface); feed bytes from the Scala builder instead
    import spark.implicits._
    val mp4 = Seq(graft.functions.Mp4Boxes.buildMp4(42L)).toDF("m")
    mp4.createOrReplaceTempView("mp4v")
    val jrow = spark.sql(
      """SELECT jpeg_width(jpeg_build(42L)) AS w,
        |       jpeg_height(jpeg_build(42L)) AS h,
        |       jpeg_width(unhex('DEADBEEF')) AS bad""".stripMargin)
      .collect()(0)
    assert(jrow.getLong(0) === 42L % 997 + 1)
    assert(jrow.getLong(1) === 42L % 499 + 1)
    assert(jrow.isNullAt(2))
    val mrow = spark.sql(
      "SELECT mp4_box_count(m) AS nb, mp4_mdat_bytes(m) AS mb FROM mp4v")
      .collect()(0)
    assert(mrow.getLong(0) === 3L + 42L % 3 + 1)
    assert(mrow.getLong(1) ===
      (0L until (42L % 3 + 1)).map(i => (42L + 13 * i) % 4093 + 1).sum)
  }
}
