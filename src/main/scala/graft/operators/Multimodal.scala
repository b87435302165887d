package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Multimodal columns (SURVEY.md §2.5): media as opaque `binary` columns
  * with typed metadata riding alongside, plus a per-partition
  * decode/feature-extract stage.
  *
  * The container ships no image/audio codecs, so COMPRESSED-format
  * decode (JPEG/PNG/video) is stubbed in spec-only helpers
  * ([[decodeStub]], [[resizeStub]], [[sampleFrames]]) that exercise the
  * plumbing. The REGISTERED pipeline computes nothing fake: the
  * mm_feature_extract query decodes real 24-bpp BMPs ([[decodeBmp]] —
  * BMP pixel arrays need no decompression) inside the same
  * mapPartitions batch shape a codec deployment uses, under a full
  * DuckDB oracle. The schema (binary + metadata struct), typed Dataset
  * plumbing, per-partition batching, and partitioning story (media rows
  * processed where they live, no shuffle before extraction) are shared
  * by both paths.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      media: Array[Byte],
      format: String,
      n_bytes: Long)

  final case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      features: Array[Double])

  /** ??? in spirit — STUB decoder (see class doc): deterministic 8-bin
    * byte histogram, normalized. A real deployment swaps this one
    * function for an actual codec; the Spark plumbing is unchanged. */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](8)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xFF) >>> 5) += 1.0
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < 8) { bins(j) /= bytes.length; j += 1 }
    }
    bins
  }

  /** Per-partition feature extraction: the mapPartitions batch shape a
    * real decoder needs (amortized model/codec init per partition). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // real impl: init codec/model once here, then stream the batch
      it.map(r => MediaFeatures(r.doc_id, r.format, r.n_bytes,
        decodeStub(r.media)))
    }(Encoders.product[MediaFeatures])

  /** STUB resize (see class doc): a real impl decodes, scales to w×h,
    * re-encodes; the fake deterministically downsamples the byte stream
    * to w·h bytes so the plumbing (payload transform keeping metadata,
    * per-partition batches) is testable. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, w * h)
    if (bytes.length <= target) bytes
    else {
      val out = new Array[Byte](target)
      val step = bytes.length.toDouble / target
      var i = 0
      while (i < target) { out(i) = bytes((i * step).toInt); i += 1 }
      out
    }
  }

  /** STUB frame sampling: a real impl demuxes video and keeps every
    * n-th frame; the fake splits the payload into fixed-size "frames"
    * and keeps every n-th — one input row fans out to many frame rows
    * (the generator shape downstream training jobs consume). */
  final case class MediaFrame(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
      everyN: Int): Dataset[MediaFrame] =
    media.mapPartitions { it =>
      it.flatMap { r =>
        r.media.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % everyN == 0 =>
            MediaFrame(r.doc_id, idx.toLong, frame)
        }
      }
    }(Encoders.product[MediaFrame])

  /** documents.text as a stand-in media payload (UTF-8 bytes). */
  def asMedia(docs: DataFrame): Dataset[MediaRecord] =
    docs.select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        lit("text/plain").as("format"),
        octet_length(encode(col("text"), "UTF-8")).cast("bigint").as("n_bytes"))
      .as(Encoders.product[MediaRecord])

  /** Binary column + metadata battery, oracle-checked: byte length,
    * SHA-256 content address, hex prefix — the dedup/addressing layer a
    * multimodal lakehouse needs on opaque payloads. */
  val binaryMeta: Q = Q(
    "mm_binary_meta",
    """SELECT doc_id,
      |  OCTET_LENGTH(ENCODE(text)) AS n_bytes,
      |  SHA256(text) AS content_sha,
      |  LOWER(HEX(ENCODE(SUBSTRING(text, 1, 8)))) AS prefix_hex
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    documents(s, d).select(
        col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("bigint").as("n_bytes"),
        sha2(encode(col("text"), "UTF-8"), 256).as("content_sha"),
        lower(hex(encode(substring(col("text"), 1, 8), "UTF-8"))).as("prefix_hex"))
      .orderBy("doc_id")
  }

  /** REAL single-pass BMP decode: header fields (data offset, geometry)
    * plus per-channel means from one walk of the 4-byte-padded,
    * bottom-up pixel array. Runs inside [[extractBmpFeatures]]'s
    * mapPartitions batch — the per-partition decoder-init shape a codec
    * pipeline needs — and every output value is genuinely computed from
    * the bytes (nothing placeholder). Returns null for non-BMP input
    * (the lenient per-record path). */
  def decodeBmp(b: Array[Byte]): Array[Double] = {
    def le32(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    // shared header validation (magic, 24 bpp, positive geometry) — a
    // 32-bpp or paletted BMP must yield null, not garbage means
    if (!graft.functions.BmpPixels.headerOk(b)) return null
    val off = le32(10); val w = le32(18); val h = le32(22)
    // Long stride: 3*w overflows Int for a crafted width field; the
    // division form of the bounds check is immune to strideL*h itself
    // overflowing Long (w AND h near Int.MaxValue) — headerOk ensures
    // h > 0, and for h > 0, (len-off)/h ≥ strideL ⟺ len ≥ off+strideL*h
    val strideL = ((3L * w + 3) / 4) * 4
    if (off < 54 || off > b.length || (b.length - off) / h < strideL)
      return null
    val stride = strideL.toInt
    val sums = new Array[Long](3)
    var r = 0
    while (r < h) {
      val base = off + r * stride
      var x = 0
      while (x < w) {
        sums(0) += (b(base + 3 * x) & 0xFF)       // B
        sums(1) += (b(base + 3 * x + 1) & 0xFF)   // G
        sums(2) += (b(base + 3 * x + 2) & 0xFF)   // R
        x += 1
      }
      r += 1
    }
    val n = w.toLong * h
    Array(w.toDouble, h.toDouble,
      sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
  }

  /** The decode pipeline end-to-end with a REAL decoder: per-partition
    * batches of opaque media bytes → [[decodeBmp]] → typed features. */
  def extractBmpFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // a codec impl would init once here, then stream the batch
      it.map(r => MediaFeatures(r.doc_id, r.format, r.n_bytes,
        decodeBmp(r.media)))
    }(Encoders.product[MediaFeatures])

  /** Media → feature-extract pipeline, oracle-checked end-to-end: valid
    * 24-bpp BMPs are built in-engine from per-doc geometry, flow through
    * the typed mapPartitions batch as opaque bytes, and [[decodeBmp]]
    * recovers geometry and channel means by actually walking the pixel
    * array. The oracle restates every output from the generating
    * formulas over an (x, y) grid — independent of both the builder and
    * the decoder, so a header/stride/row-order defect on either side
    * hash-mismatches. n_bytes checks the container math itself
    * (54-byte header + padded stride × height). */
  val featureExtract: Q = Q(
    "mm_feature_extract",
    """WITH g AS (
      |  SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 3 + 1 AS h
      |  FROM documents),
      |xs AS (SELECT doc_id, w, h, UNNEST(RANGE(0, w)) AS x FROM g),
      |px AS (SELECT doc_id, w, h, x, UNNEST(RANGE(0, h)) AS y FROM xs),
      |sums AS (
      |  SELECT doc_id, w, h,
      |    SUM((doc_id + 7 * x + 13 * y) % 256) AS sum_b,
      |    SUM((3 * doc_id + x) % 256) AS sum_g,
      |    SUM((x * y + doc_id) % 256) AS sum_r
      |  FROM px GROUP BY 1, 2, 3)
      |SELECT doc_id, 'bmp' AS fmt,
      |  CAST(54 + h * ((3 * w + 3) // 4 * 4) AS BIGINT) AS n_bytes,
      |  CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
      |  CAST(sum_b AS DOUBLE) / (w * h) AS mean_b,
      |  CAST(sum_g AS DOUBLE) / (w * h) AS mean_g,
      |  CAST(sum_r AS DOUBLE) / (w * h) AS mean_r
      |FROM sums
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.BmpPixels
    val media = BmpPixels.build(col("doc_id"),
      (col("doc_id") % 5 + 2).cast("int"), (col("doc_id") % 3 + 1).cast("int"))
    val records = documents(s, d)
      .select(col("doc_id"), media.as("media"), lit("bmp").as("format"),
        octet_length(media).cast("bigint").as("n_bytes"))
      .as(Encoders.product[MediaRecord])
    extractBmpFeatures(records)
      .toDF()
      .select(col("doc_id"), col("format").as("fmt"), col("n_bytes"),
        element_at(col("features"), 1).cast("bigint").as("w"),
        element_at(col("features"), 2).cast("bigint").as("h"),
        element_at(col("features"), 3).as("mean_b"),
        element_at(col("features"), 4).as("mean_g"),
        element_at(col("features"), 5).as("mean_r"))
      .orderBy("doc_id")
  }

  /** REAL (codec-free) header parsing under the oracle gate: valid PNG
    * IHDR bytes are constructed in-engine from per-doc geometry (unhex of
    * column-derived hex — magic ‖ IHDR ‖ width ‖ height), then parsed
    * BACK by [[graft.functions.MediaHeaders]]; the oracle states the
    * expected geometry directly, so any parser defect hash-mismatches. */
  val mediaHeaders: Q = Q(
    "mm_media_headers",
    """SELECT doc_id, 'png' AS fmt,
      |  (doc_id % 997 + 1) AS width,
      |  (doc_id % 499 + 1) AS height
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.MediaHeaders
    val png = unhex(concat(
      lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      lpad(hex((col("doc_id") % 997 + 1).cast("int")), 8, "0"),
      lpad(hex((col("doc_id") % 499 + 1).cast("int")), 8, "0"),
      lit("0806000000")))
    documents(s, d)
      .select(col("doc_id"), png.as("media"))
      .select(col("doc_id"),
        MediaHeaders.format(col("media")).as("fmt"),
        MediaHeaders.width(col("media")).cast("bigint").as("width"),
        MediaHeaders.height(col("media")).cast("bigint").as("height"))
      .orderBy("doc_id")
  }

  /** REAL codec-free pixel analytics: build a fully valid 24-bpp BMP
    * per doc (seed-derived pixels, non-zero row padding), then recover
    * channel sums and a position-weighted checksum by WALKING THE PIXEL
    * ARRAY ([[graft.functions.BmpPixels]] — header offset, stride,
    * bottom-up rows). The oracle computes the same statistics directly
    * from the generating formula over an (x, y) grid — fully independent
    * of both the builder and the parser, so a padding/stride/row-order
    * bug on either side hash-mismatches (the weighted sum is
    * position-sensitive; flips cannot cancel). */
  val bmpPixels: Q = Q(
    "mm_bmp_pixels",
    """WITH g AS (
      |  SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 3 + 1 AS h
      |  FROM documents),
      |xs AS (SELECT doc_id, w, h, UNNEST(RANGE(0, w)) AS x FROM g),
      |px AS (SELECT doc_id, w, h, x, UNNEST(RANGE(0, h)) AS y FROM xs),
      |sums AS (
      |  SELECT doc_id, w, h,
      |    CAST(SUM((x * y + doc_id) % 256) AS BIGINT) AS sum_r,
      |    CAST(SUM((3 * doc_id + x) % 256) AS BIGINT) AS sum_g,
      |    CAST(SUM((doc_id + 7 * x + 13 * y) % 256) AS BIGINT) AS sum_b,
      |    CAST(SUM((x + 1) * (y + 1) * ((x * y + doc_id) % 256)) AS BIGINT) AS wsum_r
      |  FROM px GROUP BY 1, 2, 3)
      |SELECT doc_id, 'bmp' AS fmt, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
      |  sum_r, sum_g, sum_b, wsum_r,
      |  CAST(sum_r AS DOUBLE) / (w * h) AS mean_r
      |FROM sums
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.{BmpPixels, MediaHeaders}
    val media = BmpPixels.build(col("doc_id"),
      (col("doc_id") % 5 + 2).cast("int"), (col("doc_id") % 3 + 1).cast("int"))
    documents(s, d)
      .select(col("doc_id"), media.as("media"))
      .select(col("doc_id"),
        MediaHeaders.format(col("media")).as("fmt"),
        MediaHeaders.width(col("media")).cast("bigint").as("w"),
        MediaHeaders.height(col("media")).cast("bigint").as("h"),
        BmpPixels.channelSum(col("media"), 2).as("sum_r"),
        BmpPixels.channelSum(col("media"), 1).as("sum_g"),
        BmpPixels.channelSum(col("media"), 0).as("sum_b"),
        BmpPixels.weightedSum(col("media"), 2).as("wsum_r"))
      .withColumn("mean_r",
        col("sum_r").cast("double") / (col("w") * col("h")))
      .select("doc_id", "fmt", "w", "h", "sum_r", "sum_g", "sum_b",
        "wsum_r", "mean_r")
      .orderBy("doc_id")
  }

  /** Audio-side header analytics: build a canonical RIFF/WAVE header per
    * row (seed-derived sample rate and channel count, little-endian
    * fields assembled in-engine), parse the rate back with the codegen'd
    * header walker, and derive the per-sample-rate corpus profile. The
    * oracle recomputes from the generating formula — independent of
    * builder AND parser, so an endianness slip on either side
    * hash-mismatches. */
  val wavStats: Q = Q(
    "mm_wav_stats",
    """SELECT sample_rate, COUNT(*) AS n_docs,
      |  CAST(SUM(n_samples) AS BIGINT) AS total_samples,
      |  CAST(SUM(n_samples) AS DOUBLE) / sample_rate / COUNT(*)
      |    AS avg_duration_s
      |FROM (SELECT doc_id,
      |        8000 + (doc_id % 8) * 4000 AS sample_rate,
      |        4000 + (doc_id % 11) * 1000 AS n_samples
      |      FROM documents)
      |GROUP BY sample_rate
      |ORDER BY sample_rate""".stripMargin) { (s, d) =>
    import graft.functions.MediaHeaders
    // little-endian 32-bit hex of an int column (RIFF fields are LE)
    def le32hex(x: Column): Column = concat(
      lpad(hex(x % 256), 2, "0"),
      lpad(hex((x.cast("long") / 256).cast("long") % 256), 2, "0"),
      lpad(hex((x.cast("long") / 65536).cast("long") % 256), 2, "0"),
      lpad(hex((x.cast("long") / 16777216).cast("long") % 256), 2, "0"))
    val rate = (lit(8000) + (col("doc_id") % 8) * 4000).cast("int")
    val wav = unhex(concat(
      lit("52494646"),           // "RIFF"
      le32hex(lit(36)),          // chunk size (header-only build)
      lit("57415645"),           // "WAVE"
      lit("666D7420"),           // "fmt "
      le32hex(lit(16)),          // fmt chunk size
      lit("0100"),               // PCM
      lit("0100"),               // mono
      le32hex(rate)))            // sample rate, LE at offset 24
    documents(s, d)
      .select(col("doc_id"), wav.as("media"),
        (lit(4000L) + (col("doc_id") % 11) * 1000L).as("n_samples"))
      .select(col("doc_id"), col("n_samples"),
        MediaHeaders.wavRate(col("media")).cast("bigint").as("sample_rate"))
      .groupBy("sample_rate")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_samples").cast("bigint").as("total_samples"),
        // rate is constant per group → exact BIGINT sum, then two double
        // divisions in fixed order (order-independent, oracle-exact)
        (sum("n_samples").cast("double") / col("sample_rate") /
          count(lit(1))).as("avg_duration_s"))
      .orderBy("sample_rate")
  }

  /** Heterogeneous-media dispatch — the multi-format shape a real
    * lakehouse meets: ONE binary column holding five different
    * containers (doc_id % 5 → PNG / GIF / BMP / JPEG / WAV, each built
    * in-engine with format-specific geometry formulas), parsed back by
    * ONE format-sniffing scan ([[graft.functions.MediaHeaders]] —
    * magic-byte dispatch inside the codegen'd walkers, so the mixed
    * corpus needs no per-format partitioning or UNION of scans). Image
    * rows yield geometry and NULL sample_rate; WAV rows the reverse.
    * The oracle restates every field from the generating formulas with
    * a CASE on the same dispatch key — per-format formulas are all
    * distinct, so a dispatch mix-up (e.g. GIF bytes parsed as BMP) or
    * an endianness slip (GIF LE vs PNG/JPEG BE) hash-mismatches. */
  val mixedHeaders: Q = Q(
    "mm_mixed_headers",
    """SELECT doc_id,
      |  CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
      |    WHEN 2 THEN 'bmp' WHEN 3 THEN 'jpeg' ELSE 'wav' END AS fmt,
      |  CASE doc_id % 5 WHEN 0 THEN doc_id % 509 + 1
      |    WHEN 1 THEN doc_id % 251 + 3 WHEN 2 THEN doc_id % 5 + 2
      |    WHEN 3 THEN doc_id % 499 + 4 END AS width,
      |  CASE doc_id % 5 WHEN 0 THEN doc_id % 253 + 1
      |    WHEN 1 THEN doc_id % 127 + 2 WHEN 2 THEN doc_id % 3 + 1
      |    WHEN 3 THEN doc_id % 241 + 5 END AS height,
      |  CASE doc_id % 5 WHEN 4 THEN 8000 + (doc_id % 8) * 4000
      |    END AS sample_rate
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.{BmpPixels, MediaHeaders}
    def be16hex(x: Column): Column = lpad(hex(x.cast("int")), 4, "0")
    def le16hex(x: Column): Column = concat(
      lpad(hex(x.cast("long") % 256), 2, "0"),
      lpad(hex((x.cast("long") / 256) % 256), 2, "0"))
    def le32hex(x: Column): Column = concat(
      lpad(hex(x.cast("long") % 256), 2, "0"),
      lpad(hex((x.cast("long") / 256) % 256), 2, "0"),
      lpad(hex((x.cast("long") / 65536) % 256), 2, "0"),
      lpad(hex((x.cast("long") / 16777216) % 256), 2, "0"))
    val id = col("doc_id")
    val png = unhex(concat(
      lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      lpad(hex((id % 509 + 1).cast("int")), 8, "0"),
      lpad(hex((id % 253 + 1).cast("int")), 8, "0"),
      lit("0806000000")))
    val gif = unhex(concat(
      lit("474946383961"),                       // "GIF89a"
      le16hex(id % 251 + 3), le16hex(id % 127 + 2),
      lit("F70000")))                            // GCT flags, bg, aspect
    val bmp = BmpPixels.build(id,
      (id % 5 + 2).cast("int"), (id % 3 + 1).cast("int"))
    val jpg = unhex(concat(
      lit("FFD8" + "FFC0" + "0011" + "08"),      // SOI ‖ SOF0 ‖ len ‖ prec
      be16hex(id % 241 + 5), be16hex(id % 499 + 4),
      lit("03")))                                // component count
    val rate = (lit(8000) + (id % 8) * 4000).cast("int")
    val wav = unhex(concat(
      lit("52494646"), le32hex(lit(36)),         // "RIFF" ‖ chunk size
      lit("57415645" + "666D7420"), le32hex(lit(16)),
      lit("0100" + "0100"),                      // PCM, mono
      le32hex(rate)))                            // sample rate, LE @24
    val m5 = id % 5
    val media = when(m5 === 0, png).when(m5 === 1, gif)
      .when(m5 === 2, bmp).when(m5 === 3, jpg).otherwise(wav)
    documents(s, d)
      .select(id, media.as("media"))
      .select(id,
        MediaHeaders.format(col("media")).as("fmt"),
        MediaHeaders.width(col("media")).cast("bigint").as("width"),
        MediaHeaders.height(col("media")).cast("bigint").as("height"),
        MediaHeaders.wavRate(col("media")).cast("bigint").as("sample_rate"))
      .orderBy("doc_id")
  }

  /** Exact nearest-neighbor RESIZE over the BMP pixel array: output
    * pixel (x', y') of the fixed 3×2 target reads source pixel
    * (⌊x'·w/3⌋, ⌊y'·h/2⌋) — the standard thumbnail/downsample step of
    * an image-preprocessing pipeline, in all-integer index math so the
    * result is exactly reproducible by formula (no filter kernel, no
    * float). The codegen'd walker touches only the 6 sampled source
    * bytes per channel per image (never materializes a resized copy);
    * the oracle recomputes the resampled sums from the generating
    * formula over the TARGET grid — independent of builder and walker,
    * and the (x'+1)·(y'+1)-weighted sum pins the mapping direction, so
    * an off-by-one in the index math or a row-order slip
    * hash-mismatches. One scan, no shuffle, at any corpus size. */
  val resize: Q = Q(
    "mm_resize",
    """WITH g AS (
      |  SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 3 + 1 AS h
      |  FROM documents),
      |xs AS (SELECT doc_id, w, h, UNNEST(RANGE(0, 3)) AS xx FROM g),
      |px AS (SELECT doc_id, w, h, xx, UNNEST(RANGE(0, 2)) AS yy FROM xs),
      |m AS (SELECT doc_id, xx, yy,
      |        (xx * w) // 3 AS sx, (yy * h) // 2 AS sy
      |      FROM px),
      |v AS (SELECT doc_id, xx, yy,
      |        (sx * sy + doc_id) % 256 AS r,
      |        (3 * doc_id + sx) % 256 AS gch,
      |        (doc_id + 7 * sx + 13 * sy) % 256 AS bch
      |      FROM m)
      |SELECT doc_id,
      |  CAST(3 AS BIGINT) AS rw, CAST(2 AS BIGINT) AS rh,
      |  CAST(SUM(r) AS BIGINT) AS rsum_r,
      |  CAST(SUM(gch) AS BIGINT) AS rsum_g,
      |  CAST(SUM(bch) AS BIGINT) AS rsum_b,
      |  CAST(SUM((xx + 1) * (yy + 1) * r) AS BIGINT) AS rwsum_r
      |FROM v GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.BmpPixels
    val media = BmpPixels.build(col("doc_id"),
      (col("doc_id") % 5 + 2).cast("int"), (col("doc_id") % 3 + 1).cast("int"))
    documents(s, d)
      .select(col("doc_id"), media.as("media"))
      .select(col("doc_id"),
        lit(3L).as("rw"), lit(2L).as("rh"),
        BmpPixels.resampleSum(col("media"), 3, 2, 2).as("rsum_r"),
        BmpPixels.resampleSum(col("media"), 3, 2, 1).as("rsum_g"),
        BmpPixels.resampleSum(col("media"), 3, 2, 0).as("rsum_b"),
        BmpPixels.resampleSum(col("media"), 3, 2, 2, weighted = true)
          .as("rwsum_r"))
      .orderBy("doc_id")
  }

  /** Frame sampling over ANIMATED GIF containers — the every-k-th-frame
    * selection step of a video-preprocessing pipeline, on the one
    * mainstream animation container whose frame structure walks without
    * a codec ([[graft.functions.GifFrames]]). Each doc gets a
    * structurally valid multi-frame GIF89a (seed-derived per-frame
    * delay/geometry, opaque LZW payload sub-blocks); the codegen'd
    * walker re-parses the block structure — pairing graphic-control
    * delays with their image descriptors, skipping payloads by declared
    * size — and folds frame count, total animation delay, and the
    * k=2-sampled checksum Σ (i+1)·(delay_i + w_i·h_i), which is
    * order/geometry/timing-sensitive so a mis-skipped sub-block or
    * mispaired delay cannot cancel. The oracle recomputes all three
    * from the generating formulas — independent of builder AND walker.
    * One scan, no shuffle, no codec library, at any corpus size. */
  val gifFrames: Q = Q(
    "mm_gif_frames",
    """WITH g AS (SELECT doc_id, doc_id % 4 + 1 AS n FROM documents),
      |f AS (SELECT doc_id, n, UNNEST(RANGE(0, n)) AS i FROM g),
      |d AS (SELECT doc_id, n, i,
      |        (doc_id + 3 * i) % 50 + 1 AS delay,
      |        (i % 3 + 1) * ((doc_id + i) % 2 + 1) AS area
      |      FROM f)
      |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_frames,
      |  CAST(SUM(delay) AS BIGINT) AS total_delay_cs,
      |  CAST(SUM(CASE WHEN i % 2 = 0 THEN (i + 1) * (delay + area)
      |            ELSE 0 END) AS BIGINT) AS sampled_sum
      |FROM d GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.GifFrames
    val media = GifFrames.build(col("doc_id"),
      (col("doc_id") % 4 + 1).cast("int"))
    documents(s, d)
      .select(col("doc_id"), media.as("media"))
      .select(col("doc_id"),
        GifFrames.frameCount(col("media")).as("n_frames"),
        GifFrames.totalDelay(col("media")).as("total_delay_cs"),
        GifFrames.sampledSum(col("media"), 2).as("sampled_sum"))
      .orderBy("doc_id")
  }

  /** SAMPLE-level PCM audio features — the audio analogue of
    * [[bmpPixels]]: build a fully valid RIFF/WAVE per doc (seed-derived
    * rate and length, an ODD-sized LIST filler chunk between fmt and
    * data so a fixed-offset-44 parser reads garbage and the RIFF
    * even-padding rule is exercised), then re-walk the container with
    * the codegen'd chunk walker ([[graft.functions.PcmSamples]]) for
    * energy Σv², peak, zero crossings, and an every-4th-sample
    * position-weighted decimation checksum (audio downsampling —
    * the every-k-th analogue of [[gifFrames]]' frame sampling).
    * duration_ms comes from the PARSED rate and count (integer division
    * — exact on both engines). The oracle recomputes everything from
    * the generating formula v_i = ((doc_id·31 + i·37) mod 65536) −
    * 32768 — independent of builder AND walker, so an endianness,
    * stride, or chunk-skip slip on either side hash-mismatches. One
    * map-side scan, no shuffle, no codec. */
  val pcmFeatures: Q = Q(
    "mm_pcm_features",
    """WITH p AS (SELECT doc_id,
      |        8000 + (doc_id % 8) * 4000 AS rate,
      |        400 + (doc_id % 13) * 40 AS n
      |      FROM documents),
      |s AS (SELECT doc_id, rate, n, UNNEST(RANGE(0, n)) AS i FROM p),
      |v AS (SELECT doc_id, rate, n, i,
      |        ((doc_id * 31 + i * 37) % 65536) - 32768 AS v,
      |        CASE WHEN i > 0 THEN
      |          ((doc_id * 31 + (i - 1) * 37) % 65536) - 32768 END AS pv
      |      FROM s)
      |SELECT doc_id,
      |  CAST(MAX(rate) AS BIGINT) AS sample_rate,
      |  CAST(MAX(n) AS BIGINT) AS n_samples,
      |  CAST(MAX(n) * 1000 // MAX(rate) AS BIGINT) AS duration_ms,
      |  CAST(SUM(v * v) AS BIGINT) AS energy,
      |  CAST(MAX(ABS(v)) AS BIGINT) AS peak,
      |  CAST(SUM(CASE WHEN i > 0 AND ((v < 0) <> (pv < 0))
      |            THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
      |  CAST(SUM(CASE WHEN i % 4 = 0 THEN (i // 4 + 1) * v
      |            ELSE 0 END) AS BIGINT) AS decim_checksum
      |FROM v GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.PcmSamples
    val media = PcmSamples.build(col("doc_id"),
      lit(8000) + (col("doc_id") % 8) * 4000,
      lit(400) + (col("doc_id") % 13) * 40)
    documents(s, d)
      .select(col("doc_id"), media.as("media"))
      .select(col("doc_id"),
        PcmSamples.sampleRate(col("media")).as("sample_rate"),
        PcmSamples.sampleCount(col("media")).as("n_samples"),
        PcmSamples.energy(col("media")).as("energy"),
        PcmSamples.peak(col("media")).as("peak"),
        PcmSamples.zeroCrossings(col("media")).as("zero_crossings"),
        PcmSamples.decimatedChecksum(col("media"), 4).as("decim_checksum"))
      // integer division over the PARSED rate/count — exact cross-engine
      .withColumn("duration_ms", expr("n_samples * 1000 DIV sample_rate"))
      .select("doc_id", "sample_rate", "n_samples", "duration_ms",
        "energy", "peak", "zero_crossings", "decim_checksum")
      .orderBy("doc_id")
  }

  /** CHUNK-level PNG integrity audit — the bit-rot-detection slice of
    * the multimodal story: build a structurally valid multi-chunk PNG
    * per doc (real CRC-32 on every chunk; docs with doc_id % 5 == 0 get
    * one flipped CRC bit simulating storage corruption), then re-walk
    * the chunk grammar with the codegen'd walker
    * ([[graft.functions.PngChunks]]) counting chunks, summing IDAT
    * payload bytes WITHOUT inflating them, and recomputing each CRC-32
    * against the stored value. The oracle derives all three from the
    * generating formulas — independent of builder and walker, so a
    * length-field, skip, or CRC slip on either side hash-mismatches.
    * One map-side scan, no shuffle, no codec: integrity-auditing a
    * 100 TB media lake is exactly this plan. */
  val pngChunks: Q = Q(
    "mm_png_chunks",
    """SELECT doc_id,
      |  CAST((doc_id % 3 + 1) + (doc_id % 4 + 1) + 2 AS BIGINT) AS n_chunks,
      |  CAST(LIST_REDUCE(
      |    LIST_TRANSFORM(RANGE(0, doc_id % 4 + 1), i -> (doc_id + 7 * i) % 13 + 1),
      |    (a, b) -> a + b) AS BIGINT) AS idat_bytes,
      |  CAST((doc_id % 3 + 1) + (doc_id % 4 + 1) + 2
      |    - CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS crc_ok_chunks,
      |  doc_id % 5 <> 0 AS intact
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.PngChunks
    documents(s, d)
      .select(col("doc_id"), PngChunks.build(col("doc_id")).as("media"))
      .select(col("doc_id"),
        PngChunks.chunkCount(col("media")).as("n_chunks"),
        PngChunks.idatBytes(col("media")).as("idat_bytes"),
        PngChunks.crcValidCount(col("media")).as("crc_ok_chunks"))
      .withColumn("intact", col("crc_ok_chunks") === col("n_chunks"))
      .orderBy("doc_id")
  }

  /** IFD-level TIFF/EXIF metadata walk — the dual-endianness slice of
    * the multimodal story: build a structurally valid single-IFD TIFF
    * per doc (even doc_ids little-endian `II`, odd doc_ids big-endian
    * `MM` — so ONE walker code path must read every 16/32-bit field in
    * either byte order), then re-parse the directory with the codegen'd
    * walker ([[graft.functions.TiffTags]]) for entry count, ImageWidth,
    * ImageLength, and a Σ tag·value checksum over the inline values.
    * The oracle computes all four from the generating formulas — and is
    * byte-order-blind, so an endianness slip on either side
    * hash-mismatches half the corpus. One map-side scan, no shuffle,
    * no codec: EXIF inventory over a 100 TB media lake is this plan. */
  val tiffTags: Q = Q(
    "mm_tiff_tags",
    """SELECT doc_id,
      |  CAST(3 + doc_id % 3 AS BIGINT) AS n_tags,
      |  CAST(doc_id % 977 + 1 AS BIGINT) AS width,
      |  CAST(doc_id % 433 + 1 AS BIGINT) AS height,
      |  CAST(256 * (doc_id % 977 + 1) + 257 * (doc_id % 433 + 1) + 259
      |    + LIST_REDUCE(LIST_PREPEND(0::BIGINT,
      |        LIST_TRANSFORM(RANGE(0, doc_id % 3),
      |          i -> (32768 + i) * ((doc_id * 31 + i) % 65536))),
      |      (a, b) -> a + b) AS BIGINT) AS tag_checksum
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.TiffTags
    documents(s, d)
      .select(col("doc_id"), TiffTags.build(col("doc_id")).as("media"))
      .select(col("doc_id"),
        TiffTags.entryCount(col("media")).as("n_tags"),
        TiffTags.width(col("media")).as("width"),
        TiffTags.height(col("media")).as("height"),
        TiffTags.tagChecksum(col("media")).as("tag_checksum"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(binaryMeta, featureExtract, mediaHeaders, bmpPixels,
    wavStats, mixedHeaders, resize, gifFrames, pcmFeatures, pngChunks,
    tiffTags)
}
