package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Third multimodal batch — the two big compressed-container formats
  * the battery was still missing: JPEG/JFIF (marker-segment grammar)
  * and ISO-BMFF MP4 (box grammar). Both are pure codec-free structure
  * walks ([[graft.functions.JpegSegments]], [[graft.functions.Mp4Boxes]]):
  * dimensions, segment/box censuses, payload byte totals, and
  * timescale/duration all live in the container structure, not the
  * codec stream. Each query is build → walk in ONE map-side projection
  * (codegen'd end to end, no shuffle before the presentation sort);
  * the oracles restate every output from the generating formulas, so
  * a length-field, nesting, or endianness slip on either side
  * hash-mismatches. */
object Multimodal3 {

  /** JPEG marker-segment inventory: segment census, SOF0 dimensions,
    * entropy-coded scan length, DQT table sum (the quality proxy —
    * quant tables ARE the JPEG quality setting, so Σ entries inventories
    * compression aggressiveness across a lake without decoding). */
  val jpegSegments: Q = Q(
    "mm_jpeg_segments",
    """SELECT doc_id,
      |  CAST(6 + doc_id % 3 AS BIGINT) AS n_segments,
      |  CAST(doc_id % 997 + 1 AS BIGINT) AS width,
      |  CAST(doc_id % 499 + 1 AS BIGINT) AS height,
      |  CAST(doc_id % 251 + 1 AS BIGINT) AS entropy_bytes,
      |  CAST(LIST_REDUCE(LIST_TRANSFORM(RANGE(0, 64),
      |      j -> (doc_id + j) % 256), (a, b) -> a + b) AS BIGINT) AS dqt_sum
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.JpegSegments
    documents(s, d)
      .select(col("doc_id"), JpegSegments.build(col("doc_id")).as("media"))
      .select(col("doc_id"),
        JpegSegments.segmentCount(col("media")).as("n_segments"),
        JpegSegments.width(col("media")).as("width"),
        JpegSegments.height(col("media")).as("height"),
        JpegSegments.entropyBytes(col("media")).as("entropy_bytes"),
        JpegSegments.dqtSum(col("media")).as("dqt_sum"))
      .orderBy("doc_id")
  }

  /** ISO-BMFF box inventory: top-level box census, total mdat payload
    * (the "how much of this lake is actual media" number), and the
    * moov→mvhd timescale/duration pair (clip length = duration/
    * timescale — the nested-walk proof). */
  val mp4Boxes: Q = Q(
    "mm_mp4_boxes",
    """SELECT doc_id,
      |  CAST(4 + doc_id % 3 AS BIGINT) AS n_boxes,
      |  CAST(LIST_REDUCE(LIST_TRANSFORM(RANGE(0, doc_id % 3 + 1),
      |      i -> (doc_id + 13 * i) % 4093 + 1), (a, b) -> a + b)
      |    AS BIGINT) AS mdat_bytes,
      |  CAST(doc_id % 9973 + 1 AS BIGINT) AS timescale,
      |  CAST(doc_id % 86400 + 1 AS BIGINT) AS duration
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.Mp4Boxes
    documents(s, d)
      .select(col("doc_id"), Mp4Boxes.build(col("doc_id")).as("media"))
      .select(col("doc_id"),
        Mp4Boxes.boxCount(col("media")).as("n_boxes"),
        Mp4Boxes.mdatBytes(col("media")).as("mdat_bytes"),
        Mp4Boxes.timescale(col("media")).as("timescale"),
        Mp4Boxes.duration(col("media")).as("duration"))
      .orderBy("doc_id")
  }

  /** ID3v2.3 audio-metadata inventory: frame census, payload bytes,
    * title length, parsed track number, declared syncsafe tag size —
    * with end-to-end structure validation (frames + padding must tile
    * the declared size). The oracle restates everything from the
    * generating formulas, including the ASCII-digit length of the
    * track number. */
  val id3Tags: Q = Q(
    "mm_id3_tags",
    """SELECT doc_id,
      |  CAST(3 + doc_id % 3 AS BIGINT) AS n_frames,
      |  CAST((1 + doc_id % 23 + 1) + (1 + doc_id % 17 + 1)
      |    + (1 + LENGTH(CAST(doc_id % 99 + 1 AS VARCHAR)))
      |    + LIST_REDUCE(LIST_PREPEND(0::BIGINT, LIST_TRANSFORM(RANGE(0, doc_id % 3),
      |        i -> (doc_id + 5 * i) % 29 + 5)), (a, b) -> a + b)
      |    AS BIGINT) AS payload_bytes,
      |  CAST(doc_id % 23 + 1 AS BIGINT) AS title_len,
      |  CAST(doc_id % 99 + 1 AS BIGINT) AS track,
      |  CAST((1 + doc_id % 23 + 1) + (1 + doc_id % 17 + 1)
      |    + (1 + LENGTH(CAST(doc_id % 99 + 1 AS VARCHAR)))
      |    + LIST_REDUCE(LIST_PREPEND(0::BIGINT, LIST_TRANSFORM(RANGE(0, doc_id % 3),
      |        i -> (doc_id + 5 * i) % 29 + 5)), (a, b) -> a + b)
      |    + 10 * (3 + doc_id % 3) + doc_id % 33 AS BIGINT) AS tag_size
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.Id3Tags
    documents(s, d)
      .select(col("doc_id"), Id3Tags.build(col("doc_id")).as("media"))
      .select(col("doc_id"),
        Id3Tags.frameCount(col("media")).as("n_frames"),
        Id3Tags.payloadBytes(col("media")).as("payload_bytes"),
        Id3Tags.titleLength(col("media")).as("title_len"),
        Id3Tags.trackNumber(col("media")).as("track"),
        Id3Tags.tagSize(col("media")).as("tag_size"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(jpegSegments, mp4Boxes, id3Tags)
}
