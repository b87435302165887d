package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Fourth multimodal batch — the two container grammars the battery
  * was still missing, each exercising a parsing class no earlier
  * walker needed: EBML/Matroska (WebM), whose element IDs and sizes
  * are variable-length integers so every offset is data-dependent
  * ([[graft.functions.EbmlTree]]); and ZIP, whose entry point is the
  * end-of-central-directory record found by a BACKWARD scan past a
  * variable-length comment ([[graft.functions.ZipDirectory]]) — the
  * shard-container inventory case for training corpora. Both queries
  * are build → walk in one map-side projection (codegen'd, no shuffle
  * before the presentation sort); the oracles restate every output
  * from the generating formulas, so a VINT-width, tiling, or
  * endianness slip on either side hash-mismatches. */
object Multimodal4 {

  /** WebM/Matroska element-tree inventory: full-depth element census,
    * media (Cluster) payload bytes, the Info→TimestampScale value, and
    * the cluster count. */
  val ebmlTree: Q = Q(
    "mm_ebml_tree",
    """SELECT doc_id,
      |  CAST(4 + doc_id % 4 + 1 AS BIGINT) AS n_elements,
      |  CAST(LIST_REDUCE(LIST_TRANSFORM(RANGE(0, doc_id % 4 + 1),
      |      i -> (doc_id + 7 * i) % 199 + 1), (a, b) -> a + b)
      |    AS BIGINT) AS cluster_bytes,
      |  CAST(doc_id % 999983 + 1 AS BIGINT) AS timestamp_scale,
      |  CAST(doc_id % 4 + 1 AS BIGINT) AS n_clusters
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.EbmlTree
    documents(s, d)
      .select(col("doc_id"), EbmlTree.build(col("doc_id")).as("media"))
      .select(col("doc_id"),
        EbmlTree.elementCount(col("media")).as("n_elements"),
        EbmlTree.clusterBytes(col("media")).as("cluster_bytes"),
        EbmlTree.timestampScale(col("media")).as("timestamp_scale"),
        EbmlTree.clusterCount(col("media")).as("n_clusters"))
      .orderBy("doc_id")
  }

  /** ZIP shard inventory out of the central directory alone: entry
    * census (validated against the EOCD count AND each entry's local
    * header signature), compressed/uncompressed byte totals, and the
    * deflate-method entry count — the compression-ratio numbers for an
    * archive lake without touching member payloads. */
  val zipDirectory: Q = Q(
    "mm_zip_directory",
    """SELECT doc_id,
      |  CAST(doc_id % 5 + 1 AS BIGINT) AS n_entries,
      |  CAST(LIST_REDUCE(LIST_TRANSFORM(RANGE(0, doc_id % 5 + 1),
      |      i -> (doc_id + 11 * i) % 509 + 1), (a, b) -> a + b)
      |    AS BIGINT) AS compressed_bytes,
      |  CAST(LIST_REDUCE(LIST_TRANSFORM(RANGE(0, doc_id % 5 + 1),
      |      i -> (doc_id + 11 * i) % 509 + 1 + (i % 3) * 17), (a, b) -> a + b)
      |    AS BIGINT) AS uncompressed_bytes,
      |  CAST(LIST_REDUCE(LIST_PREPEND(0::BIGINT,
      |      LIST_TRANSFORM(RANGE(0, doc_id % 5 + 1),
      |        i -> (doc_id + i) % 2)), (a, b) -> a + b)
      |    AS BIGINT) AS n_deflated
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.ZipDirectory
    documents(s, d)
      .select(col("doc_id"), ZipDirectory.build(col("doc_id")).as("media"))
      .select(col("doc_id"),
        ZipDirectory.entryCount(col("media")).as("n_entries"),
        ZipDirectory.compressedBytes(col("media")).as("compressed_bytes"),
        ZipDirectory.uncompressedBytes(col("media")).as("uncompressed_bytes"),
        ZipDirectory.deflateCount(col("media")).as("n_deflated"))
      .orderBy("doc_id")
  }

  /** FLAC STREAMINFO inventory out of the bit-packed parameter group:
    * sample rate (20 bits), channel count (3 bits), bit depth (5
    * bits), and total samples (36 bits) share one 64-bit word at
    * sub-byte offsets ([[graft.functions.FlacStreaminfo]]) — plus the
    * metadata-block census with last-flag chain validation. Duration
    * = samples/rate is the audio-lake inventory number this feeds. */
  val flacStreaminfo: Q = Q(
    "mm_flac_streaminfo",
    """SELECT doc_id,
      |  CAST(doc_id % 96000 + 8000 AS BIGINT) AS sample_rate,
      |  CAST(doc_id % 8 + 1 AS BIGINT) AS channels,
      |  CAST(doc_id % 25 + 8 AS BIGINT) AS bits_per_sample,
      |  CAST(doc_id % 999999937 + 1 AS BIGINT) AS total_samples,
      |  CAST(2 AS BIGINT) AS n_blocks,
      |  CAST(doc_id % 999999937 + 1 AS DOUBLE)
      |    / CAST(doc_id % 96000 + 8000 AS DOUBLE) AS duration_sec
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.FlacStreaminfo
    documents(s, d)
      .select(col("doc_id"), FlacStreaminfo.build(col("doc_id")).as("media"))
      .select(col("doc_id"),
        FlacStreaminfo.sampleRate(col("media")).as("sample_rate"),
        FlacStreaminfo.channels(col("media")).as("channels"),
        FlacStreaminfo.bitsPerSample(col("media")).as("bits_per_sample"),
        FlacStreaminfo.totalSamples(col("media")).as("total_samples"),
        FlacStreaminfo.blockCount(col("media")).as("n_blocks"),
        (FlacStreaminfo.totalSamples(col("media")).cast("double") /
          FlacStreaminfo.sampleRate(col("media")).cast("double"))
          .as("duration_sec"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(ebmlTree, zipDirectory, flacStreaminfo)
}
