package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Element-tree analytics over EBML containers (Matroska/WebM) — the
  * variable-length-integer slice of the multimodal story. EBML is the
  * one mainstream media grammar whose lengths are NOT fixed-width:
  * both element IDs and sizes are VINTs — the count of leading zero
  * bits in the first byte selects the total width, a marker bit
  * follows, and the value is the remaining bits. Walking it correctly
  * is therefore a different exercise from the RIFF/ISO-BMFF walkers:
  * every offset is data-dependent.
  *
  * [[buildEbml]] writes a structurally valid stream per seed: an EBML
  * header element, then a Segment containing an Info (with a 3-byte
  * TimestampScale) and seed-many Cluster elements with seed-derived
  * payload sizes. Sizes are deliberately written as 2-byte VINTs so
  * the walker's multi-byte path is exercised on every element.
  * [[ebmlWalk]] re-walks the tree, validating that children exactly
  * tile their containers and that no VINT is malformed (a 0x00 lead
  * byte has no marker inside 8 bits).
  *
  * Generating formulas (restated by the oracle, independent of builder
  * AND walker): nClusters = seed%4+1 → census = 4 + nClusters
  * (header, segment, info, timestampScale, clusters); cluster payload
  * i is (seed+7i)%199+1 bytes; timestampScale = seed%999983+1.
  */
object EbmlTree {

  private val IdHeader = 0x1A45DFA3L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdCluster = 0x1F43B675L

  /** A structurally valid EBML stream with seed-derived inventory. */
  def buildEbml(seed: Long): Array[Byte] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u8(v: Long): Unit = buf += (v & 0xFF).toByte
    // IDs are stored with their marker bit: width is implied by the
    // leading byte, so a 4-byte id is written raw big-endian
    def id(v: Long, width: Int): Unit = {
      var i = width - 1
      while (i >= 0) { u8(v >> (8 * i)); i -= 1 }
    }
    // sizes always as 2-byte VINTs (01xxxxxx xxxxxxxx, 14-bit payload)
    def size2(v: Long): Unit = { u8(0x40L | (v >> 8)); u8(v) }
    val ts = seed % 999983 + 1
    val nClusters = (seed % 4 + 1).toInt
    // EBML header: 4-byte payload (version fields, opaque to the walk)
    id(IdHeader, 4); size2(4); u8(1); u8(1); u8(1); u8(1)
    // Info = TimestampScale element (3-byte id, 3-byte payload)
    val tsScaleLen = 3 + 2 + 3 // id + size + payload
    val infoLen = 4 + 2 + tsScaleLen
    var clustersLen = 0L
    var i = 0
    while (i < nClusters) {
      clustersLen += 4 + 2 + ((seed + 7 * i) % 199 + 1)
      i += 1
    }
    id(IdSegment, 4); size2(infoLen + clustersLen)
    id(IdInfo, 4); size2(tsScaleLen)
    id(IdTimestampScale, 3); size2(3)
    u8(ts >> 16); u8(ts >> 8); u8(ts)
    i = 0
    while (i < nClusters) {
      val n = ((seed + 7 * i) % 199 + 1).toInt
      id(IdCluster, 4); size2(n)
      var j = 0
      while (j < n) { u8((seed + i + j) % 256); j += 1 }
      i += 1
    }
    buf.toArray
  }

  /** VINT at p in b (bounded by end): returns (width << 56) | value,
    * value with marker stripped when strip, kept for IDs. -1 if
    * malformed or out of bounds. */
  private def vint(b: Array[Byte], p: Int, end: Int, strip: Boolean): Long = {
    if (p >= end) return -1L
    val first = b(p) & 0xFF
    if (first == 0) return -1L // no marker within 8 bits
    val width = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (p + width > end) return -1L
    var v = if (strip) (first ^ (0x100 >> width)).toLong else first.toLong
    var i = 1
    while (i < width) { v = (v << 8) | (b(p + i) & 0xFF); i += 1 }
    (width.toLong << 56) | v
  }

  /** EBML tree walk; mode 0 = element census (all depths), 1 = total
    * Cluster payload bytes, 2 = TimestampScale value, 3 = Cluster
    * count. Returns -1 on any malformed structure (bad VINT, child
    * overrunning or not tiling its container). */
  def ebmlWalk(b: Array[Byte], mode: Int): Long = {
    if (b == null || b.length < 4) return -1L
    var census = 0L; var clusterBytes = 0L; var tsScale = -1L
    var nClusters = 0L
    def walk(start: Int, end: Int, depth: Int): Boolean = {
      var p = start
      while (p < end) {
        val idr = vint(b, p, end, strip = false)
        if (idr == -1L) return false
        val idW = (idr >> 56).toInt; val idV = idr & 0xFFFFFFFFFFFFFFL
        val szr = vint(b, p + idW, end, strip = true)
        if (szr == -1L) return false
        val szW = (szr >> 56).toInt; val sz = szr & 0xFFFFFFFFFFFFFFL
        val body = p + idW + szW
        if (body + sz > end) return false
        census += 1
        if (idV == IdSegment || idV == IdInfo) {
          if (!walk(body, body + sz.toInt, depth + 1)) return false
        } else if (idV == IdCluster) {
          nClusters += 1; clusterBytes += sz
        } else if (idV == IdTimestampScale) {
          var v = 0L; var i = 0
          while (i < sz) { v = (v << 8) | (b(body + i) & 0xFF); i += 1 }
          tsScale = v
        }
        p = body + sz.toInt
      }
      p == end // children must tile the container
    }
    if (!walk(0, b.length, 0)) return -1L
    if (mode == 0) census
    else if (mode == 1) clusterBytes
    else if (mode == 2) tsScale
    else nClusters
  }

  /** seed → EBML bytes (generator side of the round trip). */
  case class EbmlBuild(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "ebml_build"
    override def nullSafeEval(s: Any): Any = buildEbml(s.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = EbmlTree.getClass.getName.stripSuffix("$") + "$.MODULE$"
      defineCodeGen(ctx, ev, s => s"$cls.buildEbml($s)")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** VINT-tree fold (mode static); -1 sentinel → NULL. */
  case class EbmlStat(child: Expression, mode: Int) extends UnaryExpression {
    override def nullable: Boolean = true
    override def dataType: DataType = LongType
    override def prettyName: String = "ebml_stat"
    override def nullSafeEval(v: Any): Any = {
      val r = ebmlWalk(v.asInstanceOf[Array[Byte]], mode)
      if (r == -1L) null else r
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = EbmlTree.getClass.getName.stripSuffix("$") + "$.MODULE$"
      // freshName: stacked EbmlStats in one projection must not collide
      val r = ctx.freshName("r")
      nullSafeCodeGen(ctx, ev, c => s"""
        |long $r = $cls.ebmlWalk($c, $mode);
        |if ($r == -1L) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """.stripMargin)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def build(seed: Column): Column =
    ColumnBridge.column(EbmlBuild(ColumnBridge.expression(seed)))
  def elementCount(media: Column): Column =
    ColumnBridge.column(EbmlStat(ColumnBridge.expression(media), 0))
  def clusterBytes(media: Column): Column =
    ColumnBridge.column(EbmlStat(ColumnBridge.expression(media), 1))
  def timestampScale(media: Column): Column =
    ColumnBridge.column(EbmlStat(ColumnBridge.expression(media), 2))
  def clusterCount(media: Column): Column =
    ColumnBridge.column(EbmlStat(ColumnBridge.expression(media), 3))
}
