package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-format header parsing for opaque image payloads — REAL
  * multimodal capability that needs no codec library: PNG / GIF / BMP /
  * JPEG dimensions are plain byte arithmetic over the first bytes of the
  * payload (PNG IHDR big-endian, GIF/BMP little-endian, JPEG start-of-frame
  * marker scan with fill-byte tolerance). Returns
  * `struct<format string, width int, height int>`, NULL when the payload is
  * not a recognized container or is truncated before the dimension fields.
  *
  * Whole-stage codegen'd (the generated code calls the same static parser
  * as interpreted eval), so a 100 TB metadata sweep stays a projection —
  * only the header bytes are touched per row. The pixel DECODE stays behind
  * `Multimodal.DecodeStub` (no codec libraries in this container); header
  * metadata is the part a data pipeline filters and partitions on.
  */
case class ImageDimsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageDimsExpr.schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_dims requires a binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ImageDimsExpr.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageDimsExpr.parse($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): ImageDimsExpr =
    copy(child = newChild)
}

object ImageDimsExpr {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    InternalRow(UTF8String.fromString(fmt), w, h)

  /** Called from both interpreted eval and generated code. Null = not a
    * recognized container / truncated header. */
  def parse(b: Array[Byte]): InternalRow = {
    def u(i: Int): Int = b(i) & 0xFF
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def be32(i: Int): Int = (u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Int = u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)

    if (b.length >= 24 && u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G' &&
        u(4) == 0x0D && u(5) == 0x0A && u(6) == 0x1A && u(7) == 0x0A) {
      // 8-byte signature, then the IHDR chunk MUST be first: 4-byte length
      // 13, type "IHDR", then BE32 w, h (both positive per spec)
      if (be32(8) != 13 || u(12) != 'I' || u(13) != 'H' || u(14) != 'D' || u(15) != 'R')
        return null
      val w = be32(16); val h = be32(20)
      if (w <= 0 || h <= 0) null else row("png", w, h)
    } else if (b.length >= 10 && u(0) == 'G' && u(1) == 'I' && u(2) == 'F' &&
        u(3) == '8' && (u(4) == '7' || u(4) == '9') && u(5) == 'a')
      row("gif", le16(6), le16(8))
    else if (b.length >= 26 && u(0) == 'B' && u(1) == 'M') {
      // dispatch on the DIB header size at offset 14: 12 = BITMAPCOREHEADER
      // (LE16 dims), 40/52/56/108/124 = BITMAPINFOHEADER family (LE32 dims,
      // height may be negative = top-down rows); anything else is not a BMP
      le32(14) match {
        case 12 =>
          val w = le16(18); val h = le16(20)
          if (w <= 0 || h <= 0) null else row("bmp", w, h)
        case 40 | 52 | 56 | 108 | 124 =>
          val w = le32(18); val h0 = le32(22)
          if (w <= 0 || h0 == 0 || h0 == Int.MinValue) null
          else row("bmp", w, math.abs(h0))
        case _ => null
      }
    } else if (b.length >= 4 && u(0) == 0xFF && u(1) == 0xD8) {
      // JPEG: scan segment markers for a start-of-frame (SOFn except the
      // DHT/JPG/DAC codes C4/C8/CC); tolerate fill bytes (repeated FF)
      var i = 2
      while (i + 1 < b.length) {
        if (u(i) != 0xFF) return null
        var j = i + 1
        while (j < b.length && u(j) == 0xFF) j += 1 // fill bytes
        if (j >= b.length) return null
        val m = u(j)
        if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i = j + 1 // standalone
        else if (m == 0xD9) return null // EOI before any SOF
        else {
          val pos = j + 1 // segment length field
          if (pos + 1 >= b.length) return null
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            // SOF: len(2) precision(1) height(BE16) width(BE16)
            if (pos + 6 >= b.length) return null
            return row("jpeg", be16(pos + 5), be16(pos + 3))
          }
          i = pos + be16(pos)
        }
      }
      null
    } else null
  }

  def imageDims(bytes: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ImageDimsExpr(org.apache.spark.sql.GraftSqlBridge.expression(bytes)))
}
