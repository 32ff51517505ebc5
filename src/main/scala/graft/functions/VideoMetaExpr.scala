package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video-container header metadata — the MP4/ISO-BMFF sibling of
  * [[ImageDimsExpr]] / [[AudioMetaExpr]]: duration comes from the
  * `moov/mvhd` box (duration ÷ timescale), display dimensions from the
  * first `moov/trak/tkhd` box (16.16 fixed-point width/height). A plain
  * nested box scan over the leading bytes — no codec library; only header
  * bytes are touched. Returns
  * `struct<format string, duration_ms bigint, width int, height int>`,
  * NULL when the payload is not an ISO-BMFF container or moov/mvhd is
  * missing/truncated (tkhd absent → null dims, metadata still returned).
  * Whole-stage codegen'd. */
case class VideoMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VideoMetaExpr.schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"video_meta requires a binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    VideoMetaExpr.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VideoMetaExpr.parse($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): VideoMetaExpr =
    copy(child = newChild)
}

object VideoMetaExpr {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Called from both interpreted eval and generated code. All offset
    * arithmetic is in LONG space (a crafted 32-bit box size near
    * Int.MaxValue must bail out, not wrap negative and crash the task). */
  def parse(b: Array[Byte]): InternalRow = {
    def u(i: Long): Int = b(i.toInt) & 0xFF
    def be32(i: Long): Long =
      (u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Long, s: String): Boolean =
      s.indices.forall(k => u(i + k) == s.charAt(k))

    val len = b.length.toLong
    if (len < 16) return null

    /** Find a child box `name` inside [from, to); returns (payloadStart,
      * payloadEnd) of the box body after the 8-byte header, or null. Box
      * grammar: (size BE32)(type 4)(body); size==0 → box runs to `to`;
      * size==1 (64-bit largesize) and malformed sizes → bail. */
    def findBox(name: String, from: Long, to: Long): Array[Long] = {
      var i = from
      while (i + 8 <= to) {
        val size = be32(i)
        val end = if (size == 0) to else i + size
        if (size == 1 || (size != 0 && size < 8) || end > to) return null
        if (tag(i + 4, name)) return Array(i + 8, end)
        i = end
      }
      null
    }

    // ISO-BMFF sniff: a well-formed leading box whose type is ftyp (the
    // conventional first box) — anything else is not a video container here
    if (!tag(4, "ftyp") || be32(0) < 16) return null

    val moov = findBox("moov", 0, len)
    if (moov == null) return null
    val mvhd = findBox("mvhd", moov(0), moov(1))
    if (mvhd == null) return null
    // mvhd v0: verflags(4) ctime(4) mtime(4) timescale(4) duration(4)
    // mvhd v1: verflags(4) ctime(8) mtime(8) timescale(4) duration(8)
    val mv = mvhd(0)
    if (mv + 4 > mvhd(1)) return null
    val mvVer = u(mv)
    val (timescale, duration) =
      if (mvVer == 0) {
        if (mv + 20 > mvhd(1)) return null
        (be32(mv + 12), be32(mv + 16))
      } else if (mvVer == 1) {
        if (mv + 32 > mvhd(1)) return null
        (be32(mv + 20), be64(mv + 24))
      } else return null
    if (timescale <= 0 || duration < 0) return null
    // v0 all-ones duration is the ISO-BMFF "unknown" sentinel, not ~49 days
    if (mvVer == 0 && duration == 0xFFFFFFFFL) return null
    // duration*1000 must not overflow Long (a crafted v1 64-bit duration
    // > ~9.2e15 would wrap negative AFTER the sign check above)
    if (duration > Long.MaxValue / 1000L) return null
    val durationMs = duration * 1000L / timescale

    // first trak's tkhd → 16.16 fixed-point display dims (absent → null dims)
    var width: Any = null
    var height: Any = null
    val trak = findBox("trak", moov(0), moov(1))
    if (trak != null) {
      val tkhd = findBox("tkhd", trak(0), trak(1))
      if (tkhd != null && tkhd(0) + 4 <= tkhd(1)) {
        val tk = tkhd(0)
        // v0: verflags(4) ctime(4) mtime(4) id(4) res(4) dur(4) res(8)
        //     layer(2) alt(2) vol(2) res(2) matrix(36) w(4) h(4) → w @ +76
        // v1: ctime/mtime/duration widen to 8 → w @ +88
        val off = u(tk) match { case 0 => 76L; case 1 => 88L; case _ => -1L }
        if (off > 0 && tk + off + 8 <= tkhd(1)) {
          width = (be32(tk + off) >>> 16).toInt
          height = (be32(tk + off + 4) >>> 16).toInt
        }
      }
    }
    InternalRow(UTF8String.fromString("mp4"), durationMs, width, height)
  }

  def videoMeta(bytes: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      VideoMetaExpr(org.apache.spark.sql.GraftSqlBridge.expression(bytes)))
}
