package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio-container header metadata — the audio sibling of
  * [[ImageDimsExpr]]: WAV (RIFF/WAVE) carries channels, sample rate and
  * bit depth in its `fmt ` chunk, reachable by a plain chunk scan over the
  * first bytes with no codec library. Returns
  * `struct<format string, channels int, sample_rate int, bits int>`, NULL
  * when the payload is not a recognized container or the fmt chunk is
  * missing/truncated. Whole-stage codegen'd; only header bytes are read. */
case class AudioMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMetaExpr.schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_meta requires a binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    AudioMetaExpr.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioMetaExpr.parse($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): AudioMetaExpr =
    copy(child = newChild)
}

object AudioMetaExpr {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType)))

  /** Called from both interpreted eval and generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    def u(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Int = u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    def tag(i: Int, s: String): Boolean =
      s.indices.forall(k => u(i + k) == s.charAt(k))

    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return null
    // chunk scan: (id 4)(size LE32)(payload, padded to even)
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(i + 4)
      if (size < 0) return null
      if (tag(i, "fmt ")) {
        // PCM fmt: audioFormat(2) channels(2) sampleRate(4) byteRate(4)
        // blockAlign(2) bitsPerSample(2)
        if (size < 16 || i + 8 + 16 > b.length) return null
        val channels = le16(i + 10)
        val rate = le32(i + 12)
        val bits = le16(i + 22)
        if (channels <= 0 || rate <= 0 || bits <= 0) return null
        return InternalRow(UTF8String.fromString("wav"), channels, rate, bits)
      }
      // advance in LONG space: a corrupt size near Int.MaxValue passes the
      // size<0 check but would wrap `i` negative in int arithmetic and read
      // b(negative) — same overflow hardening as ImageDimsExpr's BMP height
      val next = i.toLong + 8L + size.toLong + (size & 1).toLong
      if (next > b.length) return null
      i = next.toInt
    }
    null
  }

  def audioMeta(bytes: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      AudioMetaExpr(org.apache.spark.sql.GraftSqlBridge.expression(bytes)))
}
