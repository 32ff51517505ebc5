package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature expression: character-k-shingle MinHash of a
  * (pre-normalized) string in ONE pass, with full whole-stage codegen.
  *
  * Semantically identical to the HOF formulation
  * (`Dedup.minhashSignatureOfShingles(shinglesOfNorm(s,k), H)`): shingle i
  * is the UTF-8 substring of k code points starting at code point i;
  * base hash = xxhash64(shingle) (Spark seed 42); family member j =
  * base*C(j)+C(j) for seeded odd constants; output = per-j minimum.
  * Strings shorter than k hash as a single whole-string shingle.
  *
  * vs the HOF chain: no shingle-array materialization (~len strings/row),
  * no per-step Long boxing, stays inside WholeStageCodegen. This is the
  * custom-Expression escape hatch of SURVEY.md §4 ("custom Catalyst work
  * actually needed") — the rest of the engine is built-ins.
  */
@ExpressionDescription(
  usage = "minhash(normText, k, numHashes) - character-shingle MinHash signature")
case class MinHashExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  require(k >= 1 && numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash requires a string input, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    new GenericArrayData(MinHashExpr.signature(s, k, numHashes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kLit = k
    val nLit = numHashes
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sig = graft.functions.MinHashExpr.signature($c, $kLit, $nLit);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

object MinHashExpr {

  /** One-pass signature over UTF-8 bytes with code-point-aligned windows.
    * Called from both interpreted eval and generated code. */
  def signature(s: UTF8String, k: Int, nHashes: Int): Array[Long] = {
    val out = new Array[Long](nHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes()
    // code-point start offsets (byte positions)
    val nChars = s.numChars()
    val starts = new Array[Int](nChars + 1)
    var i = 0; var b = 0
    while (b < nBytes) {
      starts(i) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      i += 1
    }
    starts(nChars) = nBytes
    val nShingles = if (nChars < k) 1 else nChars - k + 1
    var sh = 0
    while (sh < nShingles) {
      val from = starts(sh)
      val to = if (nChars < k) nBytes else starts(sh + k)
      // seed chain identical to Spark's multi-arg xxhash64(shingle, j)
      val base42 = XXH64.hashUnsafeBytes(base, off + from, to - from, 42L)
      var j = 0
      while (j < nHashes) {
        val v = XXH64.hashLong(j.toLong, base42)
        if (v < out(j)) out(j) = v
        j += 1
      }
      sh += 1
    }
    out
  }

  /** Column wrapper. Input must be pre-normalized text (see
    * `TextAnalysis.normalizeText`). */
  def minhash(normText: Column, k: Int, numHashes: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MinHashExpr(org.apache.spark.sql.GraftSqlBridge.expression(normText), k, numHashes))
}
