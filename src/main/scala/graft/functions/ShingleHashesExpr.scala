package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-shingle hash expressions: one pass over the UTF-8 bytes of a
  * (pre-normalized) string, emitting `xxhash64(shingle)` for every shingle
  * position — bit-identical to hashing the materialized shingle strings
  * (`xxhash64` over the same bytes, Spark seed 42), with full whole-stage
  * codegen and ZERO per-shingle string allocation.
  *
  * Why they exist (guide §2.3 "shuffle keys and metadata instead of
  * payloads", §4 "eliminate non-codegen expressions in the hot path"): the
  * HOF formulation `transform(sequence(...), i => substr/slice+concat)`
  * materializes one string per position in interpreted per-element eval —
  * at corpus scale that is tens of millions of transient UTF8Strings per
  * scan whose ONLY consumer is a 64-bit hash. Downstream operators
  * (decontamination probes, duplicate-window aggregation) re-materialize
  * the string form solely for the tiny candidate subset that survives the
  * hash-keyed step. Cross-checked against the HOF formulation in OpsSpec.
  */

/** `xxhash64` of every character-k-shingle of `child` (code-point windows,
  * identical to `TextAnalysis.shinglesOfNorm(norm, k)` then `xxhash64`):
  * element i = hash of the substring of k code points starting at code
  * point i; strings shorter than k yield ONE whole-string hash. */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleHashesExpr.hashes(input.asInstanceOf[UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("shHashes")
      s"""
         |long[] $arr = graft.functions.ShingleHashesExpr.hashes($c, $k);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleHashesExpr {

  /** Called from both interpreted eval and generated code. */
  def hashes(s: UTF8String, k: Int): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes()
    val nChars = s.numChars()
    // code-point start offsets (byte positions), as in MinHashExpr
    val starts = new Array[Int](nChars + 1)
    var i = 0; var b = 0
    while (b < nBytes) {
      starts(i) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      i += 1
    }
    starts(nChars) = nBytes
    val nShingles = if (nChars < k) 1 else nChars - k + 1
    val out = new Array[Long](nShingles)
    var sh = 0
    while (sh < nShingles) {
      val from = starts(sh)
      val to = if (nChars < k) nBytes else starts(sh + k)
      out(sh) = XXH64.hashUnsafeBytes(base, off + from, to - from, 42L)
      sh += 1
    }
    out
  }

  /** Column wrapper. Input must be pre-normalized text. */
  def shingleHashes(normText: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ShingleHashesExpr(org.apache.spark.sql.GraftSqlBridge.expression(normText), k))
}

/** `xxhash64` of every w-word window of a SINGLE-SPACE-SEPARATED string
  * (the [[graft.ops.TextAnalysis.normalizeText]] form): element p = hash of
  * the byte range covering words p..p+w-1 — because the words are a
  * single-space split of the string, that range is byte-identical to
  * `concat_ws(" ", slice(split(norm, " "), p+1, w))`, the formulation this
  * replaces (asserted in OpsSpec). Yields an EMPTY array when the string
  * has fewer than w words or its first word is empty (the empty-text
  * sentinel of the word-split), mirroring the row filter it absorbs. */
case class WordWindowHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 2, s"w must be >= 2, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_window_hashes requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WordWindowHashesExpr.hashes(input.asInstanceOf[UTF8String], w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("winHashes")
      s"""
         |long[] $arr = graft.functions.WordWindowHashesExpr.hashes($c, $w);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordWindowHashesExpr =
    copy(child = newChild)
}

object WordWindowHashesExpr {

  private val empty = new Array[Long](0)

  /** Called from both interpreted eval and generated code. */
  def hashes(s: UTF8String, w: Int): Array[Long] = {
    val nBytes = s.numBytes()
    // first word empty (empty text or leading space) → no windows,
    // matching the `_ws[0] != ""` row filter of the HOF formulation
    if (nBytes == 0 || s.getByte(0) == ' '.toByte) return empty
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // word start offsets of the single-space split: word 0 starts at 0,
    // word i+1 starts after the i-th 0x20 byte (space is single-byte in
    // UTF-8, so a byte scan is code-point safe)
    var nWords = 1
    var b = 0
    while (b < nBytes) {
      if (s.getByte(b) == ' '.toByte) nWords += 1
      b += 1
    }
    if (nWords < w) return empty
    val wordStart = new Array[Int](nWords + 1)
    wordStart(0) = 0
    var wi = 1
    b = 0
    while (b < nBytes) {
      if (s.getByte(b) == ' '.toByte) { wordStart(wi) = b + 1; wi += 1 }
      b += 1
    }
    wordStart(nWords) = nBytes + 1 // virtual separator past the end
    val nWin = nWords - w + 1
    val out = new Array[Long](nWin)
    var p = 0
    while (p < nWin) {
      val from = wordStart(p)
      val to = wordStart(p + w) - 1 // end of word p+w-1 (before separator)
      out(p) = XXH64.hashUnsafeBytes(base, off + from, to - from, 42L)
      p += 1
    }
    out
  }

  /** Column wrapper. Input must be single-space-separated normalized text. */
  def wordWindowHashes(normText: Column, w: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      WordWindowHashesExpr(org.apache.spark.sql.GraftSqlBridge.expression(normText), w))
}
