package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.MinHashExpr

/** SparkSessionExtensions hook — registers the engine's custom Catalyst
  * functions for SQL use:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * SELECT minhash(norm_text, 8, 32) FROM docs
  * }}}
  *
  * (The rest of the engine needs no extension points: it is plain
  * DataFrame/Column planning — SURVEY.md §4 "custom Catalyst work actually
  * needed".)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash"),
      new ExpressionInfo(classOf[MinHashExpr].getName, "minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash(normText, k, numHashes)")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Number].intValue()
        }
        val n = args(2) match {
          case Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Number].intValue()
        }
        MinHashExpr(args.head, k, n)
      }))
  }
}
