package graft

import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Lift an arbitrary JSON value into (Spark type, Catalyst-external value)
  * for the typed execution path; None = untypeable under a static schema
  * (heterogeneous arrays, objects with null-valued properties). Shared by
  * the curated conformance harness and the cross-path fuzzer. */
object TypedLift {
  /** JSON value → (Spark type, Catalyst-external value); None = untypeable.
    *
    * `promoteMixedNumeric` lifts a mixed long/double array to array<double>.
    * Sound under STRICT typing (the integer-double rule makes 2 and 2.0 the
    * same value for every constraint) but NOT under weak typing: the weak
    * number→string conversion is kind-dependent like the reference's
    * (long 2 → "2", double 2.0 → "2.000000" via %.6f), so promotion changes
    * what maxLength/pattern/format see. Weak-mode callers pass false and
    * treat mixed arrays as untypeable. */
  def infer(n: JsonNode, promoteMixedNumeric: Boolean = true): Option[(DataType, Any)] = {
    if (n.isNull) Some((StringType, null))
    else if (n.isBoolean) Some((BooleanType, n.asBoolean()))
    else if (n.isIntegralNumber) Some((LongType, n.asLong()))
    else if (n.isNumber) Some((DoubleType, n.asDouble()))
    else if (n.isTextual) Some((StringType, n.asText()))
    else if (n.isArray) {
      val elems = n.elements().asScala.toSeq.map(infer(_, promoteMixedNumeric))
      if (elems.exists(_.isEmpty)) None
      else {
        val typed = elems.flatten
        val dts = typed.map(_._1).distinct
        if (typed.isEmpty) Some((ArrayType(StringType), Seq.empty))
        else if (dts.size == 1) Some((ArrayType(dts.head), typed.map(_._2)))
        else if (promoteMixedNumeric && dts.toSet == Set(LongType, DoubleType))
          Some((ArrayType(DoubleType), typed.map {
            case (LongType, v: Long) => v.toDouble
            case (_, v) => v
          }))
        else None
      }
    } else if (n.isObject) {
      val fields = n.properties().asScala.toSeq.map { e =>
        infer(e.getValue, promoteMixedNumeric).map { case (dt, v) => (StructField(e.getKey, dt), v) }
      }
      if (fields.exists(_.isEmpty)) None
      else {
        val fs = fields.flatten
        if (fs.exists(_._2 == null)) None // null-valued property ≠ absent; needs variant mode
        else Some((StructType(fs.map(_._1)), Row.fromSeq(fs.map(_._2))))
      }
    } else None
  }
}
