package graft.checks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec._

/** Constraint suggestion — profile a table and propose the constraint spec
  * it already satisfies (the "where does my schema come from" half of a
  * validation engine, cf. Deequ's ConstraintSuggestion / Great
  * Expectations' profilers; the reference has no analog — valijson
  * validates a hand-written schema, this derives one from data using the
  * reference's OWN keyword vocabulary, `schema_parser.hpp:825-1149`, so
  * the output compiles on all three execution paths unchanged).
  *
  * Two scans, both skew-safe at 100 TB:
  *
  *  1. ONE `df.agg` of associative partials (counts, min/max, code-point
  *     length bounds) — partial aggregation map-side, a single scalar row
  *     out; no per-group state at all.
  *  2. For enum candidates (string columns), a melt →
  *     `groupBy(column, value).count` hash aggregation — per-(column,value)
  *     counts are spillable and map-side combined, never a per-column
  *     `collect_set` buffer (a high-cardinality column would OOM that
  *     formulation; here it just produces more small agg rows) — then a
  *     per-column distinct count over the TINY value-count frame decides
  *     eligibility, and only eligible columns' values (≤ enumMaxDistinct
  *     each by construction) are collected.
  *
  * At full scale run over a `df.sample(...)` slice — the rules are
  * threshold-based, so the profile cost is the caller's dial; the melt scan
  * multiplies scanned rows by the number of STRING columns only.
  *
  * Suggestion rules (each keyword only when its evidence holds):
  *   - `type`    — from the Spark column type (long→integer, double→number,
  *                 string→string, boolean→boolean; other types get no type
  *                 suggestion).
  *   - `required`— the column has zero NULLs (draft-4 required semantics:
  *                 column present on every row).
  *   - `minimum`/`maximum`       — observed numeric bounds.
  *   - `minLength`/`maxLength`   — observed code-point length bounds
  *                 (matches the validator's utf8 rule, MinLengthC).
  *   - `enum`    — string column with 2..enumMaxDistinct distinct non-null
  *                 values AND distinct ≤ enumMaxFraction × non-null (so
  *                 id-like columns never read as categorical).
  */
object Suggest {

  final case class Options(enumMaxDistinct: Int = 8,
                           enumMaxFraction: Double = 0.5,
                           detectFormats: Boolean = true)

  /** Format-detection priority: a string column whose every non-null value
    * passes the engine's OWN format check (FormatCheckExpr — the exact
    * predicate the validator runs, permissive date-time to match the
    * default CompileOptions) gets a `format` suggestion; first match in
    * this order wins (the syntaxes are mutually exclusive in practice). */
  private[checks] val FormatPriority = Seq("date-time", "date", "time", "ipv4")

  /** Everything the rules need about one column. `enumValues` is present
    * only when the eligibility rule held (and is ≤ enumMaxDistinct long);
    * each entry is (raw value, JSON-rendered form), sorted by raw value. */
  final case class ColumnProfile(name: String,
                                 jsonType: Option[String],
                                 total: Long,
                                 nonNull: Long,
                                 numMin: Option[JsonValue],
                                 numMax: Option[JsonValue],
                                 lenMin: Option[Long],
                                 lenMax: Option[Long],
                                 distinct: Option[Long],
                                 enumValues: Option[Vector[(String, String)]],
                                 format: Option[String] = None)

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def isFractional(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType | _: DecimalType => true
    case _ => false
  }

  private def jsonTypeOf(dt: DataType): Option[String] = dt match {
    case d if isIntegral(d)   => Some("integer")
    case d if isFractional(d) => Some("number")
    case StringType           => Some("string")
    case BooleanType          => Some("boolean")
    case _                    => None
  }

  /** JSON-rendered element (Jackson escaping, matching the walker's string
    * semantics): to_json(array(c)) → `["x"]`, minus the brackets. */
  private def jsonRendered(c: Column): Column = {
    val arr = to_json(array(c))
    arr.substr(lit(2), length(arr) - lit(2))
  }

  /** Profile `cols` of `df` in two scans (see object doc). */
  def profile(df: DataFrame, cols: Seq[String],
              opts: Options = Options()): Seq[ColumnProfile] = {
    require(cols.nonEmpty, "no columns to profile")
    val types: Map[String, DataType] =
      cols.map(n => n -> df.schema(n).dataType).toMap

    // ---- pass 1: associative partials, one row out ------------------------
    val aggs: Seq[Column] = count(lit(1)).as("__total") +: cols.flatMap { n =>
      val c = col(n)
      val base = Seq(count(c).as(s"nn__$n"))
      val dt = types(n)
      val extra =
        if (isIntegral(dt) || isFractional(dt))
          Seq(min(c).as(s"min__$n"), max(c).as(s"max__$n"))
        else if (dt == StringType)
          Seq(min(length(c)).as(s"lmin__$n"), max(length(c)).as(s"lmax__$n")) ++
            (if (opts.detectFormats) FormatPriority.zipWithIndex.map { case (f, fi) =>
              count(when(graft.functions.FormatCheckExpr.check(c, f,
                strictDateTime = false), 1)).as(s"fmt${fi}__$n")
            } else Nil)
        else Nil
      base ++ extra
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    def opt[T](field: String): Option[T] = {
      val i = row.fieldIndex(field)
      if (row.isNullAt(i)) None else Some(row.getAs[T](i))
    }
    val total = row.getAs[Long]("__total")

    // ---- pass 2: per-(column,value) counts for string enum candidates ----
    val stringCols = cols.filter(types(_) == StringType)
    val enumInfo: Map[String, (Long, Option[Vector[(String, String)]])] =
      if (stringCols.isEmpty) Map.empty
      else {
        val (dcnts, vals) = enumCandidates(df,
          stringCols.map(n => n -> col(n)),
          n => opt[Long](s"nn__$n").getOrElse(0L), opts)
        stringCols.map(n => n -> (dcnts.getOrElse(n, 0L), vals.get(n))).toMap
      }

    cols.map { n =>
      val dt = types(n)
      val (numMin, numMax) =
        if (isIntegral(dt))
          (opt[Any](s"min__$n").map(v => JLongV(anyToLong(v))),
           opt[Any](s"max__$n").map(v => JLongV(anyToLong(v))))
        else if (isFractional(dt))
          (opt[Any](s"min__$n").map(v => JDoubleV(anyToDouble(v))),
           opt[Any](s"max__$n").map(v => JDoubleV(anyToDouble(v))))
        else (None, None)
      ColumnProfile(
        name = n,
        jsonType = jsonTypeOf(dt),
        total = total,
        nonNull = opt[Long](s"nn__$n").getOrElse(0L),
        numMin = numMin, numMax = numMax,
        lenMin = if (dt == StringType) opt[Any](s"lmin__$n").map(anyToLong) else None,
        lenMax = if (dt == StringType) opt[Any](s"lmax__$n").map(anyToLong) else None,
        distinct = enumInfo.get(n).map(_._1),
        enumValues = enumInfo.get(n).flatMap(_._2),
        format =
          if (dt == StringType && opts.detectFormats) {
            val nn = opt[Long](s"nn__$n").getOrElse(0L)
            if (nn == 0) None
            else FormatPriority.zipWithIndex.collectFirst {
              case (f, fi) if opt[Long](s"fmt${fi}__$n").getOrElse(0L) == nn => f
            }
          } else None)
    }
  }

  /** Shared enum-candidacy machinery (also used by [[JsonSuggest]] for
    * string leaf paths): melt the labelled string columns into
    * (label, value) rows, hash-aggregate per-(label, value) counts
    * (spillable, map-side combined — NEVER a per-label collect_set
    * buffer; a high-cardinality label just yields more small agg rows),
    * derive per-label cardinality from the tiny value-count frame, then
    * collect values ONLY for eligible labels (≤ enumMaxDistinct each by
    * construction), sorted by RAW value with a Jackson-escaped JSON
    * rendering alongside. Returns (distinct counts for every label,
    * sorted values for eligible labels). */
  private[checks] def enumCandidates(df: DataFrame,
      labelled: Seq[(String, Column)],
      nonNull: String => Long,
      opts: Options): (Map[String, Long], Map[String, Vector[(String, String)]]) = {
    if (labelled.isEmpty) return (Map.empty, Map.empty)
    // persisted: cardinality AND eligible-value collection both act on
    // this frame — without the pin the second action re-runs the whole
    // melt corpus scan (the expensive stage) from scratch
    val valueCounts = meltValueCounts(df, labelled)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val perCol = valueCounts.groupBy("column").agg(count(lit(1)).as("distinct_cnt"))
      val dcnts = perCol.collect()
        .map(r => r.getAs[String]("column") -> r.getAs[Long]("distinct_cnt"))
        .toMap
      val eligible = labelled.map(_._1).filter { n =>
        val d = dcnts.getOrElse(n, 0L)
        d >= 2 && d <= opts.enumMaxDistinct && d <= opts.enumMaxFraction * nonNull(n)
      }
      val vals: Map[String, Vector[(String, String)]] =
        if (eligible.isEmpty) Map.empty
        else valueCounts.where(col("column").isin(eligible: _*))
          .groupBy("column")
          .agg(array_sort(collect_list(struct(col("value"),
            jsonRendered(col("value")).as("rendered")))).as("vs"))
          .collect()
          .map(r => r.getAs[String]("column") ->
            r.getAs[Seq[Row]]("vs")
              .map(p => (p.getAs[String]("value"),
                         p.getAs[String]("rendered"))).toVector)
          .toMap
      (dcnts, vals)
    } finally valueCounts.unpersist()
  }

  /** The melt → per-(label, value) count frame — the enum pass's only
    * corpus-scale stage. Exposed for PlanSpec: it must plan as a
    * partial-aggregated hash agg (map-side combine), never a per-label
    * `collect_set` buffer. */
  private[graft] def meltValueCounts(df: DataFrame,
      labelled: Seq[(String, Column)]): DataFrame =
    df.select(explode(array(labelled.map { case (label, c) =>
        struct(lit(label).as("column"), c.cast(StringType).as("value")) }: _*)).as("p"))
      .select(col("p.column").as("column"), col("p.value").as("value"))
      .where(col("value").isNotNull)
      .groupBy("column", "value")
      .agg(count(lit(1)).as("cnt"))

  private def anyToLong(v: Any): Long = v match {
    case b: Byte => b.toLong; case s: Short => s.toLong
    case i: Int => i.toLong; case l: Long => l
    case other => other.toString.toLong
  }
  private def anyToDouble(v: Any): Double = v match {
    case f: Float => f.toDouble; case d: Double => d
    case dec: java.math.BigDecimal => dec.doubleValue()
    case other => other.toString.toDouble
  }

  /** Suggestion rows `(col_name, keyword, value)` — `value` is JSON text,
    * so an `enum` row carries the full sorted candidate array. */
  def suggestionRows(profiles: Seq[ColumnProfile]): Seq[(String, String, String)] =
    profiles.flatMap { p =>
      val rows = Seq.newBuilder[(String, String, String)]
      p.jsonType.foreach(t => rows += ((p.name, "type", "\"" + t + "\"")))
      if (p.total > 0 && p.nonNull == p.total)
        rows += ((p.name, "required", "true"))
      p.numMin.foreach(v => rows += ((p.name, "minimum", JsonValue.render(v))))
      p.numMax.foreach(v => rows += ((p.name, "maximum", JsonValue.render(v))))
      p.lenMin.foreach(v => rows += ((p.name, "minLength", v.toString)))
      p.lenMax.foreach(v => rows += ((p.name, "maxLength", v.toString)))
      p.format.foreach(f => rows += ((p.name, "format", "\"" + f + "\"")))
      p.enumValues.foreach(vs =>
        rows += ((p.name, "enum", vs.map(_._2).mkString("[", ",", "]"))))
      rows.result()
    }

  /** Profile + render as a DataFrame (the driver-query surface). */
  def suggestions(df: DataFrame, cols: Seq[String],
                  opts: Options = Options()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    suggestionRows(profile(df, cols, opts))
      .toDF("col_name", "keyword", "value")
  }

  /** Build the suggested [[SchemaSpec]] — directly compilable by all three
    * execution paths; validating the profiled frame against it yields zero
    * violations by construction (every rule is an observed invariant). */
  def toSchema(profiles: Seq[ColumnProfile]): SchemaSpec = {
    val props: Vector[(String, SchemaSpec)] = profiles.map { p =>
      val cs = Vector.newBuilder[Constraint]
      p.jsonType.foreach { t =>
        val jt = t match {
          case "integer" => JsonType.JInteger
          case "number"  => JsonType.JNumber
          case "string"  => JsonType.JString
          case "boolean" => JsonType.JBoolean
        }
        cs += TypeC(Set(jt))
      }
      (p.numMin, p.numMax) match {
        case (Some(mn), Some(mx)) =>
          cs += MinimumC(jsonNum(mn), exclusive = false)
          cs += MaximumC(jsonNum(mx), exclusive = false)
        case _ => ()
      }
      p.lenMin.foreach(v => cs += MinLengthC(v))
      p.lenMax.foreach(v => cs += MaxLengthC(v))
      p.format.foreach(f => cs += FormatC(f))
      p.enumValues.foreach { vs =>
        cs += EnumC(vs.map(v => JStringV(v._1): JsonValue).toVector)
      }
      p.name -> (ConstraintSchema(cs.result()): SchemaSpec)
    }.toVector
    val required =
      profiles.filter(p => p.total > 0 && p.nonNull == p.total)
        .map(_.name).toVector
    val top = Vector.newBuilder[Constraint]
    if (required.nonEmpty) top += RequiredC(required)
    top += PropertiesC(props, Vector.empty, None)
    ConstraintSchema(top.result())
  }

  private def jsonNum(v: JsonValue): Double = v match {
    case JLongV(l) => l.toDouble
    case JDoubleV(d) => d
    case other => sys.error(s"not numeric: $other")
  }

  /** One-call form: profile `cols` and return the suggested schema. */
  def suggestSchema(df: DataFrame, cols: Seq[String],
                    opts: Options = Options()): SchemaSpec =
    toSchema(profile(df, cols, opts))

  // ---- suggestion diff (schema-evolution detection) ------------------------

  /** Diff two suggestion-row sets (from [[suggestionRows]] or
    * [[JsonSuggest.suggestionRows]]) keyed on (label, keyword):
    * `added` = the newer corpus satisfies a NEW invariant, `removed` = an
    * invariant the old corpus satisfied broke (e.g. fresh NULLs dissolve a
    * `required`), `changed` = the bound/value moved. Everything is
    * driver-side over the already-tiny row sets — the corpus work happened
    * in the two profiles. */
  def diffRows(before: Seq[(String, String, String)],
               after: Seq[(String, String, String)]): Seq[(String, String, String, String, String)] = {
    val bm = before.map(r => (r._1, r._2) -> r._3).toMap
    val am = after.map(r => (r._1, r._2) -> r._3).toMap
    (bm.keySet ++ am.keySet).toSeq.sorted.flatMap { k =>
      (bm.get(k), am.get(k)) match {
        case (Some(o), Some(n)) if o == n => None
        case (Some(o), Some(n)) => Some((k._1, k._2, "changed", o, n))
        case (Some(o), None)    => Some((k._1, k._2, "removed", o, null))
        case (None, Some(n))    => Some((k._1, k._2, "added", null, n))
        case (None, None)       => None
      }
    }
  }

  /** Schema-evolution report between two corpus versions: profile both,
    * diff the suggestions. The drift alarm a validation pipeline runs per
    * ingest batch BEFORE its hand-written specs start failing — a moved
    * bound or a dissolved `required`/`enum` is visible here first. */
  def suggestionDiff(before: DataFrame, after: DataFrame, cols: Seq[String],
                     opts: Options = Options()): DataFrame = {
    val spark = before.sparkSession
    import spark.implicits._
    diffRows(suggestionRows(profile(before, cols, opts)),
             suggestionRows(profile(after, cols, opts)))
      .toDF("col_name", "keyword", "change", "old_value", "new_value")
  }
}
