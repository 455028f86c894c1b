package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's scalar-function surface — the reference's built-in transform
  * library (graflo/util/transform.py) re-expressed as
  * `org.apache.spark.sql.functions` compositions, so every one of them stays
  * inside whole-stage codegen (no UDFs on the hot path; the reference runs
  * all of these row-at-a-time in pure Python, cast_pool.py:1-12).
  *
  * Registered by name in [[TransformRegistry]] so manifests can reference
  * them the way graflo manifests name `module`+`foo` callables.
  */
object TransformLib {

  /** `standardize` (graflo/util/transform.py:41-65), reference-exact: strip
    * periods, split on ", " — when that yields one part, split on SINGLE
    * spaces instead (empty tokens between double spaces survive, Python
    * `split(" ")`); when it yields several, only part[1] loses its spaces —
    * then join with ",". "John Doe Smith" → "John,Doe,Smith".
    */
  def standardize(c: Column): Column = {
    val cleaned = regexp_replace(c, "\\.", "")
    val byComma = split(cleaned, java.util.regex.Pattern.quote(", "), -1)
    val bySpace = split(cleaned, java.util.regex.Pattern.quote(" "), -1)
    when(size(byComma) < 2, array_join(bySpace, ","))
      .otherwise(array_join(
        org.apache.spark.sql.functions.transform(byComma, (x, i) =>
          when(i === 1, regexp_replace(x, " ", "")).otherwise(x)), ","))
  }

  /** `parse_date_standard` (:68-82): "Y-M-D" → (year, month, day) struct. */
  def parseDateStandard(c: Column): Column = {
    val d = to_date(c)
    struct(year(d).as("year"), month(d).as("month"), dayofmonth(d).as("day"))
  }

  /** `parse_date_conf` (:85-99): YYYYMMDD int/string → date. */
  def parseDateConf(c: Column): Column = to_date(c.cast("string"), "yyyyMMdd")

  /** `parse_date_ibes` (:102-120), reference-exact: pure string slicing
    * `date[:4]-date[4:6]-date[6:]` + the time AS GIVEN (the reference does
    * NOT zero-pad — '9:30:00' stays '...T9:30:00Z'; its docstring shows a
    * padded example but the code is an f-string).
    */
  def parseDateIbes(date: Column, time: Column): Column = {
    val ds = date.cast("string")
    concat(substring(ds, 1, 4), lit("-"), substring(ds, 5, 2), lit("-"),
      substring(ds, 7, 100), lit("T"), time, lit("Z"))
  }

  /** `parse_date_yahoo` (:123-137), reference-exact: a pure f-string
    * `s + "T12:00:00Z"` — no parsing, no validation.
    */
  def parseDateYahoo(c: Column): Column = concat(c, lit("T12:00:00Z"))

  /** `parse_date_standard_to_epoch` (:157-172). */
  def parseDateToEpoch(c: Column): Column = unix_timestamp(to_date(c))

  /** `round_str` (:140-154): numeric-ish string → rounded double. Python
    * `round` is banker's rounding (HALF_EVEN: round('2.5') → 2) — `bround`,
    * not `round`.
    */
  def roundStr(c: Column, scale: Int): Column = bround(c.cast("double"), scale)

  /** `try_int` (:281-300): best-effort integral parse, null on failure. */
  def tryInt(c: Column): Column = c.cast("string").try_cast("bigint")

  /** `split_keep_part` (:449-470). */
  def splitKeepPart(c: Column, sep: String, idx: Int): Column = {
    val parts = split(c, java.util.regex.Pattern.quote(sep))
    // negative idx counts from the end (Python parts[-1]); element_at is
    // 1-based positive / negative-from-end, getItem 0-based positive
    if (idx >= 0) parts.getItem(idx) else element_at(parts, idx)
  }

  /** `split_keep_part` list form (:466-468): keep several indices, re-join
    * with the separator — `split_keep_part("a/b/c", keep=[0, 2])` → "a/c".
    */
  def splitKeepParts(c: Column, sep: String, keeps: Seq[Int]): Column = {
    val parts = split(c, java.util.regex.Pattern.quote(sep))
    concat_ws(sep, keeps.map(i =>
      if (i >= 0) parts.getItem(i) else element_at(parts, i)): _*)
  }

  /** `cast_ibes_analyst` (util/transform.py:175-207), reference-exact:
    * a whitespace-bearing name takes its FIRST TWO whitespace-run tokens
    * as (last_name, initial[:1]) — 'ARFSTROM      J' → ('ARFSTROM', 'J'),
    * and the quirk is preserved: 'VAN DEUSEN    P' → ('VAN', 'D'), the
    * initial comes from the SECOND token, not the last. The slash form
    * splits on '/' (a leading slash skips the empty head):
    * 'ADKINS/NARRA' → ('ADKINS', 'N'). Apostrophes and commas are DATA
    * (the reference keeps O'LEARY intact), never stripped.
    */
  def castIbesAnalyst(c: Column): Column = {
    val ws = filter(split(c, "[ \\t]+"), t => length(t) > 0)
    val sl0 = split(c, "/")
    val sl = when(c.startsWith("/"), slice(sl0, 2, 2)).otherwise(slice(sl0, 1, 2))
    val toks = when(c.rlike("[ \\t]"), slice(ws, 1, 2)).otherwise(sl)
    val last = coalesce(element_at(toks, 1), lit(""))
    val ini = when(size(toks) >= 2,
      substring(coalesce(element_at(toks, 2), lit("")), 1, 1)).otherwise(lit(""))
    struct(last.as("last_name"), ini.as("first_name"))
  }

  def removePrefix(c: Column, p: String): Column =
    when(c.startsWith(p), c.substr(lit(p.length + 1), length(c))).otherwise(c)

  def removeSuffix(c: Column, s: String): Column =
    when(c.endsWith(s), c.substr(lit(1), length(c) - lit(s.length))).otherwise(c)

  /** `camel_to_snake` (:474-516). */
  def camelToSnake(c: Column): Column =
    lower(regexp_replace(regexp_replace(c, "(.)([A-Z][a-z]+)", "$1_$2"),
      "([a-z0-9])([A-Z])", "$1_$2"))

  /** `snake_to_camel` (:496-516), reference-exact: leading/trailing
    * underscore runs survive, inner empty parts drop, the head part
    * LOWERCASES fully, tail parts `capitalize()` (first char upper, REST
    * lower — per part, not per word); empty/underscore-only inputs return
    * unchanged. `upperFirst` capitalizes the head instead (PascalCase).
    */
  def snakeToCamel(c: Column, upperFirst: Boolean = false): Column = {
    def capitalize(p: Column): Column =
      concat(upper(substring(p, 1, 1)), lower(substring(p, 2, 100000)))
    val lead = regexp_extract(c, "^_+", 0)
    val trail = regexp_extract(regexp_replace(c, "^_+$", ""), "_+$", 0)
    val core = regexp_replace(c, "^_+|_+$", "")
    val parts = filter(split(core, "_"), p => length(p) > 0)
    val head0 = coalesce(element_at(parts, 1), lit(""))
    val head = if (upperFirst) capitalize(head0) else lower(head0)
    val tail = array_join(transform(slice(parts, 2, 100000), p => capitalize(p)), "")
    when(length(core) === 0 || size(parts) === 0, c)
      .otherwise(concat(lead, head, tail, trail))
  }

  /** Generic last-resort: identity. */
  def identityFn(c: Column): Column = c

  /** `parse_date_reference` (:210-278), reference-exact: extract the YEAR
    * from human-written date references ("1923, May 10" → 1923); comma
    * forms try full then 3-letter month names; anything unparseable
    * passes through UNCHANGED (the reference returns the last-reassigned
    * string, which for the 3/2-token fallbacks is the abbreviated join).
    * Output is string-typed (the reference's int-or-str union).
    */
  def parseDateReference(c: Column): Column = {
    val q = java.util.regex.Pattern.quote(" ")
    val toks0 = split(c, q, -1)
    // 3-token comma form: strip a trailing lowercase ordinal suffix first
    val ord = substring(c, -2, 2).isin("st", "nd", "rd", "th")
    val s1 = when(ord, c.substr(lit(1), length(c) - 2)).otherwise(c)
    val t1 = split(s1, q, -1)
    val abbrev3 = concat_ws(" ", try_element_at(t1, lit(1)),
      substring(try_element_at(t1, lit(2)), 1, 3), try_element_at(t1, lit(3)))
    val d3 = coalesce(try_to_date(s1, "yyyy, MMMM d"),
      try_to_date(abbrev3, "yyyy, MMM d"))
    // other comma forms: "%Y, %B" then the abbreviated month
    val abbrev2 = concat_ws(" ", try_element_at(toks0, lit(1)),
      substring(try_element_at(toks0, lit(2)), 1, 3))
    val d2 = coalesce(try_to_date(c, "yyyy, MMMM"),
      try_to_date(abbrev2, "yyyy, MMM"))
    // no comma: int(input[:4]) as the year
    val first4 = substring(c, 1, 4)
    val yr = when(first4.rlike("^\\d+$"), first4.cast("int"))
    when(c.contains(","),
      when(size(toks0) === 3,
        when(d3.isNotNull, year(d3).cast("string")).otherwise(abbrev3))
        .otherwise(
          when(d2.isNotNull, year(d2).cast("string")).otherwise(abbrev2)))
      .otherwise(
        when(yr.isNotNull, yr.cast("string")).otherwise(c))
  }

  /** `parse_multi_item` (:328-377): bracket/quote list-of-kv strings →
    * `map<string, array<string>>` (single quotes normalized to JSON).
    */
  def parseMultiItem(c: Column): Column =
    from_json(regexp_replace(c, "'", "\""),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))

  /** `target: keys` (transform.py:739-761): apply a name function to COLUMN
    * NAMES with include/exclude selection and collision check.
    */
  def renameColumns(
      df: org.apache.spark.sql.DataFrame,
      fn: String => String,
      include: Seq[String] = Nil,
      exclude: Seq[String] = Nil
  ): org.apache.spark.sql.DataFrame = {
    val newNames = df.columns.map { c =>
      val selected = (include.isEmpty || include.contains(c)) && !exclude.contains(c)
      if (selected) fn(c) else c
    }
    require(newNames.distinct.length == newNames.length,
      s"column rename collision: ${newNames.mkString(",")}")
    df.toDF(newNames.toIndexedSeq: _*)
  }

  /** Pure-Scala name functions for `renameColumns`. */
  def camelToSnakeName(s: String): String =
    s.replaceAll("(.)([A-Z][a-z]+)", "$1_$2")
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase
  def snakeToCamelName(s: String): String = {
    // mirror of [[snakeToCamel]] (reference :496-516)
    if (s.isEmpty) return s
    val core = s.replaceAll("^_+|_+$", "")
    if (core.isEmpty) return s
    val parts = core.split("_").filter(_.nonEmpty)
    if (parts.isEmpty) return s
    val lead = "^_+".r.findFirstIn(s).getOrElse("")
    val trail = "_+$".r.findFirstIn(s).getOrElse("")
    val tail = parts.tail.map(p =>
      p.substring(0, 1).toUpperCase + p.substring(1).toLowerCase).mkString
    lead + parts.head.toLowerCase + tail + trail
  }

  /** The `dress` pivot/melt as a standalone DataFrame op (reference
    * transform.py:95-109): wide columns → `(key, value)` rows, values cast to
    * string (the reference's dicts are untyped). Used by the pipeline's
    * dress transforms and directly as an operator.
    */
  def melt(
      df: org.apache.spark.sql.DataFrame,
      idCols: Seq[String],
      fields: Seq[String],
      keyName: String,
      valName: String
  ): org.apache.spark.sql.DataFrame = {
    val pairs = fields.map(f =>
      struct(lit(f).as(keyName), col(f).cast("string").as(valName)))
    df.select(idCols.map(col) :+ explode(array(pairs: _*)).as("__kv"): _*)
      .select(idCols.map(col) ++ Seq(col(s"__kv.$keyName").as(keyName),
        col(s"__kv.$valName").as(valName)): _*)
  }
}

/** Named registry — the Spark analogue of graflo's
  * `ingestion_model.transforms` (actor/transform.py:147-243): manifests refer
  * to functions by name; `strategy: each` maps a unary fn over fields,
  * `strategy: single` calls an n-ary fn once.
  */
object TransformRegistry {
  import TransformLib._

  /** unary Column functions by reference name */
  val unary: Map[String, Column => Column] = Map(
    "standardize"                 -> standardize,
    "parse_date_standard"         -> parseDateStandard,
    "parse_date_conf"             -> (parseDateConf(_)),
    "parse_date_yahoo"            -> parseDateYahoo,
    "parse_date_standard_to_epoch" -> parseDateToEpoch,
    "try_int"                     -> tryInt,
    "camel_to_snake"              -> camelToSnake,
    "snake_to_camel"              -> ((c: Column) => snakeToCamel(c)),
    "cast_ibes_analyst"           -> castIbesAnalyst,
    "parse_date_reference"        -> parseDateReference,
    "parse_multi_item"            -> parseMultiItem,
    "identity"                    -> identityFn
  )

  /** n-ary Column functions by reference name */
  val nary: Map[String, Seq[Column] => Column] = Map(
    "parse_date_ibes" -> { cs => parseDateIbes(cs(0), cs(1)) },
    "concat_ws_pipe"  -> { cs => concat_ws("|", cs: _*) }
  )

  def applyUnary(name: String, c: Column): Column =
    unary.getOrElse(name,
      throw new IllegalArgumentException(s"unknown transform: $name"))(c)
}
