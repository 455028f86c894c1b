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

  /** Name canonicalization (graflo/util/transform.py:41-65): trim, collapse
    * whitespace, strip non-alphanumerics to spaces, lowercase.
    */
  def standardize(c: Column): Column =
    trim(regexp_replace(lower(regexp_replace(c, "[^\\p{L}\\p{N}]+", " ")), " +", " "))

  /** `parse_date_standard` (:68-82): "Y-M-D" → (year, month, day) struct. */
  def parseDateStandard(c: Column): Column = {
    val d = to_date(c)
    struct(year(d).as("year"), month(d).as("month"), dayofmonth(d).as("day"))
  }

  /** `parse_date_conf` (:85-99): YYYYMMDD int/string → date. */
  def parseDateConf(c: Column): Column = to_date(c.cast("string"), "yyyyMMdd")

  /** `parse_date_ibes` (:102-120): YYYYMMDD date + H:MM:SS time → ISO-8601 Z
    * timestamp string.
    */
  def parseDateIbes(date: Column, time: Column): Column =
    concat(date_format(to_date(date.cast("string"), "yyyyMMdd"), "yyyy-MM-dd"),
      lit("T"), lpad(time, 8, "0"), lit("Z"))

  /** `parse_date_yahoo` (:123-137): date → ISO string anchored at noon. */
  def parseDateYahoo(c: Column): Column =
    concat(date_format(to_date(c), "yyyy-MM-dd"), lit("T12:00:00Z"))

  /** `parse_date_standard_to_epoch` (:157-172). */
  def parseDateToEpoch(c: Column): Column = unix_timestamp(to_date(c))

  /** `round_str` (:140-154): numeric-ish string → rounded double. */
  def roundStr(c: Column, scale: Int): Column = round(c.cast("double"), scale)

  /** `try_int` (:281-300): best-effort integral parse, null on failure. */
  def tryInt(c: Column): Column = c.cast("string").try_cast("bigint")

  /** `split_keep_part` (:449-470). */
  def splitKeepPart(c: Column, sep: String, idx: Int): Column = {
    val parts = split(c, java.util.regex.Pattern.quote(sep))
    // negative idx counts from the end (Python parts[-1]); element_at is
    // 1-based positive / negative-from-end, getItem 0-based positive
    if (idx >= 0) parts.getItem(idx) else element_at(parts, idx)
  }

  /** `cast_ibes_analyst` (:175-207): "'LAST      F'" → (last, first-initial);
    * also handles "LAST/TEAM" team forms.
    */
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

  /** `snake_to_camel` (:474-516): lowerCamelCase. */
  def snakeToCamel(c: Column): Column = {
    val parts = split(c, "_")
    concat(element_at(parts, 1),
      array_join(transform(slice(parts, 2, 1000), p => initcap(p)), ""))
  }

  /** Generic last-resort: identity. */
  def identityFn(c: Column): Column = c

  /** `parse_date_reference` (:210-278): messy human dates — try a ladder of
    * formats, null when nothing matches (try_to_date keeps ANSI mode safe).
    */
  def parseDateReference(c: Column): Column = {
    val cleaned = trim(regexp_replace(c, "(?i)(\\d)(st|nd|rd|th)", "$1"))
    coalesce(
      try_to_date(cleaned, "yyyy-MM-dd"),
      try_to_date(cleaned, "yyyy/MM/dd"),
      try_to_date(cleaned, "MM/dd/yyyy"),
      try_to_date(cleaned, "MMMM d, yyyy"),
      try_to_date(cleaned, "MMM d, yyyy"),
      try_to_date(cleaned, "d MMMM yyyy"),
      try_to_date(cleaned, "yyyyMMdd"))
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
    val parts = s.split("_")
    (parts.head +: parts.tail.map(_.capitalize)).mkString
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
    "snake_to_camel"              -> snakeToCamel,
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
