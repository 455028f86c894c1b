package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass a web-corpus pipeline runs
  * before URL-keyed dedup / frontier merging (the reference has no web
  * operators; this is a north-star extension). One codegen-friendly Column
  * expression, no UDF:
  *
  *   1. scheme and host lowercase (path case is SIGNIFICANT and kept),
  *   2. default ports stripped (`:80` for http, `:443` for https — a
  *      non-default pairing like https:80 survives),
  *   3. duplicate path slashes collapsed, trailing slash stripped
  *      (non-root), empty path → `/`,
  *   4. tracking params dropped (`utm_*`, `fbclid`), remaining query params
  *      sorted byte-lexicographically, empty query dropped,
  *   5. fragment dropped.
  *
  * Scale shape: per-row narrow expression — canonicalization itself is
  * embarrassingly parallel; the payoff is that the FOLLOWING
  * `groupBy(canonical)` dedup shuffles far fewer distinct keys.
  */
object Url {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    // SchemeRe itself contains a capture group → component groups are #2
    val host = lower(regexp_extract(url, SchemeRe + "([^/:?#]+)", 2))
    val port = regexp_extract(url, SchemeRe + "[^/:?#]+:([0-9]+)", 2)
    val rawPath = regexp_extract(url, SchemeRe + "[^/?#]+([^?#]*)", 2)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val portPart = when(
      (port === "") ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val squashed = regexp_replace(
      when(rawPath === "", lit("/")).otherwise(rawPath), "/{2,}", "/")
    val path = when(length(squashed) > 1, regexp_replace(squashed, "/$", ""))
      .otherwise(squashed)
    val params = array_sort(filter(split(query, "&"),
      p => (p =!= "") && !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid)=")))
    val qPart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, portPart, path, qPart)
  }

  /** DuckDB twin of [[canonicalize]] over a column expression `e` —
    * identical steps, DuckDB regex/list dialect.
    */
  def canonicalizeSql(e: String): String = {
    val scheme = s"lower(regexp_extract($e, '$SchemeRe', 1))"
    val host = s"lower(regexp_extract($e, '$SchemeRe([^/:?#]+)', 2))"
    val port = s"regexp_extract($e, '$SchemeRe[^/:?#]+:([0-9]+)', 2)"
    val rawPath = s"regexp_extract($e, '$SchemeRe[^/?#]+([^?#]*)', 2)"
    val query = s"regexp_extract($e, '\\?([^#]*)', 1)"
    s"""(SELECT sch || '://' || hst ||
       |  CASE WHEN prt = '' OR (sch = 'http' AND prt = '80')
       |         OR (sch = 'https' AND prt = '443') THEN ''
       |       ELSE ':' || prt END ||
       |  CASE WHEN length(sq) > 1 THEN regexp_replace(sq, '/$$', '') ELSE sq END ||
       |  CASE WHEN len(prm) > 0 THEN '?' || array_to_string(prm, '&') ELSE '' END
       |FROM (SELECT $scheme AS sch, $host AS hst, $port AS prt,
       |  regexp_replace(CASE WHEN $rawPath = '' THEN '/' ELSE $rawPath END,
       |    '/{2,}', '/', 'g') AS sq,
       |  list_sort(list_filter(string_split($query, '&'),
       |    p -> p <> '' AND NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|fbclid)=')))
       |    AS prm))""".stripMargin
  }
}
