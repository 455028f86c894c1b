package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Transform-library parity against the REFERENCE'S OWN EXECUTION:
  * `src/test/resources/reference_transform_fixture.json` holds
  * (fn, args, kwargs, result) tuples produced by running
  * graflo/util/transform.py functions directly (generator kept in the
  * fixture's header comment lineage; regenerate by executing the reference
  * over the same input grid). Every successful reference call must be
  * matched value-for-value by the corresponding [[TransformLib]] column
  * function — the doctest-level parity that caught the cast_ibes_analyst,
  * standardize, snake_to_camel, parse_date_ibes/yahoo/reference and
  * banker's-rounding divergences in round 6.
  *
  * Deliberate skips (engine-typed semantics, documented in DIVERGENCES.md):
  * reference calls that RAISED (the engine yields null + error channel
  * instead), `try_int` on non-integers (the reference returns the original
  * value — a mixed int-or-str union a typed column cannot hold; ours nulls),
  * and `try_int` on float inputs (python truncates; ours parses integral
  * strings only).
  */
class ReferenceTransformParitySpec extends SparkSpec {

  private val fixturePath =
    "/root/repo/src/test/resources/reference_transform_fixture.json"

  test("TransformLib matches the reference's executed transform results") {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    import scala.jdk.CollectionConverters._
    val root = new ObjectMapper().readTree(new java.io.File(fixturePath))

    def canonNum(s: String): String =
      try BigDecimal(s).underlying.stripTrailingZeros.toPlainString
      catch { case _: Throwable => s }
    def canonJson(n: JsonNode): String =
      if (n.isNumber) canonNum(n.asText())
      else if (n.isArray) n.elements().asScala.map(canonJson).mkString("")
      else n.asText()
    def canonAny(v: Any): String = v match {
      case null => "<null>"
      case d: java.lang.Double => canonNum(d.toString)
      case f: java.lang.Float => canonNum(f.toString)
      case n: java.lang.Number => canonNum(n.toString)
      case r: org.apache.spark.sql.Row =>
        r.toSeq.map(canonAny).mkString("")
      case s: String => s
      case other => other.toString
    }

    def eval(c: Column): Any = {
      val r = spark.range(1).select(c.as("v")).collect().head
      r.get(0)
    }

    var compared = 0
    val mismatches = scala.collection.mutable.Buffer.empty[String]
    var skipped = 0

    root.elements().asScala.foreach { cse =>
      val fn = cse.path("fn").asText()
      val ok = cse.path("ok").asBoolean()
      val args = cse.path("args").elements().asScala.toSeq
      val kwargs = cse.path("kwargs")
      def a0 = lit(args.head.asText())
      val expected = cse.path("result")

      val ours: Option[Any] =
        if (!ok) { skipped += 1; None } // reference raised; engine yields null
        else fn match {
          case "standardize" => Some(eval(TransformLib.standardize(a0)))
          case "camel_to_snake" => Some(eval(TransformLib.camelToSnake(a0)))
          case "snake_to_camel" =>
            val uf = kwargs.path("upper_first").asBoolean(false)
            Some(eval(TransformLib.snakeToCamel(a0, uf)))
          case "parse_date_standard" =>
            Some(eval(TransformLib.parseDateStandard(a0)))
          case "parse_date_conf" =>
            val d = TransformLib.parseDateConf(a0)
            Some(eval(struct(year(d), month(d), dayofmonth(d))))
          case "parse_date_yahoo" => Some(eval(TransformLib.parseDateYahoo(a0)))
          case "parse_date_ibes" =>
            Some(eval(TransformLib.parseDateIbes(
              lit(args(0).asText()), lit(args(1).asText()))))
          case "parse_date_standard_to_epoch" =>
            Some(eval(TransformLib.parseDateToEpoch(a0)))
          case "parse_date_reference" =>
            Some(eval(TransformLib.parseDateReference(a0)))
          case "cast_ibes_analyst" =>
            Some(eval(TransformLib.castIbesAnalyst(a0)))
          case "round_str" =>
            val nd = kwargs.path("ndigits").asInt(0)
            Some(eval(TransformLib.roundStr(a0, nd)))
          case "try_int" =>
            // engine-typed: only integer-parsing string inputs agree
            if (expected.isInt || expected.isLong) {
              if (args.head.isTextual)
                Some(eval(TransformLib.tryInt(a0)))
              else { skipped += 1; None } // python int(3.7) truncates
            } else { skipped += 1; None } // reference returns the original
          case "split_keep_part" =>
            val sep = if (kwargs.has("sep")) kwargs.path("sep").asText() else "/"
            val keepN = kwargs.path("keep")
            if (keepN.isArray)
              Some(eval(TransformLib.splitKeepParts(a0, sep,
                keepN.elements().asScala.map(_.asInt()).toSeq)))
            else
              Some(eval(TransformLib.splitKeepPart(a0, sep,
                if (kwargs.has("keep")) keepN.asInt() else -1)))
          case "remove_prefix" =>
            Some(eval(TransformLib.removePrefix(a0, args(1).asText())))
          case "remove_suffix" =>
            Some(eval(TransformLib.removeSuffix(a0, args(1).asText())))
          case other => fail(s"fixture has unmapped fn '$other'")
        }

      ours.foreach { v =>
        compared += 1
        val got = canonAny(v)
        val want = canonJson(expected)
        if (got != want)
          mismatches += s"$fn(${args.map(_.asText()).mkString(", ")} " +
            s"${if (kwargs.isEmpty) "" else kwargs.toString}) = '$got' " +
            s"but reference executed '$want'"
      }
    }

    assert(mismatches.isEmpty,
      s"${mismatches.size} parity mismatches:\n${mismatches.mkString("\n")}")
    assert(compared >= 180, s"only $compared cases compared ($skipped skipped)")
  }
}
