package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** RDF surface (reference graflo/data_source/rdf.py:64-424 +
  * graflo/hq/rdf_inferencer.py:98-260), Spark-first: no rdflib — N-Triples
  * parse as a columnar regexp over lines, subject-grouping as a groupBy, and
  * OWL/RDFS TBox inference as plain filters over the triple DataFrame.
  */
object Rdf {

  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val OwlClass = "http://www.w3.org/2002/07/owl#Class"
  val OwlObjectProperty = "http://www.w3.org/2002/07/owl#ObjectProperty"
  val OwlDatatypeProperty = "http://www.w3.org/2002/07/owl#DatatypeProperty"
  val RdfsDomain = "http://www.w3.org/2000/01/rdf-schema#domain"
  val RdfsRange = "http://www.w3.org/2000/01/rdf-schema#range"

  /** Parse N-Triples lines into (s, p, o, isLiteral). Handles IRIs
    * `<...>` and literals `"..."` (language tags / datatypes stripped —
    * same normalization the reference applies when grouping into docs).
    */
  def parseNTriples(lines: DataFrame): DataFrame = {
    val line = trim(col(lines.columns.head))
    lines.select(
      regexp_extract(line, "^<([^>]+)>", 1).as("s"),
      regexp_extract(line, "^<[^>]+>\\s+<([^>]+)>", 1).as("p"),
      regexp_extract(line, "^<[^>]+>\\s+<[^>]+>\\s+(.+?)\\s*\\.\\s*$", 1).as("oraw"))
      .where(col("s") =!= "" && col("p") =!= "")
      .withColumn("isLiteral", !col("oraw").startsWith("<"))
      .withColumn("o",
        when(col("isLiteral"), regexp_extract(col("oraw"), "^\"(.*)\"", 1))
          .otherwise(regexp_extract(col("oraw"), "^<([^>]+)>", 1)))
      .drop("oraw")
  }

  def readNTriples(spark: SparkSession, path: String): DataFrame =
    parseNTriples(spark.read.text(path))

  /** Parse line-oriented Turtle (reference rdf.py:64-424 reads .ttl via
    * rdflib; this is the engine's columnar subset): `@prefix` declarations,
    * one triple per line, IRIs `<...>`, prefixed names `p:local`, the `a`
    * keyword (rdf:type), and literals with optional `@lang` / `^^datatype`
    * suffixes (stripped, as in [[parseNTriples]]).
    *
    * The prefix table is collected to the driver (it is a handful of header
    * lines) and expansion is a columnar map lookup — the triple body never
    * leaves executors. Multi-line statements (`;` / `,` continuation) are
    * out of scope; pre-flatten such files.
    */
  def parseTurtle(lines: DataFrame): DataFrame = {
    val raw = lines.select(trim(col(lines.columns.head)).as("line"))
      .where(col("line") =!= "" && !col("line").startsWith("#"))
    val prefixRe = "^@prefix\\s+([A-Za-z][\\w-]*)?:\\s*<([^>]+)>"
    val prefixes: Map[String, String] = raw
      .where(col("line").startsWith("@prefix"))
      .select(regexp_extract(col("line"), prefixRe, 1).as("p"),
        regexp_extract(col("line"), prefixRe, 2).as("iri"))
      .where(col("iri") =!= "")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val pmap = typedLit(prefixes)

    val term = "(<[^>]+>|\"(?:[^\"\\\\]|\\\\.)*\"(?:@[\\w-]+|\\^\\^\\S+)?|[A-Za-z][\\w.-]*:[\\w.-]*|a)"
    val stmt = s"^$term\\s+$term\\s+$term\\s*\\.\\s*$$"

    val parsed = raw.where(!col("line").startsWith("@"))
      .select(
        regexp_extract(col("line"), stmt, 1).as("ts"),
        regexp_extract(col("line"), stmt, 2).as("tp"),
        regexp_extract(col("line"), stmt, 3).as("to"))
      .where(col("ts") =!= "" && col("tp") =!= "")

    def iriOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val prefix = substring_index(c, ":", 1)
      val local = c.substr(length(prefix) + lit(2), lit(100000))
      when(c.startsWith("<"), regexp_extract(c, "^<([^>]+)>", 1))
        .when(c === "a", lit(RdfType))
        .otherwise(coalesce(concat(element_at(pmap, prefix), local), c))
    }

    parsed.select(
      iriOf(col("ts")).as("s"),
      iriOf(col("tp")).as("p"),
      col("to").as("oraw"))
      .withColumn("isLiteral", col("oraw").startsWith("\""))
      .withColumn("o",
        when(col("isLiteral"), regexp_extract(col("oraw"), "^\"((?:[^\"\\\\]|\\\\.)*)\"", 1))
          .otherwise(iriOf(col("oraw"))))
      .drop("oraw")
  }

  def readTurtle(spark: SparkSession, path: String): DataFrame =
    parseTurtle(spark.read.text(path))

  /** Group triples per subject into documents (reference rdf.py: triples
    * grouped per subject into docs): one row per subject with a
    * predicate→values map. Local names (fragment after #/ last /) are used
    * as field names, mirroring the reference's doc keys.
    */
  def triplesToDocs(triples: DataFrame): DataFrame = {
    val local = (c: org.apache.spark.sql.Column) =>
      element_at(split(c, "[#/]"), -1)
    // multi-valued predicates are routine (two rdf:type triples, repeated
    // properties) — group values per key first, or map_from_entries throws
    // on the duplicate key (mapKeyDedupPolicy=EXCEPTION)
    triples
      .groupBy(col("s").as("id"), local(col("p")).as("k"))
      .agg(sort_array(collect_list(col("o"))).as("vs"))
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("k"), col("vs")))).as("props"))
  }

  /** Manifest → RDF serialization (the reference's manifest↔RDF round-trip,
    * graflo/rdf/serializer.py + namespace.py): vertices become owl:Class,
    * edges owl:ObjectProperty with domain/range, typed fields
    * owl:DatatypeProperty with domain. Inverse of [[inferSchema]] up to
    * ordering. N-Triples lines, base IRI configurable.
    */
  def schemaToNTriples(schema: GraphSchema, base: String = "http://graft.local/"): Seq[String] = {
    def iri(n: String) = s"<$base$n>"
    val classes = schema.vertices.map(v =>
      s"${iri(v.name)} <$RdfType> <$OwlClass> .")
    val fields = schema.vertices.flatMap(v => v.properties.map { f =>
      Seq(s"${iri(f.name)} <$RdfType> <$OwlDatatypeProperty> .",
        s"${iri(f.name)} <$RdfsDomain> ${iri(v.name)} .")
    }.flatten)
    val edges = schema.edges.flatMap(e => Seq(
      s"${iri(e.relation)} <$RdfType> <$OwlObjectProperty> .",
      s"${iri(e.relation)} <$RdfsDomain> ${iri(e.source)} .",
      s"${iri(e.relation)} <$RdfsRange> ${iri(e.target)} ."))
    classes ++ fields ++ edges
  }

  /** OWL/RDFS TBox inference (rdf_inferencer.py:98-260): owl:Class →
    * vertex, owl:ObjectProperty (+domain/range) → edge (self-loops allowed),
    * owl:DatatypeProperty (+domain) → field on the domain vertex.
    */
  def inferSchema(triples: DataFrame): GraphSchema = {
    def local(u: String) = u.split("[#/]").last
    val typed = triples.where(col("p") === RdfType)
      .select(col("s"), col("o")).collect()
      .map(r => r.getString(0) -> r.getString(1))
    val classes = typed.filter(_._2 == OwlClass).map(_._1)
    val objProps = typed.filter(_._2 == OwlObjectProperty).map(_._1).toSet
    val dataProps = typed.filter(_._2 == OwlDatatypeProperty).map(_._1).toSet
    val domains = triples.where(col("p") === RdfsDomain)
      .select("s", "o").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val ranges = triples.where(col("p") === RdfsRange)
      .select("s", "o").collect().map(r => r.getString(0) -> r.getString(1)).toMap

    val fieldsByClass = dataProps.toSeq.flatMap { dp =>
      domains.get(dp).map(d => local(d) -> FieldDef(local(dp)))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    val vertices = classes.map(local).sorted.map { c =>
      VertexDef(c, fieldsByClass.getOrElse(c, Nil), Identity.Natural(Seq("id")))
    }
    val vnames = vertices.map(_.name).toSet
    val edges = objProps.toSeq.sorted.flatMap { op =>
      for {
        d <- domains.get(op).map(local) if vnames(d)
        r <- ranges.get(op).map(local) if vnames(r)
      } yield EdgeDef(d, r, local(op))
    }
    GraphSchema(vertices.toSeq, edges)
  }
}
