package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.FilterExpr

/** File source with extension sniffing — the reference's `FileDataSource` +
  * `ChunkerFactory` (graflo/data_source/file.py:19-130,
  * graflo/data_source/chunker.py:53-560). The chunkers' whole job (streaming
  * batch iteration, gz decompression, header handling) is what
  * `spark.read` already does; only the format dispatch survives.
  */
object FileSource {
  def read(
      spark: SparkSession,
      path: String,
      format: Option[String] = None,
      limit: Option[Int] = None,
      csvSep: String = ",",
      csvHeader: Boolean = true,
      /** false = CSV/TSV columns stay STRING (the reference's csv plane;
        * declared manifest types cast later) — inference would eat
        * formatting a string-typed field must keep ("+44..." → 44...)
        */
      inferTypes: Boolean = true
  ): DataFrame = {
    val base = path.toLowerCase.stripSuffix(".gz")
    val fmt = format.getOrElse {
      base.substring(base.lastIndexOf('.') + 1) match {
        case "json"           => "json"      // JsonChunker (chunker.py:317)
        case "jsonl" | "ndjson" => "jsonl"   // JsonlChunker (chunker.py:296)
        case "csv"            => "csv"       // TableChunker (chunker.py:247)
        case "tsv"            => "tsv"
        case "parquet"        => "parquet"   // ParquetChunker (chunker.py:387)
        case "orc"            => "orc"       // columnar breadth beyond the reference
        case other => throw new IllegalArgumentException(s"unknown file format: $other")
      }
    }
    val df = fmt match {
      case "json"    => spark.read.option("multiLine", true).json(path)
      case "jsonl"   => spark.read.json(path)
      case "csv"     => spark.read.option("header", csvHeader).option("sep", csvSep)
        .option("inferSchema", inferTypes).csv(path)
      case "tsv"     => spark.read.option("header", csvHeader).option("sep", "\t")
        .option("inferSchema", inferTypes).csv(path)
      case "parquet" => spark.read.parquet(path)
      case "orc"     => spark.read.orc(path)
      case other     => throw new IllegalArgumentException(s"unknown format: $other")
    }
    limit.map(df.limit).getOrElse(df) // source `limit` (data_source/base.py:71-92)
  }
}

/** Half-open datetime predicate on a source column — the reference's
  * `ColumnTimeFilter` (graflo/architecture/contract/bindings/
  * column_time_filter.py:51-217): `[after, before)`, with `interval`
  * shorthand ("7D", "12H", "30T") deriving `before = after + interval`, plus
  * `not_equals` exclusions. Compiles to one Column that Catalyst pushes into
  * the scan (the reference had to render it into each backend's SQL).
  */
final case class ColumnTimeFilter(
    column: String,
    after: Option[Timestamp] = None,
    before: Option[Timestamp] = None,
    interval: Option[String] = None,
    notEquals: Seq[Timestamp] = Nil
) {
  private def parseIntervalMs(s: String): Long = {
    val m = "^(\\d+)([DHTdhtMmSs])$".r.findFirstMatchIn(s.trim)
      .getOrElse(throw new IllegalArgumentException(s"bad interval: $s"))
    val n = m.group(1).toLong
    m.group(2).toUpperCase match {
      case "D" => n * 86400000L
      case "H" => n * 3600000L
      case "T" | "M" => n * 60000L // pandas "T" = minutes
      case "S" => n * 1000L
    }
  }

  def toColumn: Column = {
    val c = col(column)
    val effBefore: Option[Timestamp] = before.orElse(
      for (a <- after; i <- interval)
        yield new Timestamp(a.getTime + parseIntervalMs(i)))
    val conds =
      after.map(a => c >= lit(a)).toSeq ++
        effBefore.map(b => c < lit(b)).toSeq ++
        notEquals.map(v => c =!= lit(v))
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }

  def apply(df: DataFrame): DataFrame = df.where(toColumn)
}

/** Declarative SELECT over a base table with FK joins — the reference's
  * `TableConnector`/`SelectSpec`/`JoinClause` (graflo/filter/select.py:
  * 28-476). The reference renders this to SQL text per backend; here it
  * compiles straight to a Catalyst plan, which keeps pushdown/pruning/join
  * reordering automatic.
  */
final case class JoinClause(
    right: DataFrame,
    alias: String,
    on: Seq[(String, String)], // (leftCol or alias.col, rightCol)
    how: String = "left" // LEFT | INNER (select.py:28-65)
)

final case class SelectSpec(
    base: DataFrame,
    baseAlias: String,
    joins: Seq[JoinClause] = Nil,
    selectFields: Seq[String] = Nil, // "alias.col" or "alias.col AS name"
    where: Option[FilterExpr] = None,
    timeFilter: Option[ColumnTimeFilter] = None
) {
  def compile: DataFrame = {
    var df = base.alias(baseAlias)
    joins.foreach { j =>
      val cond = j.on.map { case (l, r) =>
        val lc = if (l.contains(".")) col(l) else col(s"$baseAlias.$l")
        lc === col(s"${j.alias}.$r")
      }.reduceLeft(_ && _)
      df = df.join(j.right.alias(j.alias), cond, j.how.toLowerCase)
    }
    timeFilter.foreach(tf => df = df.where(tf.toColumn))
    where.foreach(f => df = df.where(FilterExpr.compile(f)))
    if (selectFields.nonEmpty) {
      val cols = selectFields.map { s =>
        val parts = s.split("(?i) AS ")
        if (parts.length == 2) col(parts(0).trim).as(parts(1).trim)
        else col(s.trim)
      }
      df.select(cols: _*)
    } else df
  }
}

/** JDBC source — the reference's `SQLDataSource`
  * (graflo/data_source/sql.py:44-150): parameterized query with server-side
  * streaming. `spark.read.jdbc` already streams with partitioned reads; the
  * Decimal→float normalization is a cast pass. Offline container has no DB —
  * exercised through the same `SelectSpec` path that a live JDBC DataFrame
  * would flow through.
  */
object JdbcSource {
  def read(
      spark: SparkSession,
      url: String,
      query: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      lowerBound: Long = 0L,
      upperBound: Long = Long.MaxValue,
      properties: java.util.Properties = new java.util.Properties()
  ): DataFrame = {
    import scala.jdk.CollectionConverters._
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .options(properties.asScala.map { case (k, v) => k.toString -> v.toString }.toMap)
    // Spark rejects `query` combined with `partitionColumn` — the partitioned
    // path must go through `dbtable` with the query as a derived table (the
    // `AS sub` correlation name is required by stricter dialects, e.g. Derby).
    val partitioned = partitionColumn match {
      case Some(c) => reader
        .option("dbtable", s"($query) AS sub")
        .option("partitionColumn", c)
        .option("numPartitions", numPartitions)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
      case None => reader.option("query", query)
    }
    normalizeDecimals(partitioned.load())
  }

  /** Decimal→double normalization (sql.py Decimal→float). */
  def normalizeDecimals(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.DecimalType =>
          d.withColumn(f.name, col(f.name).cast("double"))
        case _ => d
      }
    }
}

/** In-memory source (reference graflo/data_source/memory.py): rows+columns →
  * DataFrame.
  */
object InMemorySource {
  def fromRows(spark: SparkSession, columns: Seq[String], rows: Seq[Seq[Any]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def typeOf(v: Any): DataType = v match {
      case _: Int | _: Long => LongType
      case _: Double | _: Float => DoubleType
      case _: Boolean => BooleanType
      case _ => StringType
    }
    val sample = rows.headOption.getOrElse(Seq.fill(columns.size)(""))
    val schema = StructType(columns.zip(sample).map { case (c, v) =>
      StructField(c, typeOf(v), nullable = true)
    })
    val norm = rows.map(r => Row.fromSeq(r.map {
      case i: Int => i.toLong
      case f: Float => f.toDouble
      case x => x
    }))
    spark.createDataFrame(spark.sparkContext.parallelize(norm.toList), schema)
  }
}
