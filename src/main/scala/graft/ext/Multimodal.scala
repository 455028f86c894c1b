package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * plumbing (training-data-pipeline extension, BASELINE.json north star).
  *
  * The container has no image/audio codecs, so the DECODE KERNELS ARE STUBS —
  * `decodeStub` derives a deterministic fake signal from the bytes. The
  * Spark-side plumbing is real and tested: schema (binary + metadata
  * struct), partition-wise batched processing via `mapPartitions` (the Scala
  * analogue of `mapInPandas` — one buffer reused per partition, batch shape
  * `(id, bytes) → (id, features)`), and the explode shape for frame
  * sampling. Swapping `decodeStub` for a real JNI/codec call changes no
  * plan shape.
  *
  * Scale: per-row independent work inside mapPartitions — embarrassingly
  * parallel; the only shuffle anywhere here is a caller's downstream groupBy.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  /** Pack a string column as a binary media column + metadata struct (the
    * ingest shape a real pipeline gets from raw image/audio bytes).
    */
  def pack(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String = "application/octet-stream"): DataFrame =
    df.select(col(idCol),
      encode(col(payloadCol), "UTF-8").as("media"),
      struct(
        lit(mediaType).as("media_type"),
        octet_length(col(payloadCol)).cast("long").as("n_bytes"),
        md5(col(payloadCol)).as("checksum")).as("meta"))

  /** STUB ??? — a real implementation decodes image/audio bytes here (e.g.
    * libjpeg/ffmpeg via JNI). The stub derives `dim` deterministic floats
    * from a rolling view of the bytes so downstream ops (similarity, dedup)
    * are exercisable end-to-end.
    */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic seed
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      j += 1
    }
    out
  }

  /** Feature extraction over the binary column, batched per partition.
    * Output: (id, features array<float>). The UDF-free plan ends at a
    * mapPartitions node — same shape as a `mapInPandas` stage in PySpark.
    */
  def extractFeatures(df: DataFrame, idCol: String, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("media"))
      .mapPartitions { it =>
        it.map { r => Row(r.getLong(0), decodeStub(r.getAs[Array[Byte]](1), dim).toSeq) }
      }(enc)
  }

  /** "Resize": metadata-level transform — a real kernel would re-encode the
    * payload; the stub truncates the byte budget and rewrites metadata,
    * preserving plan shape (narrow, per-row).
    */
  def resize(df: DataFrame, maxBytes: Int): DataFrame =
    df.withColumn("media",
      expr(s"substring(media, 1, $maxBytes)"))
      .withColumn("meta", struct(
        col("meta.media_type"),
        least(col("meta.n_bytes"), lit(maxBytes.toLong)).as("n_bytes"),
        md5(col("media")).as("checksum")))

  /** Frame sampling: one row per sampled frame with a byte-slice payload
    * (a real video kernel would seek keyframes). Explode shape = the real
    * plan shape.
    */
  def frameSample(df: DataFrame, idCol: String, nFrames: Int): DataFrame = {
    val n = lit(nFrames)
    df.select(col(idCol), col("media"), col("meta"),
      posexplode(sequence(lit(0), n - 1)).as(Seq("frame_idx", "_f")))
      .withColumn("frame", expr(
        s"substring(media, cast(frame_idx * (meta.n_bytes / $nFrames) as int) + 1, " +
          s"cast(meta.n_bytes / $nFrames as int))"))
      .drop("_f", "media")
  }
}
