package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** HyperLogLog register vectors as FIRST-CLASS aggregation state: a
  * 256-byte array per group that partial-aggregates map-side, so a
  * register-merge exchange carries ONE fixed 256-byte buffer per group per
  * partition — never one row per (group, bucket).
  *
  * This is the scale path for iterated sketch merges (HyperBall's
  * per-round neighborhood union): the row-per-register layout exchanges
  * |edges| × live-registers rows per round, this layout |nodes| ×
  * partitions × 256 B. Register semantics match [[graft.ext.Sketch]]
  * exactly (md5 bucket/rho, max-merge), so the estimator — and therefore
  * the DuckDB oracle, which replays the row layout — is unchanged.
  *
  * Buffer convention: byte 0 = bucket never seen (rho is always ≥ 1);
  * bytes are unsigned (rho ≤ 50 in practice, far below 127).
  */
private[expr] trait HllRegisterBufferOps {
  final val M = 256

  def mergeInto(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }
}

/** Aggregate (bucket, rho) rows into the 256-byte register vector. */
case class HllRegisterBuild(
    bucket: Expression,
    rho: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with HllRegisterBufferOps {

  override def children: Seq[Expression] = Seq(bucket, rho)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bucket = newChildren(0), rho = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(bucket.dataType) ||
        !Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(rho.dataType))
      TypeCheckResult.TypeCheckFailure(
        "hll_register_build expects integral (bucket, rho)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  private def asInt(v: Any): Int = v match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val b = bucket.eval(input)
    val r = rho.eval(input)
    if (b != null && r != null) {
      val bi = asInt(b)
      require(bi >= 0 && bi < M, s"bucket $bi out of range [0, $M)")
      val ri = math.min(asInt(r), 127)
      if (ri > buf(bi)) buf(bi) = ri.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    mergeInto(buf, other)

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(n: Int): HllRegisterBuild =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllRegisterBuild =
    copy(inputAggBufferOffset = n)

  override def prettyName: String = "hll_register_build"
}

/** Max-merge already-built 256-byte register vectors. */
case class HllRegisterMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with HllRegisterBufferOps {

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure("hll_register_merge expects binary")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[Array[Byte]]
      require(arr.length == M, s"register vector must be $M bytes")
      mergeInto(buf, arr)
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    mergeInto(buf, other)

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(n: Int): HllRegisterMerge =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllRegisterMerge =
    copy(inputAggBufferOffset = n)

  override def prettyName: String = "hll_register_merge"
}

/** Scalar: register vector → struct(s_present, present) — the exact
  * integer inputs of [[graft.ext.Sketch.hllEstimate]]'s estimator
  * (Σ 2^(49−reg) over PRESENT buckets, and the present-bucket count).
  */
case class HllRegStats(child: Expression)
  extends UnaryExpression with CodegenFallback with HllRegisterBufferOps {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure("hll_reg_stats expects binary")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("s_present", LongType, nullable = false),
    StructField("present", LongType, nullable = false)))

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[Array[Byte]]
    var s = 0L
    var present = 0L
    var i = 0
    while (i < M) {
      val r = arr(i)
      if (r > 0) {
        s += 1L << (49 - r)
        present += 1
      }
      i += 1
    }
    InternalRow(s, present)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hll_reg_stats"
}

object HllRegisterAgg {

  def hllBuild(bucket: Column, rho: Column): Column =
    GraftColumnBridge.column(HllRegisterBuild(
      GraftColumnBridge.expression(bucket),
      GraftColumnBridge.expression(rho)).toAggregateExpression())

  def hllMerge(regs: Column): Column =
    GraftColumnBridge.column(HllRegisterMerge(
      GraftColumnBridge.expression(regs)).toAggregateExpression())

  def hllStats(regs: Column): Column =
    GraftColumnBridge.column(HllRegStats(
      GraftColumnBridge.expression(regs)))
}
