package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native bounded DISTINCT bottom-k aggregate: keeps the k smallest
  * distinct values per group in a fixed-size ordered set.
  *
  * This is the KMV (k-minimum-values, Beyer et al. 2007) sketch builder as
  * ONE aggregation: the classic formulation needs `distinct()` over the
  * (group, hash) universe and THEN a bounded bottom-k — two corpus-scale
  * shuffles. Because the buffer here is a set, duplicates collapse inside
  * the partial aggregate, so the single exchange carries at most k values
  * per group per partition and the distinct pass disappears. At 100 TB the
  * (source, shingle-hash) frame is the corpus itself — eliminating its
  * global dedup halves the job's shuffle volume.
  *
  * Nulls are ignored. Result: `array<value>` sorted ascending — for
  * fixed-width hex hashes that is exactly the KMV sketch order.
  */
case class BoundedMinK(
    k: Int,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Any]] {

  require(k > 0, s"mink_distinct requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(value)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.catalyst.expressions.RowOrdering
    if (!RowOrdering.isOrderable(value.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"mink_distinct value type ${value.dataType.catalogString} is not orderable")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(value.dataType, containsNull = false)

  override def nullable: Boolean = false

  @transient private lazy val valueOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(value.dataType)

  override def createAggregationBuffer(): mutable.TreeSet[Any] =
    mutable.TreeSet.empty[Any](valueOrd)

  private def insert(buf: mutable.TreeSet[Any], v: Any): Unit = {
    if (buf.size < k) buf.add(v): Unit
    else if (valueOrd.compare(v, buf.last) < 0) {
      if (buf.add(v)) buf.remove(buf.last): Unit
    }
  }

  override def update(buf: mutable.TreeSet[Any],
      input: InternalRow): mutable.TreeSet[Any] = {
    val v = value.eval(input)
    if (v != null) {
      // cheap reject before copying: a value that can't enter the set
      // (full set, not smaller than the max) never needs its own memory
      if (buf.size < k || valueOrd.compare(v, buf.last) < 0)
        insert(buf, InternalRow.copyValue(v))
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[Any],
      other: mutable.TreeSet[Any]): mutable.TreeSet[Any] = {
    // other is ascending; once an element can't enter, none after it can
    val it = other.iterator
    var open = true
    while (open && it.hasNext) {
      val v = it.next()
      if (buf.size < k || valueOrd.compare(v, buf.last) < 0) insert(buf, v)
      else open = false
    }
    buf
  }

  override def eval(buf: mutable.TreeSet[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val valueProj =
    UnsafeProjection.create(Array(value.dataType))

  override def serialize(buf: mutable.TreeSet[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { v =>
      val row = valueProj(InternalRow(v))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Any] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      buf.add(InternalRow.copyValue(row.get(0, value.dataType))): Unit
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "mink_distinct"
}

object BoundedMinK {

  /** Column API: `minKDistinct(k, value)` aggregates to the ascending
    * `array<value>` of the k smallest distinct values.
    */
  def minKDistinct(k: Int, value: Column): Column =
    GraftColumnBridge.column(
      BoundedMinK(k, GraftColumnBridge.expression(value)).toAggregateExpression())
}
