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

/** Native bounded top-k aggregate: keeps the k highest-scoring
  * (score, payload) pairs per group in a fixed-size heap.
  *
  * This is the scale-path replacement for the window-rank idiom
  * (`row_number().over(partitionBy(g).orderBy(score.desc)) <= k`), whose
  * physical plan shuffles EVERY row of the input to the group's reducer and
  * sorts it there. As a `TypedImperativeAggregate` this expression
  * partial-aggregates map-side under `ObjectHashAggregateExec`: each input
  * partition reduces its rows to at most k pairs per group before the
  * exchange, so the shuffle carries `min(rows, k × groups × partitions)`
  * pairs instead of the full input — at 100 TB the difference between a
  * full-data exchange and a kilobytes-per-partition one. The reference's
  * top-k ordering caps are driver-side LIMITs over DB cursors
  * (graflo/architecture/query/caps.py); here the cap IS the aggregation
  * state.
  *
  * Determinism: ties on score resolve toward the SMALLEST payload (the same
  * `orderBy(score.desc, id.asc)` tiebreak the window idiom uses), so results
  * are stable across partitionings and retries. Rows with a null score are
  * ignored (max-like semantics); a null payload sorts before any non-null
  * payload at equal score.
  *
  * Result: `array<struct<score, payload>>`, sorted score-descending then
  * payload-ascending — `posexplode` yields the rank directly.
  */
case class BoundedTopK(
    k: Int,
    score: Expression,
    payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]] {

  require(k > 0, s"topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, payload)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.catalyst.expressions.RowOrdering
    if (!RowOrdering.isOrderable(score.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk score type ${score.dataType.catalogString} is not orderable")
    else if (!RowOrdering.isOrderable(payload.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk payload type ${payload.dataType.catalogString} is not orderable " +
          "(payload breaks score ties — it must sort)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", score.dataType),
      StructField("payload", payload.dataType))),
    containsNull = false)

  override def nullable: Boolean = false

  @transient private lazy val scoreOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(score.dataType)
  @transient private lazy val payloadOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(payload.dataType)

  /** null payload < any payload (deterministic; interpreted orderings are
    * not null-tolerant on their own).
    */
  private def cmpPayload(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case _ => payloadOrd.compare(a, b)
  }

  /** "Better" = higher score, then smaller payload. */
  private def cmpBetter(a: (Any, Any), b: (Any, Any)): Int = {
    val s = scoreOrd.compare(a._1, b._1)
    if (s != 0) s else -cmpPayload(a._2, b._2)
  }

  /** Max-heap on "worseness": dequeue() removes the WORST retained pair, so
    * inserts beyond k evict in O(log k).
    */
  @transient private lazy val evictOrd: Ordering[(Any, Any)] =
    (a: (Any, Any), b: (Any, Any)) => cmpBetter(b, a)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Any, Any)] =
    new mutable.PriorityQueue[(Any, Any)]()(evictOrd)

  override def update(buf: mutable.PriorityQueue[(Any, Any)],
      input: InternalRow): mutable.PriorityQueue[(Any, Any)] = {
    val s = score.eval(input)
    if (s != null) {
      val p = payload.eval(input)
      // skip the heap churn when the candidate can't displace anything
      if (buf.size < k || cmpBetter((s, p), buf.head) > 0) {
        // eval results may alias reused row memory (UTF8String views) —
        // copy before retaining beyond this row
        buf.enqueue((InternalRow.copyValue(s), InternalRow.copyValue(p)))
        if (buf.size > k) buf.dequeue(): Unit
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Any, Any)],
      other: mutable.PriorityQueue[(Any, Any)]): mutable.PriorityQueue[(Any, Any)] = {
    other.foreach { pair =>
      if (buf.size < k || cmpBetter(pair, buf.head) > 0) {
        buf.enqueue(pair) // already copied at update()
        if (buf.size > k) buf.dequeue(): Unit
      }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Any, Any)]): Any = {
    val sorted = buf.toArray.sortWith(cmpBetter(_, _) > 0)
    new GenericArrayData(sorted.map { case (s, p) =>
      InternalRow(s, p).asInstanceOf[Any]
    })
  }

  @transient private lazy val pairProj =
    UnsafeProjection.create(Array(score.dataType, payload.dataType))

  override def serialize(buf: mutable.PriorityQueue[(Any, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, p) =>
      val row = pairProj(InternalRow(s, p))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Any, Any)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      // UnsafeRow getters return views into rowBytes; each deserialized row
      // owns a fresh array, so retaining the views is safe — but copy
      // anyway so a pooled/reused input buffer can never corrupt state
      val s = InternalRow.copyValue(row.get(0, score.dataType))
      val p = InternalRow.copyValue(row.get(1, payload.dataType))
      buf.enqueue((s, p))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "topk_pairs"
}

object BoundedTopK {

  /** Column API: `topKPairs(k, score, payload)` aggregates to the sorted
    * `array<struct<score, payload>>` of the k best pairs.
    */
  def topKPairs(k: Int, score: Column, payload: Column): Column =
    GraftColumnBridge.column(
      BoundedTopK(k,
        GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(payload)).toAggregateExpression())
}
