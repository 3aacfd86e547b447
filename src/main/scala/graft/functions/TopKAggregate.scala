package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most k (score, id) entries, best =
  * highest score, ties broken by lowest id. Backed by a worst-first
  * binary heap so insert against a full buffer is O(log k) and the
  * state NEVER exceeds k entries — the whole point vs
  * `collect_list` + sort (unbounded per-group memory) or a window
  * `row_number` (full sort of every partition). */
final class TopKBuffer(val k: Int) {
  // priority = "worseness": dequeue yields the entry to evict first
  private[functions] val heap = mutable.PriorityQueue.empty[(Double, Long)](
    (a: (Double, Long), b: (Double, Long)) =>
      if (a._1 != b._1) java.lang.Double.compare(b._1, a._1)
      else java.lang.Long.compare(a._2, b._2))

  private def beats(s: Double, id: Long, w: (Double, Long)): Boolean =
    s > w._1 || (s == w._1 && id < w._2)

  def insert(s: Double, id: Long): Unit =
    if (heap.size < k) heap.enqueue((s, id))
    else if (beats(s, id, heap.head)) { heap.dequeue(); heap.enqueue((s, id)) }

  def mergeFrom(o: TopKBuffer): Unit = o.heap.foreach { case (s, id) => insert(s, id) }

  /** Entries best-first: (score desc, id asc). Non-destructive: the
    * buffer survives the call, because Spark's AggregateProcessor
    * calls eval() repeatedly on the same live buffer in window frames
    * (graft_topk is SQL-registered, so users CAN put it in a window),
    * and eval()+serialize() may both run on one buffer. */
  def sortedBestFirst: Array[(Double, Long)] =
    heap.toArray.sortWith { (a, b) =>
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2
    }
}

/** `graft_topk(score, id, k)` → `array<struct<score, id>>`, the k
  * best-scored rows per group, best-first, ties to the smaller id.
  *
  * A TypedImperativeAggregate, so Spark plans it as an
  * ObjectHashAggregate with PARTIAL aggregation: every map task
  * reduces its rows to ≤ k entries per group BEFORE the shuffle, and
  * the shuffle carries k-entry buffers instead of all rows. The
  * window formulation (`row_number() over (partition by g order by
  * s)`) shuffles and fully sorts every row of every group — at 100 TB
  * with a handful of groups that is the one-task-per-group trap; this
  * shape shuffles O(groups · k · tasks) and sorts nothing. */
case class BoundedTopK(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"graft_topk requires k > 0, got $k")

  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects (double, bigint), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType, nullable = false)
      .add("id", LongType, nullable = false),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buffer.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedBestFirst.map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val entries = buffer.sortedBestFirst
    val bb = ByteBuffer.allocate(8 + 16 * entries.length)
    bb.putInt(buffer.k)
    bb.putInt(entries.length)
    entries.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    var n = bb.getInt()
    while (n > 0) { buf.insert(bb.getDouble(), bb.getLong()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
}
