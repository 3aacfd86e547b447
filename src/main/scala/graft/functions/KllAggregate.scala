package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (Karnin–Lall–Liberty 2016, the
  * Datasketches KLL implementation already on the Spark classpath
  * next to the HLL pair Spark exposes natively) — Spark has no
  * built-in KLL aggregate, so these three close the gap the same way
  * `hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate` compose:
  *
  *  - `graft_kll_agg(value, k)`     double  → binary sketch
  *  - `graft_kll_merge(sketch, k)`  binary  → binary sketch (union)
  *  - `graft_kll_quantile(sketch, rank)` → double estimate
  *
  * Why this matters at 100 TB: an EXACT percentile needs the ordered
  * data (a sort or the GlobalRank slice machinery); a KLL sketch is
  * a few KB per group with a PROVEN normalized-rank error (~1.65%
  * at k = 200), merges associatively and commutatively (re-rollup
  * and streaming state for free), and the final quantile read is a
  * planning-scale projection. This is the quantile analog of the
  * HLL trade `hll_sketch_daily` documents for distinct counts.
  *
  * KLL compaction is RANDOMIZED: two different merge orders can give
  * (slightly) different estimates, so unlike CMS/HLL the stream twin
  * asserts rank-error BOUNDS, not byte equality, and both faces are
  * rows-only at the driver gate (spec-gated instead).
  *
  * TypedImperativeAggregate → ObjectHashAggregate with PARTIAL
  * aggregation: map tasks reduce to one sketch per group before the
  * shuffle, exactly the TopKAggregate discipline. (Both aggregates
  * are standalone case classes, not subclasses of a shared abstract
  * base — an abstract `def k` read by a base-class `require` runs
  * before the subclass field initializes, and the shape also broke
  * executor-side Java deserialization of the task binary.) */
object KllKernel {
  def empty(k: Int): KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)
  def fromBytes(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  /** Deserialize into a fresh WRITABLE buffer: heapified sketches are
    * read-optimized, and update()/merge() must stay legal after a
    * shuffle round-trip. */
  def writableFromBytes(bytes: Array[Byte], k: Int): KllDoublesSketch = {
    val b = empty(k)
    b.merge(fromBytes(bytes))
    b
  }
}

/** `graft_kll_agg(value: double, k)` → binary KLL sketch. */
case class KllSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_kll_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 8) TypeCheckResult.TypeCheckFailure(s"graft_kll_agg requires k >= 8, got $k")
    else if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_agg expects double, got ${child.dataType.sql}")

  override def createAggregationBuffer(): KllDoublesSketch = KllKernel.empty(k)
  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllKernel.writableFromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg = copy(child = c)
}

/** `graft_kll_merge(sketch: binary, k)` → binary KLL union. */
case class KllMergeAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_kll_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 8) TypeCheckResult.TypeCheckFailure(s"graft_kll_merge requires k >= 8, got $k")
    else if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge expects binary, got ${child.dataType.sql}")

  override def createAggregationBuffer(): KllDoublesSketch = KllKernel.empty(k)
  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(KllKernel.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllKernel.writableFromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg = copy(child = c)
}

/** `graft_kll_quantile(sketch: binary, rank)` → double estimate;
  * null for an empty sketch. Final-projection scale (one call per
  * GROUP, not per row), so CodegenFallback is fine. */
case class KllQuantile(child: Expression, rank: Double)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (rank < 0.0 || rank > 1.0)
      TypeCheckResult.TypeCheckFailure(s"graft_kll_quantile rank must be in [0,1], got $rank")
    else if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_quantile expects binary, got ${child.dataType.sql}")
  override def nullSafeEval(bytes: Any): Any = {
    val sk = KllKernel.fromBytes(bytes.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null else sk.getQuantile(rank)
  }
  override protected def withNewChildInternal(c: Expression): KllQuantile = copy(child = c)
}
