package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** KLL-style streaming quantile sketch (Karnin, Lang & Liberty, FOCS 2016)
  * as a MERGEABLE `TypedImperativeAggregate` — the missing member of the
  * sketch suite next to bitmap (exact distinct), CMS (frequency), Bloom
  * (membership): bounded-memory ORDER STATISTICS.
  *
  * Why it exists next to the exact percentile ops (q42/q74) and Spark's own
  * `approx_percentile`: at 100 TB the exact median of a high-cardinality
  * DOUBLE column needs a full sort (or the value-domain reduction, which
  * stops helping when values are mostly unique). The KLL state is O(k·log n)
  * REGARDLESS of row count — a few KiB per group cell — partial-aggregates
  * map-side like any fixed-width sum, and merges by level-wise concatenation
  * + recompaction. That is the shape that lets a 1000-executor job keep one
  * sketch per (group × day) cell and OR them up the rollup tree later, the
  * same pattern as the bitmap/CMS rollups (q140).
  *
  * Determinism: the textbook sketch flips a coin per compaction (keep odd or
  * even ranks). We instead alternate the kept parity per level via a stored
  * compaction counter — fully deterministic for a fixed partition layout, and
  * the classic ±1-per-compaction rank-error telescope still applies, so the
  * estimate obeys the usual ~O(compactions·2^level) worst-case rank error
  * (far below 1% of n at k=256 on the fixture scales; pinned by spec and by
  * the q295 self-judging gate — the GATE's verdict, not the raw estimate, is
  * the query output, so merge-order wobble in the estimate can never flip
  * the oracle compare).
  *
  * Estimator: total weight of items ≤ x, each level-i item weighing 2^i;
  * quantile q = smallest value whose cumulative weight ≥ ceil(q·n).
  */
object KllCodec {
  /** Per-level capacity. 256 gives ≲0.5% empirical rank error at the
    * fixture scales while keeping the serialized state ≤ ~20 KiB. */
  val K = 256

  /** The fixed quantile vector `kll_quantiles` evaluates to (documented in
    * the SQL function; q295 consumes a subset). */
  val Quantiles: Array[Double] = Array(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)

  final class State {
    /** levels(i) = unsorted buffer of items each weighing 2^i. */
    val levels: ArrayBuffer[ArrayBuffer[Double]] =
      ArrayBuffer(ArrayBuffer.empty[Double])
    /** per-level compaction counter — parity picks the kept rank offset. */
    val compactions: ArrayBuffer[Long] = ArrayBuffer(0L)
    var n: Long = 0L

    private def ensureLevel(i: Int): Unit =
      while (levels.length <= i) {
        levels += ArrayBuffer.empty[Double]
        compactions += 0L
      }

    def add(v: Double): Unit = {
      levels(0) += v
      n += 1L
      compactCascade()
    }

    /** Compact any level over capacity: sort, keep alternate ranks (parity
      * from the level's compaction counter), promote survivors one level up
      * at double weight. Cascades until every level fits. */
    def compactCascade(): Unit = {
      var i = 0
      while (i < levels.length) {
        if (levels(i).length > K) {
          val sorted = levels(i).sortInPlace()
          val offset = (compactions(i) % 2L).toInt
          compactions(i) += 1L
          ensureLevel(i + 1)
          val promoted = levels(i + 1)
          var j = offset
          while (j < sorted.length) {
            promoted += sorted(j)
            j += 2
          }
          // items at the dropped parity are discarded; survivors now weigh 2×
          levels(i) = ArrayBuffer.empty[Double]
          // sorted buffer was levels(i) pre-replacement; nothing else to do
        }
        i += 1
      }
    }

    def mergeIn(other: State): Unit = {
      var i = 0
      while (i < other.levels.length) {
        if (levels.length <= i) {
          levels += ArrayBuffer.empty[Double]
          compactions += 0L
        }
        levels(i) ++= other.levels(i)
        compactions(i) += other.compactions(i)
        i += 1
      }
      n += other.n
      compactCascade()
    }

    /** (value, weight) items sorted by value. */
    def weightedItems(): Array[(Double, Long)] = {
      val out = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => out += ((v, w)))
        i += 1
      }
      out.sortBy(_._1).toArray
    }

    def quantiles(qs: Array[Double]): Array[Double] = {
      if (n == 0L) return qs.map(_ => Double.NaN)
      val items = weightedItems()
      val total = items.iterator.map(_._2).sum
      qs.map { q =>
        val target = math.max(1L, math.ceil(q * total).toLong)
        var cum = 0L
        var i = 0
        var res = items.last._1
        var done = false
        while (i < items.length && !done) {
          cum += items(i)._2
          if (cum >= target) { res = items(i)._1; done = true }
          i += 1
        }
        res
      }
    }
  }

  def serialize(s: State): Array[Byte] = {
    val nLevels = s.levels.length
    var bytes = 4 + 8 + nLevels * (4 + 8)
    s.levels.foreach(l => bytes += l.length * 8)
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(nLevels)
    bb.putLong(s.n)
    var i = 0
    while (i < nLevels) {
      bb.putLong(s.compactions(i))
      bb.putInt(s.levels(i).length)
      s.levels(i).foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new State
    val nLevels = bb.getInt
    s.n = bb.getLong
    s.levels.clear()
    s.compactions.clear()
    var i = 0
    while (i < nLevels) {
      s.compactions += bb.getLong
      val len = bb.getInt
      val buf = new ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { buf += bb.getDouble; j += 1 }
      s.levels += buf
      i += 1
    }
    s
  }
}

/** `kll_sketch(value_col)` → BINARY serialized sketch state — the
  * store-and-rollup form (the bitmap_sketch analogue): persist one blob per
  * (group × day) cell, then OR them up the rollup tree with
  * [[KllMergeQuantilesAgg]] without touching the fact table again. */
case class KllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllCodec.State]
  with UnaryLike[Expression] {

  require(child.dataType == DoubleType,
    s"kll_sketch takes a DOUBLE column, got ${child.dataType}")

  override def createAggregationBuffer(): KllCodec.State = new KllCodec.State

  override def update(b: KllCodec.State, input: InternalRow): KllCodec.State = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b1: KllCodec.State, b2: KllCodec.State): KllCodec.State = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(b: KllCodec.State): Any = KllCodec.serialize(b)

  override def serialize(b: KllCodec.State): Array[Byte] = KllCodec.serialize(b)
  override def deserialize(bytes: Array[Byte]): KllCodec.State =
    KllCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"
}

/** `kll_merge_quantiles(sketch_col)` → ARRAY<DOUBLE>: merges serialized
  * [[KllSketchAgg]] blobs (level-wise concatenation + recompaction — the
  * same mergeIn the exec path uses) and evaluates [[KllCodec.Quantiles]].
  * The re-aggregation completing the KLL algebra the way BitmapMergeAgg
  * completes the bitmap's. */
case class KllMergeQuantilesAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllCodec.State]
  with UnaryLike[Expression] {

  require(child.dataType == BinaryType,
    s"kll_merge_quantiles takes a BINARY sketch, got ${child.dataType}")

  override def createAggregationBuffer(): KllCodec.State = new KllCodec.State

  override def update(b: KllCodec.State, input: InternalRow): KllCodec.State = {
    val v = child.eval(input)
    if (v != null)
      b.mergeIn(KllCodec.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b1: KllCodec.State, b2: KllCodec.State): KllCodec.State = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(b: KllCodec.State): Any =
    new GenericArrayData(b.quantiles(KllCodec.Quantiles))

  override def serialize(b: KllCodec.State): Array[Byte] = KllCodec.serialize(b)
  override def deserialize(bytes: Array[Byte]): KllCodec.State =
    KllCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllMergeQuantilesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMergeQuantilesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): KllMergeQuantilesAgg =
    copy(child = newChild)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_quantiles"
}

/** `kll_merge(sketch_col)` → BINARY: merges serialized [[KllSketchAgg]]
  * blobs into ONE serialized blob — the blob→blob rung the algebra was
  * missing next to `kll_merge_quantiles` (blob→estimates), mirroring
  * `bitmap_merge` vs `bitmap_merge_count`. It is what an incremental
  * materialization stores back: per-batch partials merge with the stored
  * cell blob and the MERGED STATE persists, so the rollup tree never
  * revisits fact rows.
  *
  * NOT idempotent, unlike bitmap OR: KLL items carry weight, so merging
  * the same blob twice double-counts every item (n doubles). Any
  * at-least-once delivery into a KLL store therefore needs exactly-once
  * offsets (a streaming checkpoint) or upstream dedup — StreamingSpec
  * pins BOTH behaviors on streamKllUpsert, including the double-count
  * under a lost checkpoint as the documented failure mode. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllCodec.State]
  with UnaryLike[Expression] {

  require(child.dataType == BinaryType,
    s"kll_merge takes a BINARY sketch, got ${child.dataType}")

  override def createAggregationBuffer(): KllCodec.State = new KllCodec.State

  override def update(b: KllCodec.State, input: InternalRow): KllCodec.State = {
    val v = child.eval(input)
    if (v != null)
      b.mergeIn(KllCodec.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b1: KllCodec.State, b2: KllCodec.State): KllCodec.State = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(b: KllCodec.State): Any = KllCodec.serialize(b)

  override def serialize(b: KllCodec.State): Array[Byte] = KllCodec.serialize(b)
  override def deserialize(bytes: Array[Byte]): KllCodec.State =
    KllCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge"
}

/** `kll_blob_quantiles(sketch)` → ARRAY<DOUBLE>: SCALAR read of a stored
  * [[KllSketchAgg]]/[[KllMergeAgg]] blob at [[KllCodec.Quantiles]] — lets a
  * query over the sketch STORE evaluate each cell's quantiles row-by-row
  * without a degenerate one-row groupBy per cell (the `bitmap_count`
  * analogue). CodegenFallback is fine here: the store has one row per
  * rollup cell, never per fact row. Also exposes the sketch's total
  * weight n as [[KllBlobN]] for the non-idempotence pins. */
case class KllBlobQuantiles(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"kll_blob_quantiles needs a serialized KLL sketch " +
        s"(binary), got ${child.dataType}")

  override def nullSafeEval(b: Any): Any =
    new GenericArrayData(KllCodec.deserialize(b.asInstanceOf[Array[Byte]])
      .quantiles(KllCodec.Quantiles))

  override protected def withNewChildInternal(newChild: Expression)
      : KllBlobQuantiles = copy(child = newChild)
  override def prettyName: String = "kll_blob_quantiles"
}

/** `kll_blob_n(sketch)` → BIGINT: the total ingested weight of a stored
  * sketch blob. The observable that makes KLL's non-idempotence testable:
  * a replayed merge doubles n even when the quantile estimates barely
  * move. */
case class KllBlobN(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"kll_blob_n needs a serialized KLL sketch " +
        s"(binary), got ${child.dataType}")

  override def nullSafeEval(b: Any): Any =
    KllCodec.deserialize(b.asInstanceOf[Array[Byte]]).n

  override protected def withNewChildInternal(newChild: Expression)
      : KllBlobN = copy(child = newChild)
  override def prettyName: String = "kll_blob_n"
}

/** `kll_quantiles(value_col)` → ARRAY<DOUBLE> of the estimates at
  * [[KllCodec.Quantiles]] (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99).
  * Null inputs are skipped; empty input yields NaNs. */
case class KllQuantilesAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllCodec.State]
  with UnaryLike[Expression] {

  require(child.dataType == DoubleType,
    s"kll_quantiles takes a DOUBLE column, got ${child.dataType}")

  override def createAggregationBuffer(): KllCodec.State = new KllCodec.State

  override def update(b: KllCodec.State, input: InternalRow): KllCodec.State = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b1: KllCodec.State, b2: KllCodec.State): KllCodec.State = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(b: KllCodec.State): Any =
    new GenericArrayData(b.quantiles(KllCodec.Quantiles))

  override def serialize(b: KllCodec.State): Array[Byte] = KllCodec.serialize(b)
  override def deserialize(bytes: Array[Byte]): KllCodec.State =
    KllCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAgg =
    copy(child = newChild)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantiles"
}
