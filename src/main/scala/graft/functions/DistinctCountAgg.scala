package graft.functions

import scala.collection.mutable

import org.apache.spark.SparkEnv
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact distinct count as a `TypedImperativeAggregate` — the one custom
  * Catalyst aggregate SURVEY.md §4 justifies: distinct-over-window at scale.
  *
  * `size(collect_set(x)) OVER w` materializes the full dedup ARRAY for every
  * output row before taking its size; this aggregate keeps only the hash-set
  * buffer and emits the count — O(distinct) state, no per-row array
  * allocation. Usable as a plain aggregate AND over window frames
  * (WindowExec drives imperative aggregates incrementally).
  *
  * For UNBOUNDED cardinality at 100 TB prefer `approx_count_distinct`
  * (HLL++, mergeable constant state); this is the exact middle ground.
  */
case class DistinctCountAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Any]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty[Any]

  override def update(buffer: mutable.HashSet[Any],
                      input: InternalRow): mutable.HashSet[Any] = {
    val v = child.eval(input)
    // copy: Catalyst may reuse backing buffers (UTF8String etc.) across rows
    if (v != null) buffer += InternalRow.copyValue(v)
    buffer
  }

  override def merge(b1: mutable.HashSet[Any],
                     b2: mutable.HashSet[Any]): mutable.HashSet[Any] = b1 ++= b2

  override def eval(buffer: mutable.HashSet[Any]): Any = buffer.size.toLong

  override def serialize(buffer: mutable.HashSet[Any]): Array[Byte] = {
    val ser = SparkEnv.get.serializer.newInstance()
    val bb = ser.serialize[mutable.HashSet[Any]](buffer)
    java.util.Arrays.copyOfRange(bb.array(), bb.position(), bb.limit())
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val ser = SparkEnv.get.serializer.newInstance()
    ser.deserialize[mutable.HashSet[Any]](java.nio.ByteBuffer.wrap(bytes))
  }

  override def withNewMutableAggBufferOffset(offset: Int): DistinctCountAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DistinctCountAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): DistinctCountAgg =
    copy(child = newChild)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "distinct_count_exact"
}
