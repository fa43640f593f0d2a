package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count-Min sketch over a STRING key column — the fixed-size MERGEABLE
  * frequency sketch (Cormode & Muthukrishnan 2005): a depth×width counter
  * matrix where each key increments one bucket per row of the matrix and a
  * point estimate is the MIN over its depth buckets (always ≥ the true
  * count; error bounded by ~N/width per row).
  *
  * Why it exists next to the exact heavy-hitter op (q128) and the bitmap
  * sketches: the CMS state is O(depth·width) REGARDLESS of key cardinality —
  * at 100 TB the exact per-key count table for a high-cardinality column
  * (urls, session ids) is itself huge, while the CMS is 32 KiB per group
  * cell, partial-aggregates map-side like any fixed-width sum, and merges
  * by elementwise addition. The probe side ([[GraftFunctions.cmsEstimate]])
  * is fully declarative (md5 → bucket arithmetic → `element_at`), so
  * estimates run in whole-stage codegen.
  *
  * Determinism contract (DuckDB-replayable, same scheme as the md5-prefix
  * content ids in ext/Dedup.scala): h = 48-bit md5 prefix of the key bytes,
  * h1 = h mod 2²⁴, h2 = (h div 2²⁴) | 1 (odd), bucket_j = (h1 + j·h2) mod
  * width (Kirsch–Mitzenmacher double hashing — ONE md5 per row, not depth).
  * All arithmetic stays far below 2⁵³, so the oracle's integer replay is
  * exact.
  */
object CmsCodec {
  /** Fixed sketch geometry for the registered SQL function: depth 4 rows of
    * 1024 buckets (32 KiB of longs) — ε ≈ e/1024, δ ≈ e⁻⁴. */
  val Depth = 4
  val Width = 1024

  def bucketBase(keyBytes: Array[Byte]): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dg = md.digest(keyBytes)
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (dg(i) & 0xffL); i += 1 }
    (h & 0xffffffL, (h >>> 24) | 1L)
  }

  def add(buf: Array[Long], keyBytes: Array[Byte], inc: Long): Unit = {
    val (h1, h2) = bucketBase(keyBytes)
    var j = 0
    while (j < Depth) {
      buf(j * Width + ((h1 + j * h2) % Width).toInt) += inc
      j += 1
    }
  }
}

/** Aggregates string keys into a serialized CMS (ArrayType(LongType) of
  * Depth·Width counters, row-major). Null keys are skipped. */
case class CmsSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(child.dataType == StringType,
    s"cms_sketch takes a STRING key, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](CmsCodec.Depth * CmsCodec.Width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      CmsCodec.add(b,
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes, 1L)
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b.clone())

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8)
    var i = 0
    while (i < b.length) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < b.length) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"
}
