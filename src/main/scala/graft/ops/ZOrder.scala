package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional data-layout key
  * for 100 TB tables: sort/range-partition by the interleaved key and
  * parquet row-group min/max stats become selective for BOTH dimensions,
  * so filters on either column prune file splits (the layout trick behind
  * Delta/Iceberg OPTIMIZE ZORDER BY, here as a plain column expression +
  * repartitionByRange write).
  */
object ZOrder {

  /** 32-bit Morton code from the low 16 bits of two non-negative longs:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Pure bitwise
    * per-row arithmetic — codegen'd, no shuffle. */
  def zValue(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The identical interleave as engine-portable SQL (oracle twin). */
  def zValueSql(x: String, y: String): String =
    (0 until 16).map(i =>
      s"(((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1}))")
      .mkString(" + ")

  /** Z-ordered layout: range-partition on the z-value (balanced output
    * files), sort within partitions — the write-side recipe that makes
    * row-group stats selective on both source dimensions. */
  def layoutByZ(df: org.apache.spark.sql.DataFrame, z: Column,
                numFiles: Int): org.apache.spark.sql.DataFrame =
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
