package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zone maps (chunk-level min/max statistics) over a Z-ordered layout — the
  * data-skipping mechanism lakehouse formats use to prune file/row-group
  * scans without reading data. The reference reads every parquet partition
  * unconditionally (reference: jobs/build_feature_views.py:10-11); this is
  * the 100 TB answer to "don't".
  *
  * Chunks are the top bits of the Z-value ([[ZOrder.zValue]]), i.e. aligned
  * 256×256 tiles of the (partkey, ship-day) plane — exactly what physical
  * files contain after a Z-order layout write (q98). The zone map is one
  * aggregation: chunk → (rowcount, min/max of both dimensions). A 2-D range
  * predicate is then answered in two steps:
  *   1. metadata-only prune: keep chunks whose [min,max] boxes intersect the
  *      query box — at scale this is the tiny stats table, no data touched;
  *   2. residual filter inside kept chunks only.
  * The Z-order clustering is what makes step 1 effective: both dimensions
  * are simultaneously localized, so a 2-D box touches few tiles.
  *
  * `hit_rows` is computed for every chunk in the same single pass (the
  * correctness assertion "pruned ⇒ zero hits" is pinned in ZoneMapSpec);
  * a production scan would compute it only for kept chunks.
  */
object ZoneMap {

  /** df: (id long, x long, y long) with x,y ≥ 0. Emits the zone map of the
    * Z-layout chunks plus the pruning decision and residual hit count for
    * the box [xLo,xHi] × [yLo,yHi]. */
  def zoneMapPrune(df: DataFrame, xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val zx = pmod(col("x"), lit(65536L))
    val zy = pmod(col("y"), lit(65536L))
    df.select(col("id"), col("x"), col("y"),
        ZOrder.zValue(zx, zy).as("zval"))
      // 16 low bits off a 32-bit Z-value = one 256×256 aligned tile per chunk
      .select(col("id"), col("x"), col("y"),
        shiftrightunsigned(col("zval"), 16).as("chunk_id"))
      .groupBy(col("chunk_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        sum(when(col("x").between(xLo, xHi) && col("y").between(yLo, yHi), 1L)
          .otherwise(0L)).as("hit_rows"))
      .withColumn("kept",
        col("min_x") <= xHi && col("max_x") >= xLo &&
          col("min_y") <= yHi && col("max_y") >= yLo)
  }

  /** DuckDB mirror over lineitem: x = l_partkey, y = ship epoch-day. */
  def zoneMapPruneSql(xLo: Long, xHi: Long, yLo: Long, yHi: Long): String =
    s"""WITH b AS (
       |  SELECT l_orderkey * 10 + l_linenumber AS id,
       |    l_partkey AS x, epoch_us(l_shipdate) // 86400000000 AS y
       |  FROM lineitem),
       |z AS (
       |  SELECT id, x, y,
       |    (${ZOrder.zValueSql("(x % 65536)", "(y % 65536)")}) // 65536 AS chunk_id
       |  FROM b)
       |SELECT chunk_id, CAST(count(*) AS BIGINT) AS n_rows,
       |  min(x) AS min_x, max(x) AS max_x,
       |  min(y) AS min_y, max(y) AS max_y,
       |  CAST(coalesce(sum(CASE WHEN x BETWEEN $xLo AND $xHi
       |    AND y BETWEEN $yLo AND $yHi THEN 1 ELSE 0 END), 0) AS BIGINT)
       |    AS hit_rows,
       |  (min(x) <= $xHi AND max(x) >= $xLo AND
       |   min(y) <= $yHi AND max(y) >= $yLo) AS kept
       |FROM z GROUP BY chunk_id""".stripMargin
}
