package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 11: SQL-defined functions (the SQL front-end's UDF
  * surface) and rolling mode over a bounded frame.
  */
object Entries32 {

  val all: Seq[Q] = Seq(

    // SQL-DEFINED FUNCTION: the revenue expression declared ONCE as a SQL
    // scalar UDF (Spark 4 `CREATE TEMPORARY FUNCTION … RETURN expr`) and
    // used from SQL text — Catalyst inlines the body, so the plan is
    // identical to writing the expression inline (no black-box UDF, full
    // codegen + pushdown). DuckDB mirrors with a MACRO. The "shared
    // business logic without a JVM deploy" surface of the SQL front-end.
    Q("q246_sql_udf",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("v_li_udf")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION rev_c100(p DOUBLE,
                |  disc DOUBLE) RETURNS BIGINT
                |RETURN CAST(round(p * 100) AS BIGINT)
                |  * (100 - CAST(round(disc * 100) AS BIGINT))""".stripMargin)
        s.sql("""SELECT l_returnflag,
                |  sum(rev_c100(l_extendedprice, l_discount)) AS revenue_c100,
                |  count(*) AS n_lines
                |FROM v_li_udf GROUP BY 1""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |    AS BIGINT) AS revenue_c100,
             |  count(*) AS n_lines
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // ROLLING MODE of the last 5 event types per user — most-frequent
    // element over a BOUNDED sliding frame (ties → lexicographic min,
    // pinned). The frame list is ≤5 elements, so the per-row mode is
    // constant work; frame state bounded by width, never series length
    // (the q92/q190 discipline for order statistics, extended to modes).
    Q("q247_rolling_mode",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
          .rowsBetween(-4, 0)
        Tables.events(s, d)
          .withColumn("l", collect_list(col("event_type")).over(w))
          .withColumn("maxc", expr(
            "array_max(transform(array_distinct(l), " +
              "x -> size(filter(l, y -> y = x))))"))
          .select(col("user_id"), col("event_id"),
            expr("array_min(filter(array_distinct(l), " +
              "x -> size(filter(l, y -> y = x)) = maxc))").as("mode_5"),
            size(col("l")).cast("long").as("frame_n"))
      },
      Some("""WITH framed AS (
             |  SELECT user_id, event_id,
             |    list(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id
             |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS l
             |  FROM events)
             |SELECT user_id, event_id,
             |  list_min(list_filter(list_distinct(l),
             |    x -> len(list_filter(l, y -> y = x)) =
             |      list_max(list_transform(list_distinct(l),
             |        z -> len(list_filter(l, y -> y = z)))))) AS mode_5,
             |  CAST(len(l) AS BIGINT) AS frame_n
             |FROM framed""".stripMargin)))
}
