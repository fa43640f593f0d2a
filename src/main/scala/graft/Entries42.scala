package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 21: declarative FIFO lot matching, co-purchase degree
  * statistics.
  */
object Entries42 {

  val all: Seq[Q] = Seq(

    // FIFO LOT MATCHING, fully declarative: the inventory-accounting
    // classic ("which restock lot does each sale consume?") looks like a
    // sequential mutable-queue walk — but FIFO is EXACTLY interval
    // overlap on the cumulative-quantity axis: lot i covers cumulative
    // units [Σqty_<i, Σqty_≤i) of supply, sale j consumes cumulative
    // units [Σqty_<j, Σqty_≤j) of demand, and FIFO matches them on
    // overlap = min(ends) − max(starts) when positive. Two running-sum
    // windows + one key equi join with a row-local overlap predicate (the
    // q189 binning machinery is the keyless escalation). Returns ('R'
    // flag) are the supply lots; others are sales; per part the matched
    // pair count, matched units and unfilled demand — exact integers.
    Q("q272_fifo_matching",
      (s, d) => {
        // persisted (plan census r9): the supply and demand cumulations
        // and the unmatched remainder all read the same projection
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"),
            graft.ops.Relational.epochUs(col("l_shipdate")).as("ts"),
            col("l_orderkey"), col("l_linenumber"),
            round(col("l_quantity")).cast("long").as("qty"),
            (col("l_returnflag") === "R").as("is_supply"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def cum(side: DataFrame) = {
          val w = Window.partitionBy(col("l_partkey"))
            .orderBy(col("ts").asc, col("l_orderkey").asc,
              col("l_linenumber").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          side.withColumn("hi", sum(col("qty")).over(w))
            .withColumn("lo", col("hi") - col("qty"))
        }
        val supply = cum(li.filter(col("is_supply")))
          .select(col("l_partkey"), col("lo").as("s_lo"),
            col("hi").as("s_hi"))
        val demand = cum(li.filter(!col("is_supply")))
          .select(col("l_partkey"), col("lo").as("d_lo"),
            col("hi").as("d_hi"))
        val matched = supply.join(demand, Seq("l_partkey"))
          .withColumn("m",
            least(col("s_hi"), col("d_hi")) -
              greatest(col("s_lo"), col("d_lo")))
          .filter(col("m") > 0)
        val totals = li.groupBy(col("l_partkey"))
          .agg(sum(when(col("is_supply"), col("qty")).otherwise(0L))
            .as("supplied"),
            sum(when(!col("is_supply"), col("qty")).otherwise(0L))
              .as("demanded"))
        matched.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n_matches"),
            sum(col("m")).as("matched_units"))
          .join(totals, Seq("l_partkey"), "right")
          .select(col("l_partkey"),
            coalesce(col("n_matches"), lit(0L)).as("n_matches"),
            coalesce(col("matched_units"), lit(0L)).as("matched_units"),
            (col("demanded") -
              least(col("supplied"), col("demanded"))).as("unfilled_units"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey, epoch_us(l_shipdate) AS ts, l_orderkey,
             |    l_linenumber, CAST(round(l_quantity) AS BIGINT) AS qty,
             |    l_returnflag = 'R' AS is_supply
             |  FROM lineitem),
             |supply AS (
             |  SELECT l_partkey,
             |    sum(qty) OVER w - qty AS s_lo, sum(qty) OVER w AS s_hi
             |  FROM li WHERE is_supply
             |  WINDOW w AS (PARTITION BY l_partkey
             |    ORDER BY ts, l_orderkey, l_linenumber
             |    ROWS UNBOUNDED PRECEDING)),
             |demand AS (
             |  SELECT l_partkey,
             |    sum(qty) OVER w - qty AS d_lo, sum(qty) OVER w AS d_hi
             |  FROM li WHERE NOT is_supply
             |  WINDOW w AS (PARTITION BY l_partkey
             |    ORDER BY ts, l_orderkey, l_linenumber
             |    ROWS UNBOUNDED PRECEDING)),
             |matched AS (
             |  SELECT s.l_partkey,
             |    least(s.s_hi, d.d_hi) - greatest(s.s_lo, d.d_lo) AS m
             |  FROM supply s JOIN demand d ON s.l_partkey = d.l_partkey
             |  WHERE least(s.s_hi, d.d_hi) - greatest(s.s_lo, d.d_lo) > 0),
             |totals AS (
             |  SELECT l_partkey,
             |    CAST(sum(CASE WHEN is_supply THEN qty ELSE 0 END)
             |      AS BIGINT) AS supplied,
             |    CAST(sum(CASE WHEN NOT is_supply THEN qty ELSE 0 END)
             |      AS BIGINT) AS demanded
             |  FROM li GROUP BY 1)
             |SELECT t.l_partkey,
             |  coalesce(mm.n_matches, 0) AS n_matches,
             |  coalesce(mm.matched_units, 0) AS matched_units,
             |  t.demanded - least(t.supplied, t.demanded) AS unfilled_units
             |FROM totals t LEFT JOIN (
             |  SELECT l_partkey, count(*) AS n_matches,
             |    CAST(sum(m) AS BIGINT) AS matched_units
             |  FROM matched GROUP BY 1) mm
             |  ON t.l_partkey = mm.l_partkey""".stripMargin)),

    // CO-PURCHASE DEGREE STATISTICS: distinct-neighbor degree per part in
    // the same-order co-purchase graph, the degree histogram, and the
    // ASSORTATIVITY sufficient statistics over edges (Σdᵤ·dᵥ, Σdᵤ+dᵥ,
    // Σdᵤ²+dᵥ², |E| — the integer numerator inputs of the degree-
    // correlation coefficient; division and sqrt stay with the consumer).
    // Graph metrics beyond connectivity (CC/k-core/triangles): does this
    // graph wire hubs to hubs? Edges reduce to distinct pairs first.
    Q("q273_degree_stats",
      (s, d) => {
        val pairs = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val edges = pairs.select(col("l_orderkey"),
          col("l_partkey").as("u"))
          .join(pairs.select(col("l_orderkey"), col("l_partkey").as("v")),
            Seq("l_orderkey"))
          .filter(col("u") < col("v"))
          .select(col("u"), col("v")).distinct()
          // degrees + the stats join both consume it
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val deg = edges.select(col("u").as("n"), col("v").as("m"))
          .unionByName(edges.select(col("v").as("n"), col("u").as("m")))
          .groupBy(col("n")).agg(count(lit(1)).as("deg"))
          // hist + both stats joins consume it (3×)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val hist = deg.groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
        val stats = edges
          .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
          .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
          .agg(count(lit(1)).as("n_edges"),
            sum(col("du") * col("dv")).as("sum_dudv"),
            sum(col("du") + col("dv")).as("sum_d"),
            sum(col("du") * col("du") + col("dv") * col("dv")).as("sum_d2"))
        hist.crossJoin(stats)
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |edges AS (
             |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |  FROM pairs a JOIN pairs b ON a.l_orderkey = b.l_orderkey
             |    AND a.l_partkey < b.l_partkey),
             |deg AS (
             |  SELECT n, count(*) AS deg FROM (
             |    SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
             |  GROUP BY 1),
             |hist AS (SELECT deg, count(*) AS n_nodes FROM deg GROUP BY 1),
             |stats AS (
             |  SELECT count(*) AS n_edges,
             |    CAST(sum(du.deg * dv.deg) AS BIGINT) AS sum_dudv,
             |    CAST(sum(du.deg + dv.deg) AS BIGINT) AS sum_d,
             |    CAST(sum(du.deg * du.deg + dv.deg * dv.deg) AS BIGINT)
             |      AS sum_d2
             |  FROM edges e
             |  JOIN deg du ON e.u = du.n
             |  JOIN deg dv ON e.v = dv.n)
             |SELECT h.deg, h.n_nodes, s.n_edges, s.sum_dudv, s.sum_d,
             |  s.sum_d2
             |FROM hist h CROSS JOIN stats s""".stripMargin)))
}
