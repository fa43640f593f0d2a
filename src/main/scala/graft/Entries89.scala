package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-13 batch 5 — link prediction, autocorrelation, and item-item
  * co-occurrence recommendations (integer/grid arithmetic only, exact
  * DuckDB oracle mirrors):
  *
  *  - q481 RESOURCE-ALLOCATION link prediction (Zhou, Lü & Zhang, EPJ B
  *    2009 — the strongest of the classic local similarity indices, and
  *    the one that is EXACT in integers: RA(x,y) = Σ_{z∈CN(x,y)} 1/deg(z)
  *    becomes Σ ⌊10⁶/deg⌋ ppm, where Adamic–Adar's 1/ln(deg) would drag
  *    a transcendental into the output). Supplier–supplier scores over
  *    shared parts in the bipartite purchase graph; top-20 pairs by
  *    (ra_ppm, s1, s2) total order. Scale posture: pair generation is
  *    per-part (bounded by part degree — the standard bipartite two-hop;
  *    a production run df-caps hub parts exactly like q23 bands), never
  *    an all-pairs supplier relation.
  *
  *  - q482 AUTOCORRELATION function, lags 1–6 (Box & Jenkins form on the
  *    paired-lag Pearson): per-nation weekly revenue in whole k$ units
  *    (cents DIV 10⁵ keeps every moment inside BIGINT; only the final
  *    squared cross-moment products enter DECIMAL(38,0)/HUGEINT — the
  *    q448/ops.Ranks idiv discipline). r is reported as sign + r² ppm:
  *    the covariance may be negative, and a negative operand must never
  *    meet cross-engine integer division (Spark DIV truncates, DuckDB //
  *    floors), so the square is computed and the sign rides beside it.
  *    Zero-variance overlaps get the −1 sentinel, never NULL (q448).
  *
  *  - q483 ITEM-ITEM CO-OCCURRENCE top-3 (the classic Amazon-style
  *    neighborhood recommender, Linden et al. 2003): parts co-ordered in
  *    the same order, association strength as cos² ppm =
  *    c_ij²·10⁶ DIV (c_i·c_j) — the square keeps sqrt out of the engine
  *    while ordering identically to cosine on non-negative counts.
  *    Top-3 per part via a PARTITIONED rank window (map-side
  *    WindowGroupLimit). Pair generation is per-order (order baskets are
  *    bounded — ~7 lines), so the co-occurrence build is linear in the
  *    fact table at any SF.
  *
  * Reference anchor: no graph/series/recommender surface exists in the
  * 775-LoC pandas reference (SURVEY.md §0); these extend the mandated
  * graph, time-series and retrieval families of the 100 TB charter.
  */
object Entries89 {

  def all: Seq[Q] = Seq(raLinkPred, acf, itemItem)

  // ---------------------------------------------------------------- q481

  private val raLinkPred: Q =
    Q("q481_ra_linkpred",
      (s, d) => {
        // persisted (r13): three consumers (pdeg + both pair sides) —
        // uncached, the fact-scan+distinct re-executed per reference
        val e = Tables.lineitem(s, d)
          .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pdeg = e.groupBy(col("p")).agg(count(lit(1)).as("deg"))
        val a = e.select(col("p"), col("sk").as("s1"))
        val b = e.select(col("p").as("pb"), col("sk").as("s2"))
        val pairs = a.join(b,
          col("p") === col("pb") && col("s1") < col("s2"))
        val ra = pairs.join(pdeg.select(col("p").as("pd"), col("deg")),
            col("p") === col("pd"))
          .groupBy(col("s1"), col("s2"))
          .agg(count(lit(1)).as("n_common"),
            sum(expr("1000000 DIV deg")).cast("long").as("ra_ppm"))
        val rw = Window.orderBy(col("ra_ppm").desc, col("s1"), col("s2"))
        ra.withColumn("rank", row_number().over(rw))
          .filter(col("rank") <= 20)
          .select(col("s1"), col("s2"), col("n_common"), col("ra_ppm"),
            col("rank").cast("int").as("rank"))
      },
      Some("""WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
             |          FROM lineitem),
             |pdeg AS (SELECT p, CAST(count(*) AS BIGINT) AS deg
             |         FROM e GROUP BY p),
             |pairs AS (
             |  SELECT a.s AS s1, b.s AS s2, a.p AS p
             |  FROM e a JOIN e b ON a.p = b.p AND a.s < b.s),
             |ra AS (
             |  SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_common,
             |    CAST(sum(1000000 // pdeg.deg) AS BIGINT) AS ra_ppm
             |  FROM pairs JOIN pdeg ON pdeg.p = pairs.p
             |  GROUP BY s1, s2)
             |SELECT s1, s2, n_common, ra_ppm, CAST(rank AS INT) AS rank
             |FROM (SELECT *, row_number() OVER (
             |    ORDER BY ra_ppm DESC, s1, s2) AS rank FROM ra)
             |WHERE rank <= 20""".stripMargin))

  // ---------------------------------------------------------------- q482

  private val acf: Q =
    Q("q482_acf_weekly",
      (s, d) => {
        val wk = Tables.lineitem(s, d)
          .join(Tables.supplier(s, d),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").as("nation"),
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
              " DIV 604800000000").as("week"))
          .agg(expr("sum(CAST(round(l_extendedprice * 100) AS BIGINT))" +
            " DIV 100000").as("rev_k"))
        val lags = s.range(1, 7).select(col("id").as("lag"))
        val w1 = wk.select(col("nation"), col("week"),
          col("rev_k").as("x"))
        val w2 = wk.select(col("nation").as("n2"),
          col("week").as("wk2"), col("rev_k").as("y"))
        val m = w1.crossJoin(broadcast(lags))
          .join(w2, col("n2") === col("nation") &&
            col("wk2") === col("week") + col("lag"))
          .groupBy(col("nation"), col("lag"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        m.select(col("nation"), col("lag"), col("n"),
          expr("CASE WHEN n * sxy - sx * sy >= 0 THEN 1L ELSE -1L END")
            .as("r_sign"),
          // only the squared cross-moments leave BIGINT: (38,0) products
          // with an exact integral DIV (the ops.Ranks idiv regime);
          // zero-variance overlap -> -1 sentinel, never NULL
          expr("CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0" +
            " THEN -1L ELSE CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0))" +
            " * (n * sxy - sx * sy) * 1000000 DIV" +
            " (CAST(n * sxx - sx * sx AS DECIMAL(38,0))" +
            " * (n * syy - sy * sy)) AS BIGINT) END").as("r2_ppm"))
      },
      Some("""WITH wk AS (
             |  SELECT s.s_nationkey AS nation,
             |    CAST(epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
             |      // 604800000000 AS BIGINT) AS week,
             |    CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             |      // 100000 AS BIGINT) AS rev_k
             |  FROM lineitem l JOIN supplier s
             |    ON s.s_suppkey = l.l_suppkey
             |  GROUP BY 1, 2),
             |lagd AS (
             |  SELECT w1.nation AS nation, k.k AS lag,
             |    w1.rev_k AS x, w2.rev_k AS y
             |  FROM wk w1
             |  JOIN (SELECT CAST(unnest(range(1, 7)) AS BIGINT) AS k) k
             |    ON true
             |  JOIN wk w2 ON w2.nation = w1.nation
             |    AND w2.week = w1.week + k.k),
             |m AS (
             |  SELECT nation, lag, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(y * y) AS BIGINT) AS syy
             |  FROM lagd GROUP BY 1, 2)
             |SELECT nation, lag, n,
             |  CAST(CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END
             |    AS BIGINT) AS r_sign,
             |  CAST(CASE WHEN n * sxx - sx * sx = 0
             |      OR n * syy - sy * sy = 0 THEN -1
             |    ELSE CAST(n * sxy - sx * sy AS HUGEINT)
             |      * (n * sxy - sx * sy) * 1000000
             |      // (CAST(n * sxx - sx * sx AS HUGEINT)
             |      * (n * syy - sy * sy)) END AS BIGINT) AS r2_ppm
             |FROM m""".stripMargin))

  // ---------------------------------------------------------------- q483

  private val itemItem: Q =
    Q("q483_item_item_top3",
      (s, d) => {
        val op = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val cnt = op.groupBy(col("p")).agg(count(lit(1)).as("c"))
        val a = op.select(col("o"), col("p").as("p1"))
        val b = op.select(col("o").as("ob"), col("p").as("p2"))
        val co = a.join(b, col("o") === col("ob") &&
            col("p1") =!= col("p2"))
          .groupBy(col("p1"), col("p2"))
          .agg(count(lit(1)).as("c12"))
        val sc = co
          .join(cnt.select(col("p").as("pa"), col("c").as("ca")),
            col("p1") === col("pa"))
          .join(cnt.select(col("p").as("pb"), col("c").as("cb")),
            col("p2") === col("pb"))
          .select(col("p1"), col("p2"), col("c12"),
            expr("c12 * c12 * 1000000 DIV (ca * cb)").as("cos2_ppm"))
        val rw = Window.partitionBy(col("p1"))
          .orderBy(col("cos2_ppm").desc, col("c12").desc, col("p2"))
        sc.withColumn("rk", row_number().over(rw))
          .filter(col("rk") <= 3)
          .select(col("p1"), col("p2"), col("c12"), col("cos2_ppm"),
            col("rk").cast("int").as("rk"))
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey AS o,
             |            l_partkey AS p FROM lineitem),
             |cnt AS (SELECT p, CAST(count(*) AS BIGINT) AS c
             |        FROM op GROUP BY p),
             |co AS (
             |  SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT)
             |    AS c12
             |  FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
             |  GROUP BY 1, 2),
             |sc AS (
             |  SELECT co.p1 AS p1, co.p2 AS p2, co.c12 AS c12,
             |    CAST(co.c12 * co.c12 * 1000000 // (ca.c * cb.c)
             |      AS BIGINT) AS cos2_ppm
             |  FROM co JOIN cnt ca ON ca.p = co.p1
             |  JOIN cnt cb ON cb.p = co.p2)
             |SELECT p1, p2, c12, cos2_ppm, CAST(rk AS INT) AS rk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY p1
             |    ORDER BY cos2_ppm DESC, c12 DESC, p2) AS rk FROM sc)
             |WHERE rk <= 3""".stripMargin))
}
