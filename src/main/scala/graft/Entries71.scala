package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-10 batch 4 — platform-planning and governance audits: a join
  * strategy advisor (broadcast / shuffle / salt decisions from measured
  * stats), a Bloom-filter sizing planner whose ln-derived constants are
  * build-time Scala literals, a fairness census (demographic parity /
  * disparate impact), a Simpson's-paradox reversal detector, a target-
  * leakage scan (Cramér's V of every candidate feature against the
  * label), and a parquet row-group size planner from measured row widths.
  * All integer-exact except documented bit-exact div/mul/sqrt chains.
  */
object Entries71 {

  /** Bloom planner constants, computed once in Scala and embedded in both
    * plans (ln never runs in-engine): bits/key for fpp=1% is
    * −ln(0.01)/ln(2)² ≈ 9.585, micro-quantized; optimal k = 7. */
  private val bloomBitsPerKeyMicro: Long =
    math.ceil(-math.log(0.01) / (math.log(2) * math.log(2)) * 1e6).toLong
  private val bloomK: Long =
    math.round(-math.log(0.01) / math.log(2))

  /** Per-level chi-square contribution for a binary label, shared between
    * engines; pos_l/neg_l are the level's cells, lvl_n the level margin,
    * pos_t/neg_t/nn the feature margins (doubles from exact BIGINTs). */
  private val chiLevelStr =
    "(CAST(pos_l AS DOUBLE) - CAST(lvl_n AS DOUBLE)*pos_t/nn) * " +
      "(CAST(pos_l AS DOUBLE) - CAST(lvl_n AS DOUBLE)*pos_t/nn) / " +
      "(CAST(lvl_n AS DOUBLE)*pos_t/nn) + " +
      "(CAST(neg_l AS DOUBLE) - CAST(lvl_n AS DOUBLE)*neg_t/nn) * " +
      "(CAST(neg_l AS DOUBLE) - CAST(lvl_n AS DOUBLE)*neg_t/nn) / " +
      "(CAST(lvl_n AS DOUBLE)*neg_t/nn)"

  val all: Seq[Q] = Seq(

    // JOIN STRATEGY ADVISOR: for each join edge of the star schema, the
    // measured stats a planner needs — build-side row count and estimated
    // bytes (rows × documented width constants), probe-side rows, heaviest
    // key share — and the decision against literal thresholds: broadcast
    // under 10 MiB, salt when one key holds ≥ 1% of the probe side, plain
    // shuffle otherwise. The proactive twin of AQE's reactive choices
    // (q312 measures skew; this one decides).
    Q("q405_join_advisor",
      (s, d) => {
        def edge(name: String, probe: org.apache.spark.sql.DataFrame,
                 key: String, build: org.apache.spark.sql.DataFrame,
                 widthBytes: Long) = {
          val p = probe.groupBy(col(key).as("k"))
            .agg(count(lit(1)).as("cnt"))
            .agg(sum(col("cnt")).as("probe_rows"),
              max(col("cnt")).as("max_key_rows"))
          val b = build.agg(count(lit(1)).as("build_rows"))
          p.crossJoin(broadcast(b))
            .selectExpr(s"'$name' AS edge", "probe_rows", "max_key_rows",
              "build_rows", s"build_rows * ${widthBytes}L AS build_bytes")
        }
        edge("orders->customer", Tables.orders(s, d), "o_custkey",
            Tables.customer(s, d), 60L)
          .unionByName(edge("lineitem->part", Tables.lineitem(s, d),
            "l_partkey", Tables.part(s, d), 80L))
          .unionByName(edge("lineitem->supplier", Tables.lineitem(s, d),
            "l_suppkey", Tables.supplier(s, d), 50L))
          .selectExpr("edge", "probe_rows", "max_key_rows", "build_rows",
            "build_bytes",
            "CASE WHEN build_bytes <= 10485760 THEN 'broadcast' " +
              "WHEN max_key_rows * 100 >= probe_rows THEN 'shuffle_salted' " +
              "ELSE 'shuffle_hash' END AS strategy")
      },
      Some("""WITH e AS (
             |  SELECT 'orders->customer' AS edge, o_custkey AS k,
             |    60 AS w, 'customer' AS bt FROM orders
             |  UNION ALL
             |  SELECT 'lineitem->part', l_partkey, 80, 'part' FROM lineitem
             |  UNION ALL
             |  SELECT 'lineitem->supplier', l_suppkey, 50, 'supplier'
             |  FROM lineitem),
             |pr AS (
             |  SELECT edge, CAST(sum(cnt) AS BIGINT) AS probe_rows,
             |    CAST(max(cnt) AS BIGINT) AS max_key_rows,
             |    max(w) AS w, max(bt) AS bt
             |  FROM (SELECT edge, k, max(w) AS w, max(bt) AS bt,
             |          count(*) AS cnt
             |        FROM e GROUP BY edge, k)
             |  GROUP BY edge),
             |bs AS (
             |  SELECT 'customer' AS bt, CAST(count(*) AS BIGINT) AS build_rows
             |  FROM customer
             |  UNION ALL SELECT 'part', count(*) FROM part
             |  UNION ALL SELECT 'supplier', count(*) FROM supplier)
             |SELECT edge, probe_rows, max_key_rows, build_rows,
             |  build_rows * w AS build_bytes,
             |  CASE WHEN build_rows * w <= 10485760 THEN 'broadcast'
             |    WHEN max_key_rows * 100 >= probe_rows THEN 'shuffle_salted'
             |    ELSE 'shuffle_hash' END AS strategy
             |FROM pr JOIN bs USING (bt)""".stripMargin)),

    // BLOOM FILTER SIZING PLANNER: for each candidate semi-join key, the
    // exact distinct-key count and the filter layout for 1% fpp — bits =
    // ceil(n·9.585…), k = 7 — as pure integer arithmetic on a build-time
    // micro constant. The sizing sheet behind q176/q213's runtime filters.
    Q("q406_bloom_planner",
      (s, d) => {
        def keyRow(name: String, df: org.apache.spark.sql.DataFrame,
                   key: String) =
          df.agg(countDistinct(col(key)).as("n_keys"))
            .selectExpr(s"'$name' AS key_col", "n_keys")
        keyRow("orders.o_custkey", Tables.orders(s, d), "o_custkey")
          .unionByName(keyRow("lineitem.l_partkey",
            Tables.lineitem(s, d), "l_partkey"))
          .unionByName(keyRow("lineitem.l_suppkey",
            Tables.lineitem(s, d), "l_suppkey"))
          .selectExpr("key_col", "n_keys",
            s"(n_keys * ${bloomBitsPerKeyMicro}L + 999999L) DIV 1000000L AS m_bits",
            s"CAST($bloomK AS BIGINT) AS k_hashes")
          .selectExpr("key_col", "n_keys", "m_bits", "k_hashes",
            "(m_bits + 7) DIV 8 AS filter_bytes")
      },
      Some(s"""WITH keys AS (
              |  SELECT 'orders.o_custkey' AS key_col,
              |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_keys
              |  FROM orders
              |  UNION ALL
              |  SELECT 'lineitem.l_partkey',
              |    CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
              |  UNION ALL
              |  SELECT 'lineitem.l_suppkey',
              |    CAST(count(DISTINCT l_suppkey) AS BIGINT) FROM lineitem)
              |SELECT key_col, n_keys,
              |  (n_keys * $bloomBitsPerKeyMicro + 999999) // 1000000 AS m_bits,
              |  CAST($bloomK AS BIGINT) AS k_hashes,
              |  ((n_keys * $bloomBitsPerKeyMicro + 999999) // 1000000 + 7)
              |    // 8 AS filter_bytes
              |FROM keys""".stripMargin)),

    // FAIRNESS CENSUS (demographic parity / disparate impact): outcome =
    // repeat buyer in 1997, groups = market segment. Per group the exact
    // ppm positive rate; globally the four-fifths-rule ratio (min rate /
    // max rate, ppm) and the parity gap — all integer divisions on exact
    // counts. The audit table a governed feature store publishes next to
    // the model it serves.
    Q("q407_fairness_census",
      (s, d) => {
        val label = Tables.orders(s, d)
          .filter(year(col("o_orderdate")) === 1997)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n97"))
          .filter(col("n97") >= 2L)
          .select(col("o_custkey"), lit(1L).as("pos"))
        val rates = Tables.customer(s, d)
          .join(label, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"),
            sum(coalesce(col("pos"), lit(0L))).as("n_pos"))
          .selectExpr("segment", "n", "n_pos",
            "(n_pos * 1000000) DIV n AS rate_ppm")
        val spanCols = rates.agg(min(col("rate_ppm")).as("min_rate"),
          max(col("rate_ppm")).as("max_rate"))
        rates.crossJoin(broadcast(spanCols))
          .selectExpr("segment", "n", "n_pos", "rate_ppm",
            "CASE WHEN max_rate > 0 THEN (min_rate * 1000000) DIV max_rate END AS di_ratio_ppm",
            "max_rate - min_rate AS parity_gap_ppm")
      },
      Some("""WITH label AS (
             |  SELECT o_custkey, 1 AS pos FROM orders
             |  WHERE year(o_orderdate) = 1997
             |  GROUP BY 1 HAVING count(*) >= 2),
             |rates AS (
             |  SELECT c_mktsegment AS segment,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(coalesce(pos, 0)) AS BIGINT) AS n_pos,
             |    (CAST(sum(coalesce(pos, 0)) AS BIGINT) * 1000000)
             |      // CAST(count(*) AS BIGINT) AS rate_ppm
             |  FROM customer LEFT JOIN label ON c_custkey = o_custkey
             |  GROUP BY 1),
             |span AS (
             |  SELECT CAST(min(rate_ppm) AS BIGINT) AS min_rate,
             |    CAST(max(rate_ppm) AS BIGINT) AS max_rate
             |  FROM rates)
             |SELECT segment, n, n_pos, rate_ppm,
             |  CASE WHEN max_rate > 0 THEN (min_rate * 1000000) // max_rate
             |    END AS di_ratio_ppm,
             |  max_rate - min_rate AS parity_gap_ppm
             |FROM rates CROSS JOIN span""".stripMargin)),

    // SIMPSON'S-PARADOX REVERSAL DETECTOR on the q389 contingency design
    // (discount≥5% exposure vs returned outcome, region strata): the
    // per-stratum association sign is sign(a·d − b·c) — exact integers —
    // and a stratum is flagged when it contradicts the pooled sign. The
    // guard that keeps a per-region dashboard from inverting a global
    // conclusion (or vice versa). The exposure flag compares the RAW
    // parquet double (l_discount >= 0.05) — both engines read the same
    // bits, so the comparison is bit-identical; round(x*100) at the class
    // boundary is not (Spark HALF_UP-on-BigDecimal vs DuckDB
    // round-half-away can disagree by an ulp — the r6 hash miss).
    Q("q408_simpson_reversal",
      (s, d) => {
        val sup = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("r_name"))
        // persisted: the contingency table (5 rows) feeds both the stratum
        // branch and the pooled sums — uncached, the pooled side re-scans
        // lineitem (plan census r8)
        val tab = Tables.lineitem(s, d)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .select(col("r_name").as("stratum"),
            (col("l_discount") >= 0.05).as("e"),
            (col("l_returnflag") === "R").as("r"))
          .groupBy(col("stratum")).agg(
            sum(when(col("e") && col("r"), 1L).otherwise(0L)).as("a"),
            sum(when(col("e") && !col("r"), 1L).otherwise(0L)).as("b"),
            sum(when(!col("e") && col("r"), 1L).otherwise(0L)).as("c"),
            sum(when(!col("e") && !col("r"), 1L).otherwise(0L)).as("d"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pooled = tab.agg(sum(col("a")).as("pa"), sum(col("b")).as("pb"),
          sum(col("c")).as("pc"), sum(col("d")).as("pd"))
        tab.crossJoin(broadcast(pooled))
          .selectExpr("stratum", "a", "b", "c", "d",
            "a*d - b*c AS ad_minus_bc",
            // sign() is DOUBLE in Spark, TINYINT in DuckDB — cast both to
            // BIGINT so the written value representations agree (1 vs 1.0)
            "CAST(sign(a*d - b*c) AS BIGINT) AS stratum_sign",
            "CAST(sign(pa*pd - pb*pc) AS BIGINT) AS pooled_sign")
          .selectExpr("stratum", "ad_minus_bc", "stratum_sign",
            "pooled_sign",
            "stratum_sign <> 0 AND pooled_sign <> 0 AND " +
              "stratum_sign <> pooled_sign AS reversed")
      },
      Some("""WITH sup AS (
             |  SELECT s_suppkey, r_name FROM supplier
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey),
             |tab AS (
             |  SELECT r_name AS stratum,
             |    CAST(sum(CASE WHEN l_discount >= 0.05
             |      AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |    CAST(sum(CASE WHEN l_discount >= 0.05
             |      AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |    CAST(sum(CASE WHEN l_discount < 0.05
             |      AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |    CAST(sum(CASE WHEN l_discount < 0.05
             |      AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS d
             |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
             |  GROUP BY 1),
             |pooled AS (
             |  SELECT CAST(sum(a) AS BIGINT) AS pa,
             |    CAST(sum(b) AS BIGINT) AS pb,
             |    CAST(sum(c) AS BIGINT) AS pc,
             |    CAST(sum(d) AS BIGINT) AS pd
             |  FROM tab)
             |SELECT stratum, a*d - b*c AS ad_minus_bc,
             |  CAST(sign(a*d - b*c) AS BIGINT) AS stratum_sign,
             |  CAST(sign(pa*pd - pb*pc) AS BIGINT) AS pooled_sign,
             |  sign(a*d - b*c) <> 0 AND sign(pa*pd - pb*pc) <> 0
             |    AND sign(a*d - b*c) <> sign(pa*pd - pb*pc) AS reversed
             |FROM tab CROSS JOIN pooled""".stripMargin)),

    // TARGET-LEAKAGE SCAN: Cramér's V of each candidate categorical
    // feature against the repeat-buyer label, ranked — the audit that
    // catches a feature encoding the label. Binary label → V = sqrt(χ²/n);
    // per-LEVEL χ² contributions are quantized to pico BIGINTs before the
    // per-feature sum (order-free), then one bit-exact sqrt. Features are
    // stacked into one (feature, level) relation so a single generic
    // pipeline scores them all.
    Q("q409_leakage_scan",
      (s, d) => {
        val label = Tables.orders(s, d)
          .filter(year(col("o_orderdate")) === 1997)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n97"))
          .filter(col("n97") >= 2L)
          .select(col("o_custkey"), lit(1L).as("pos"))
        // persisted: the stacked pipeline projects base once per feature
        // (three consumers), each of which would replay the label
        // aggregation over orders and the dimension joins
        val base = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .join(label, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_mktsegment"), col("n_name"), col("r_name"),
            coalesce(col("pos"), lit(0L)).as("y"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val stacked = base.selectExpr(
            "'mktsegment' AS feature", "c_mktsegment AS level", "y")
          .unionByName(base.selectExpr("'nation' AS feature",
            "n_name AS level", "y"))
          .unionByName(base.selectExpr("'region' AS feature",
            "r_name AS level", "y"))
        val lvl = stacked.groupBy(col("feature"), col("level"))
          .agg(sum(col("y")).as("pos_l"),
            sum(lit(1L) - col("y")).as("neg_l"),
            count(lit(1)).as("lvl_n"))
        val marg = lvl.groupBy(col("feature"))
          .agg(sum(col("pos_l")).as("pos_t"), sum(col("neg_l")).as("neg_t"),
            sum(col("lvl_n")).cast("double").as("nn"))
        lvl.join(broadcast(marg), Seq("feature"))
          .selectExpr("feature", "lvl_n",
            s"CAST(floor(($chiLevelStr) * 1000000000000) AS BIGINT) AS term_pico")
          .groupBy(col("feature")).agg(
            count(lit(1)).as("n_levels"),
            sum(col("term_pico")).as("chi2_pico"))
          .join(broadcast(marg.selectExpr("feature", "CAST(nn AS BIGINT) AS n")),
            Seq("feature"))
          .selectExpr("feature", "n_levels", "chi2_pico", "n",
            "CAST(floor(sqrt(CAST(chi2_pico AS DOUBLE) / 1000000000000.0 / n) * 1000000) AS BIGINT) AS cramers_v_micro")
      },
      Some(s"""WITH label AS (
              |  SELECT o_custkey, 1 AS pos FROM orders
              |  WHERE year(o_orderdate) = 1997
              |  GROUP BY 1 HAVING count(*) >= 2),
              |base AS (
              |  SELECT c_mktsegment, n_name, r_name,
              |    CAST(coalesce(pos, 0) AS BIGINT) AS y
              |  FROM customer
              |  JOIN nation ON c_nationkey = n_nationkey
              |  JOIN region ON n_regionkey = r_regionkey
              |  LEFT JOIN label ON c_custkey = o_custkey),
              |stacked AS (
              |  SELECT 'mktsegment' AS feature, c_mktsegment AS level, y
              |  FROM base
              |  UNION ALL
              |  SELECT 'nation', n_name, y FROM base
              |  UNION ALL
              |  SELECT 'region', r_name, y FROM base),
              |lvl AS (
              |  SELECT feature, level, CAST(sum(y) AS BIGINT) AS pos_l,
              |    CAST(sum(1 - y) AS BIGINT) AS neg_l,
              |    CAST(count(*) AS BIGINT) AS lvl_n
              |  FROM stacked GROUP BY 1, 2),
              |marg AS (
              |  SELECT feature, CAST(sum(pos_l) AS BIGINT) AS pos_t,
              |    CAST(sum(neg_l) AS BIGINT) AS neg_t,
              |    CAST(sum(lvl_n) AS DOUBLE) AS nn
              |  FROM lvl GROUP BY 1),
              |terms AS (
              |  SELECT feature,
              |    CAST(floor(($chiLevelStr) * 1000000000000) AS BIGINT)
              |      AS term_pico
              |  FROM lvl JOIN marg USING (feature)),
              |agg AS (
              |  SELECT feature, CAST(count(*) AS BIGINT) AS n_levels,
              |    CAST(sum(term_pico) AS BIGINT) AS chi2_pico
              |  FROM terms GROUP BY 1)
              |SELECT feature, n_levels, chi2_pico,
              |  CAST(nn AS BIGINT) AS n,
              |  CAST(floor(sqrt(CAST(chi2_pico AS DOUBLE) / 1000000000000.0
              |    / CAST(nn AS BIGINT)) * 1000000) AS BIGINT)
              |    AS cramers_v_micro
              |FROM agg JOIN marg USING (feature)""".stripMargin)),

    // PARQUET ROW-GROUP PLANNER: measured mean row width (fixed-width
    // columns as documented literals + exact string byte lengths) → rows
    // per 128 MiB row group and resulting group count per table. The
    // physical-layout knob (`parquet.block.size` sizing) computed from
    // data, not guessed; all integer.
    Q("q410_rowgroup_planner",
      (s, d) => {
        val docs = Tables.documents(s, d).agg(
            count(lit(1)).as("n_rows"),
            sum(lit(16L) + length(col("text")) + length(col("lang")) +
              length(col("source"))).as("tot_bytes"))
          .selectExpr("'documents' AS tbl", "n_rows", "tot_bytes")
        val li = Tables.lineitem(s, d).agg(
            count(lit(1)).as("n_rows"),
            sum(lit(68L) + length(col("l_returnflag")) +
              length(col("l_linestatus"))).as("tot_bytes"))
          .selectExpr("'lineitem' AS tbl", "n_rows", "tot_bytes")
        val ord = Tables.orders(s, d).agg(
            count(lit(1)).as("n_rows"),
            sum(lit(40L) + length(col("o_orderstatus")) +
              length(col("o_orderpriority"))).as("tot_bytes"))
          .selectExpr("'orders' AS tbl", "n_rows", "tot_bytes")
        docs.unionByName(li).unionByName(ord)
          .selectExpr("tbl", "n_rows", "tot_bytes",
            "tot_bytes DIV n_rows AS avg_row_bytes",
            "134217728 DIV (tot_bytes DIV n_rows) AS rows_per_group")
          .selectExpr("tbl", "n_rows", "avg_row_bytes", "rows_per_group",
            "(n_rows + rows_per_group - 1) DIV rows_per_group AS n_groups")
      },
      Some("""WITH m AS (
             |  SELECT 'documents' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(sum(16 + length(text) + length(lang) + length(source))
             |      AS BIGINT) AS tot_bytes
             |  FROM documents
             |  UNION ALL
             |  SELECT 'lineitem', count(*),
             |    CAST(sum(68 + length(l_returnflag) + length(l_linestatus))
             |      AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'orders', count(*),
             |    CAST(sum(40 + length(o_orderstatus) +
             |      length(o_orderpriority)) AS BIGINT)
             |  FROM orders)
             |SELECT tbl, n_rows, tot_bytes // n_rows AS avg_row_bytes,
             |  134217728 // (tot_bytes // n_rows) AS rows_per_group,
             |  (n_rows + 134217728 // (tot_bytes // n_rows) - 1)
             |    // (134217728 // (tot_bytes // n_rows)) AS n_groups
             |FROM m""".stripMargin)))
}
