package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext._
import graft.ExtEntries.Q

/** Round-3 query surface: scalable connected components (big/small-star),
  * salted skew join, edit-distance battery, exact moving median, chi-square
  * feature selection, int8 embedding quantization, ordered sequence
  * assembly, cluster representative selection, and the recursive-CTE SQL
  * front-end (Spark 4 `WITH RECURSIVE`).
  */
object Entries3 {

  /** SimHash hamming<=3 pair graph as recursive-closure-ready SQL — shared
    * by the CC / representative oracles so graph construction lives in one
    * place (mirrors Dedup.simhashPairs feeding the Spark side). */
  private val simhashEdgesCte =
    s"""${ExtEntries.simhashCte},
       |prs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM simsigs a JOIN simsigs b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |edges AS (SELECT d1 AS a, d2 AS b FROM prs
       |          UNION ALL SELECT d2, d1 FROM prs),
       |reach(doc_id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT reach.doc_id, e.b FROM reach JOIN edges e ON e.a = reach.r),
       |clusters AS (
       |  SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)""".stripMargin

  val all: Seq[Q] = Seq(

    // Connected components via alternating big-star/small-star contraction
    // (O(log n) rounds — the 100 TB cluster-formation path; q48's label
    // propagation is O(diameter)). Same fixpoint as the oracle's
    // recursive-CTE closure over the SimHash hamming<=3 pair graph.
    Q("q89_cc_bigstar",
      (s, d) => Dedup.ccBigStar(Tables.documents(s, d),
        Dedup.simhashPairs(Tables.documents(s, d), 3)),
      Some(s"""WITH RECURSIVE $simhashEdgesCte
              |SELECT doc_id, cluster_id FROM clusters""".stripMargin)),

    // Salted replicated-dimension join: hot-key-proof fact⋈dim with result
    // identical to the plain inner join (which is what the oracle runs)
    Q("q90_salted_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("rev_c", round(col("l_extendedprice") * 100).cast("long"))
        val supp = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))
        graft.ops.Skew.saltedJoin(li, supp, "l_suppkey", "s_suppkey",
            "l_orderkey", 8)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
            (sum(col("rev_c")) / lit(100.0)).as("revenue"))
      },
      Some("""SELECT s_nationkey, count(*) AS n_items,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey""".stripMargin)),

    // Edit-distance battery (fuzzy-dedup primitive; classic unit-cost
    // Levenshtein is engine-independent integer DP)
    Q("q91_edit_distance",
      (s, d) => Tables.customer(s, d).select(
        col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer#000000000")).cast("long").as("lev_name"),
        levenshtein(col("c_mktsegment"), lit("MACHINERY")).cast("long").as("lev_seg"),
        levenshtein(col("c_mktsegment"), reverse(col("c_mktsegment"))).cast("long").as("lev_pal"),
        levenshtein(substring(col("c_name"), 1, 8),
          substring(reverse(col("c_name")), 1, 8)).cast("long").as("lev_head_tail")),
      Some("""SELECT c_custkey,
             |  CAST(levenshtein(c_name, 'Customer#000000000') AS BIGINT) AS lev_name,
             |  CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS lev_seg,
             |  CAST(levenshtein(c_mktsegment, reverse(c_mktsegment)) AS BIGINT) AS lev_pal,
             |  CAST(levenshtein(substring(c_name, 1, 8),
             |    substring(reverse(c_name), 1, 8)) AS BIGINT) AS lev_head_tail
             |FROM customer""".stripMargin)),

    // Exact moving median over a 5-row event-time frame (collect→sort→pick
    // middle pair; integer cents keep the midpoint division bit-exact)
    Q("q92_moving_median",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id")).rowsBetween(-4, 0)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts_us"),
            round(coalesce(col("value"), lit(0.0)) * 100).cast("long").as("vc"))
          .withColumn("arr", array_sort(collect_list(col("vc")).over(w)))
          .withColumn("n", size(col("arr")).cast("long"))
          .select(col("user_id"), col("event_id"), col("ts_us"), col("n"),
            ((element_at(col("arr"), expr("CAST((n + 1) DIV 2 AS INT)")) +
              element_at(col("arr"), expr("CAST(n DIV 2 + 1 AS INT)"))) / 2.0)
              .as("median_cents"))
      },
      Some("""SELECT user_id, event_id, ts_us, n,
             |  (arr[CAST((n + 1) // 2 AS INT)] + arr[CAST(n // 2 + 1 AS INT)]) / 2.0 AS median_cents
             |FROM (
             |  SELECT user_id, event_id, ts_us,
             |    list_sort(list(vc) OVER w) AS arr,
             |    count(*) OVER w AS n
             |  FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             |          CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS vc
             |        FROM events)
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))""".stripMargin)),

    // Chi-square independence cells (categorical feature selection from
    // bigint sufficient statistics, exact-operand doubles)
    Q("q93_chi2_cells",
      (s, d) => TrainPrep.chiSquareCells(Tables.documents(s, d), "lang", "source"),
      Some("""WITH cells AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
             |rt AS (SELECT lang, count(*) AS row_n FROM documents GROUP BY 1),
             |ct AS (SELECT source, count(*) AS col_n FROM documents GROUP BY 1),
             |tot AS (SELECT count(*) AS n FROM documents)
             |SELECT lang, source, o,
             |  CAST(row_n AS DOUBLE) * col_n / n AS expected,
             |  (o - CAST(row_n AS DOUBLE) * col_n / n) *
             |  (o - CAST(row_n AS DOUBLE) * col_n / n) /
             |  (CAST(row_n AS DOUBLE) * col_n / n) AS chi2_cell
             |FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tot""".stripMargin)),

    // Symmetric int8 quantization summaries (floor(x·scale+½) — identical
    // tie-break in every engine, unlike round())
    Q("q94_embed_quantize",
      (s, d) => Similarity.quantizeInt8Summary(Tables.embeddings(s, d)),
      Some("""WITH s AS (
             |  SELECT vec_id, embedding,
             |    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
             |         THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
             |         ELSE 0.0 END AS scale
             |  FROM embeddings),
             |q AS (
             |  SELECT vec_id, scale,
             |    list_transform(embedding,
             |      x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS qv
             |  FROM s)
             |SELECT vec_id, scale,
             |  list_min(qv) AS q_min, list_max(qv) AS q_max,
             |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
             |  CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_sumsq,
             |  CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * i)) AS BIGINT) AS q_checksum
             |FROM q""".stripMargin)),

    // Ordered per-user event-sequence assembly (listagg WITHIN GROUP — one
    // hash aggregation; the LLM-pipeline "session → training sample" step)
    Q("q95_event_sequences",
      (s, d) => TrainPrep.eventSequences(
        Tables.events(s, d).select(col("user_id"), col("event_id"),
          col("ts_us"), col("event_type"))),
      Some("""SELECT user_id, count(*) AS n_events,
             |  min(ts_us) AS t_first_us, max(ts_us) AS t_last_us,
             |  string_agg(event_type, '>' ORDER BY ts_us, event_id) AS seq
             |FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
             |      FROM events)
             |GROUP BY user_id""".stripMargin)),

    // Near-dup cluster representative selection: star-contraction clusters
    // over the SimHash graph, then keep the longest doc per cluster
    // (tie: min doc_id) — the "keep one per cluster" dedup decision.
    // ccBigStar (not label propagation): its rounds touch only the edge
    // set, so forming clusters costs ~nothing beyond the pair mining
    // (label propagation re-aggregates all N labels every round; it stays
    // oracle-covered by q48)
    Q("q96_cluster_reps",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clusters = Dedup.ccBigStar(docs,
          Dedup.simhashPairs(docs, 3))
        val sized = clusters.join(docs.select(col("doc_id"), col("n_chars")),
          Seq("doc_id"))
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        sized
          .withColumn("rn", row_number().over(w))
          .withColumn("n_members",
            count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
          .filter(col("rn") === 1)
          .select(col("cluster_id"), col("doc_id").as("rep_doc_id"),
            col("n_chars").as("rep_chars"), col("n_members"))
      },
      Some(s"""WITH RECURSIVE $simhashEdgesCte
              |SELECT cluster_id, doc_id AS rep_doc_id, n_chars AS rep_chars, n_members
              |FROM (
              |  SELECT c.cluster_id, c.doc_id, d.n_chars,
              |    row_number() OVER (PARTITION BY c.cluster_id
              |      ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn,
              |    count(*) OVER (PARTITION BY c.cluster_id) AS n_members
              |  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id)
              |WHERE rn = 1""".stripMargin)),

    // WITH RECURSIVE through the Catalyst SQL front-end (Spark 4 recursive
    // CTE): ancestor closure over a synthetic 25-node chain forest
    Q("q97_recursive_sql",
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("v_nation")
        s.sql("""
          WITH RECURSIVE edges AS (
            SELECT n_nationkey AS child, n_nationkey - 7 AS parent
            FROM v_nation WHERE n_nationkey >= 7
          ),
          anc AS (
            SELECT n_nationkey AS node, n_nationkey AS a FROM v_nation
            UNION ALL
            SELECT anc.node, e.parent FROM anc JOIN edges e ON e.child = anc.a
          )
          SELECT node, count(*) AS n_anc, min(a) AS root
          FROM anc GROUP BY node""")
      },
      Some("""WITH RECURSIVE edges AS (
             |  SELECT n_nationkey AS child, n_nationkey - 7 AS parent
             |  FROM nation WHERE n_nationkey >= 7
             |),
             |anc AS (
             |  SELECT n_nationkey AS node, n_nationkey AS a FROM nation
             |  UNION ALL
             |  SELECT anc.node, e.parent FROM anc JOIN edges e ON e.child = anc.a
             |)
             |SELECT node, count(*) AS n_anc, min(a) AS root
             |FROM anc GROUP BY node""".stripMargin)),

    // Z-order (Morton) layout key: bit-interleave two dimensions so one
    // sort key clusters both (the OPTIMIZE ZORDER BY layout primitive,
    // as a codegen'd column expression; layout write = ZOrder.layoutByZ)
    Q("q98_zorder_key",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        pmod(col("user_id"), lit(65536L)).as("zx"),
        pmod(expr("ts_us DIV 3600000000"), lit(65536L)).as("zy"))
        .withColumn("zval", graft.ops.ZOrder.zValue(col("zx"), col("zy"))),
      Some(s"""SELECT event_id, zx, zy, ${graft.ops.ZOrder.zValueSql("zx", "zy")} AS zval
              |FROM (SELECT event_id, user_id % 65536 AS zx,
              |        (epoch_us(ts) // 3600000000) % 65536 AS zy
              |      FROM events)""".stripMargin)),

    // Sequence-pattern funnel: per-user ordered event string matched
    // against staged regex patterns (view → click → purchase) — the
    // product-analytics shape of sequence mining, on q95's assembly
    Q("q99_funnel_stages",
      (s, d) => TrainPrep.eventSequences(
        Tables.events(s, d).select(col("user_id"), col("event_id"),
          col("ts_us"), col("event_type")))
        .select(col("user_id"), col("n_events"),
          when(col("seq").rlike("view.*click.*purchase"), 3)
            .when(col("seq").rlike("view.*click"), 2)
            .when(col("seq").rlike("view"), 1)
            .otherwise(0).cast("int").as("funnel_stage")),
      Some("""WITH s AS (
             |  SELECT user_id, count(*) AS n_events,
             |    string_agg(event_type, '>' ORDER BY ts_us, event_id) AS seq
             |  FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
             |        FROM events)
             |  GROUP BY user_id)
             |SELECT user_id, n_events,
             |  CAST(CASE WHEN regexp_matches(seq, 'view.*click.*purchase') THEN 3
             |            WHEN regexp_matches(seq, 'view.*click') THEN 2
             |            WHEN regexp_matches(seq, 'view') THEN 1
             |            ELSE 0 END AS INT) AS funnel_stage
             |FROM s""".stripMargin)),

    // Incremental aggregate maintenance: base states + delta states merged
    // (O(delta) upkeep, never rescanning base facts) must equal the full
    // recompute — which is exactly what the oracle runs
    Q("q100_incremental_merge",
      (s, d) => {
        val cutoffUs = 1706745600000000L // 2024-02-01T00:00:00Z
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts_us"), col("value"))
        graft.ops.Incremental.mergeUserAggStates(
          graft.ops.Incremental.userAggState(ev.filter(col("ts_us") < cutoffUs)),
          graft.ops.Incremental.userAggState(ev.filter(col("ts_us") >= cutoffUs)))
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |  CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
             |  max(epoch_us(ts)) AS last_ts_us
             |FROM events GROUP BY user_id""".stripMargin))
  )
}
