package graft

import org.apache.spark.sql.functions._
import graft.ext._
import graft.ExtEntries.Q

/** Round-4 query surface: interval coalescing, Pareto skyline, the forward
  * as-of join (completing the as-of family), integer sliding kernels, and
  * bounded multi-source BFS. Oracles are independent formulations where the
  * operator has a brute-force equivalent (skyline's NOT EXISTS, forward
  * as-of's min-join) so the check proves the distributed trick, not just
  * the arithmetic.
  */
object Entries5 {

  val all: Seq[Q] = Seq(

    // Span coalescing: 30-minute activity intervals per user, overlapping-
    // or-touching spans merged by the linear window sweep. The oracle
    // replays the identical sweep (same tie order), all integer micros.
    Q("q116_interval_coalesce",
      (s, d) => graft.ops.Relational.coalesceIntervals(
        Tables.events(s, d).select(col("user_id"),
          col("ts_us").as("start_us"),
          (col("ts_us") + 1800000000L).as("end_us"), col("event_id")),
        "user_id", "start_us", "end_us", "event_id"),
      Some("""WITH iv AS (
             |  SELECT user_id, epoch_us(ts) AS start_us,
             |    epoch_us(ts) + 1800000000 AS end_us, event_id
             |  FROM events),
             |pm AS (
             |  SELECT user_id, start_us, end_us, event_id,
             |    max(end_us) OVER (PARTITION BY user_id
             |      ORDER BY start_us, end_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
             |  FROM iv),
             |gg AS (
             |  SELECT user_id, start_us, end_us,
             |    sum(CASE WHEN prev_max IS NULL OR start_us > prev_max
             |        THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
             |      ORDER BY start_us, end_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
             |  FROM pm)
             |SELECT user_id, min(start_us) AS interval_start,
             |  max(end_us) AS interval_end, CAST(count(*) AS BIGINT) AS n_rows
             |FROM gg GROUP BY user_id, grp""".stripMargin)),

    // 2-D Pareto skyline (maximize quantity AND price) over distinct pairs
    // of lineitem — "largest + priciest order lines". Spark side is the
    // domain-bounded window sweep; the oracle is an independent NOT EXISTS
    // dominance check over the per-qty price maxima (an equivalent
    // candidate set — any dominator is itself dominated-or-equaled by its
    // column's maximum — that keeps the quadratic check tractable at any
    // sf), so the check proves the sweep enumerates the undominated set.
    Q("q117_skyline",
      (s, d) => graft.ops.Relational.skyline2D(
        Tables.lineitem(s, d).select(
          col("l_quantity").cast("long").as("qty"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_cents")),
        "qty", "price_cents"),
      Some("""WITH p AS (
             |  SELECT CAST(l_quantity AS BIGINT) AS qty,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             |    count(*) AS n_rows
             |  FROM lineitem GROUP BY 1, 2),
             |cand AS (SELECT qty, max(price_cents) AS price_cents
             |         FROM p GROUP BY qty),
             |sky AS (
             |  SELECT a.qty, a.price_cents FROM cand a
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM cand b
             |    WHERE b.qty > a.qty AND b.price_cents >= a.price_cents))
             |SELECT s.qty, s.price_cents, p.n_rows
             |FROM sky s JOIN p USING (qty, price_cents)""".stripMargin)),

    // Forward as-of: each purchase matched to the user's EARLIEST click at
    // or after it (ties on click ts broken by id). Spark runs the
    // union-window formulation; the oracle is the independent min-join.
    Q("q118_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.ops.Snapshots.asOfJoinForward(
          ev.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts_us")),
          ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts_us"),
              col("event_id").as("click_id"),
              col("ts_us").as("click_ts_us")),
          "user_id", "ts_us", "click_id", Seq("click_id", "click_ts_us"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
             |           FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
             |      FROM events WHERE event_type = 'click'),
             |m AS (SELECT p.event_id, min(c.ts_us) AS m_ts
             |      FROM p LEFT JOIN c ON c.user_id = p.user_id
             |        AND c.ts_us >= p.ts_us
             |      GROUP BY p.event_id),
             |pick AS (SELECT p.event_id, m.m_ts, min(c.event_id) AS cid
             |         FROM p JOIN m ON m.event_id = p.event_id
             |         LEFT JOIN c ON c.user_id = p.user_id AND c.ts_us = m.m_ts
             |         GROUP BY 1, 2)
             |SELECT p.user_id, p.ts_us, p.event_id,
             |  pick.cid AS click_id, pick.m_ts AS click_ts_us
             |FROM p JOIN pick ON pick.event_id = p.event_id""".stripMargin)),

    // Integer sliding kernels per user (causal 8-4-2-1 + centered 1-2-1
    // over cents) — division- and transcendental-free smoothing, exact
    // BIGINT in both engines.
    Q("q119_kernel_smooth",
      (s, d) => graft.ops.Relational.kernelSmooth(
        Tables.events(s, d)
          .select(col("user_id"), col("ts_us"), col("event_id"), col("value")),
        "user_id", "ts_us", "event_id", "value"),
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events)
             |SELECT user_id, ts_us, event_id, cents,
             |  cents * 8 + coalesce(lag(cents, 1) OVER w, 0) * 4
             |    + coalesce(lag(cents, 2) OVER w, 0) * 2
             |    + coalesce(lag(cents, 3) OVER w, 0) AS causal_w15,
             |  coalesce(lag(cents, 1) OVER w, 0) + cents * 2
             |    + coalesce(lead(cents, 1) OVER w, 0) AS centered_w4
             |FROM e WINDOW w AS (PARTITION BY user_id
             |  ORDER BY ts_us, event_id)""".stripMargin)),

    // Bounded multi-source BFS (3 hops) from seed nodes (node % 50 = 0)
    // over the undirected customer↔supplier purchase graph — exact integer
    // hop distances, Pregel-as-joins, oracle = 3 unrolled CTE rounds.
    Q("q120_bfs_khop",
      (s, d) => Curation.bfsDistances(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst")),
        col("node") % 50 === 0, 3),
      Some("""WITH e0 AS (
             |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |e AS (SELECT src, dst FROM e0
             |      UNION SELECT dst AS src, src AS dst FROM e0),
             |n AS (SELECT DISTINCT src AS node FROM e),
             |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM n
             |       WHERE node % 50 = 0),
             |d1 AS (SELECT node, min(dist) AS dist FROM (
             |         SELECT node, dist FROM d0
             |         UNION ALL SELECT e.dst AS node, d0.dist + 1 AS dist
             |         FROM e JOIN d0 ON e.src = d0.node) GROUP BY node),
             |d2 AS (SELECT node, min(dist) AS dist FROM (
             |         SELECT node, dist FROM d1
             |         UNION ALL SELECT e.dst AS node, d1.dist + 1 AS dist
             |         FROM e JOIN d1 ON e.src = d1.node) GROUP BY node),
             |d3 AS (SELECT node, min(dist) AS dist FROM (
             |         SELECT node, dist FROM d2
             |         UNION ALL SELECT e.dst AS node, d2.dist + 1 AS dist
             |         FROM e JOIN d2 ON e.src = d2.node) GROUP BY node)
             |SELECT node, dist FROM d3""".stripMargin)),

    // Real iterative BPE merge training (6 rounds) on ascii word types —
    // pair counting, argmax selection, and greedy left-to-right merge
    // application are all exact integer/binary-string ops, so the oracle
    // replays the full training loop with one generated CTE block per round.
    Q("q121_bpe_merges",
      (s, d) => BpeTrainer.train(Tables.documents(s, d), 6),
      Some(bpeOracle(6))),

    // Prefix-filtered set-similarity self-join (16-char shingle Jaccard
    // >= 0.8): the SSJoin/PPJoin prefix + length + positional cascade with
    // exact verify. Oracle is the UNFILTERED all-shared-shingle
    // formulation — hash-match proves the cascade's recall is exact.
    // (Shingles, not words: the 31-word fixture vocabulary degenerates a
    // word-level prefix filter — see Dedup.prefixJaccardPairs doc.)
    Q("q122_prefix_jaccard",
      (s, d) => Dedup.prefixJaccardPairs(Tables.documents(s, d), 16, 4, 5),
      Some("""WITH toks AS (
             |  SELECT DISTINCT doc_id,
             |    ('0x' || substr(md5(substr(text, i + 1, 16)), 1, 12))::BIGINT
             |      AS cid
             |  FROM documents, unnest(range(0, length(text) - 15)) t(i)),
             |ssz AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
             |it AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS ix
             |       FROM toks a JOIN toks b
             |         ON a.cid = b.cid AND a.doc_id < b.doc_id
             |       GROUP BY 1, 2)
             |SELECT d1, d2, ix, sa.sz + sb.sz - ix AS un
             |FROM it JOIN ssz sa ON d1 = sa.doc_id
             |        JOIN ssz sb ON d2 = sb.doc_id
             |WHERE ix * 5 >= 4 * (sa.sz + sb.sz - ix)""".stripMargin)),

    // Robust per-type outlier stats: integer-exact MAD (doubled medians
    // keep even-count interpolation in BIGINT) + the cross-multiplied
    // |x-med| > 3*MAD rule — zero doubles end to end.
    Q("q123_mad_outliers",
      (s, d) => TrainPrep.madOutlierStats(Tables.events(s, d),
        "event_type", expr("CAST(round(value * 100) AS BIGINT)"),
        col("event_id")),
      Some("""WITH base AS (
             |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c,
             |    event_id AS tid
             |  FROM events WHERE value IS NOT NULL),
             |cnt1 AS (SELECT g, count(*) AS n FROM base GROUP BY g),
             |r1 AS (SELECT g, c, tid,
             |         row_number() OVER (PARTITION BY g ORDER BY c, tid) AS rn
             |       FROM base),
             |m1 AS (SELECT r1.g, CAST(sum(c) * 2 // count(*) AS BIGINT) AS med2
             |       FROM r1 JOIN cnt1 ON r1.g = cnt1.g
             |       WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
             |       GROUP BY r1.g),
             |dev AS (SELECT b.g, abs(b.c * 2 - m1.med2) AS d, b.tid, m1.med2
             |        FROM base b JOIN m1 ON b.g = m1.g),
             |cnt2 AS (SELECT g, count(*) AS n FROM dev GROUP BY g),
             |r2 AS (SELECT g, d, tid,
             |         row_number() OVER (PARTITION BY g ORDER BY d, tid) AS rn
             |       FROM dev),
             |m2 AS (SELECT r2.g, CAST(sum(d) * 2 // count(*) AS BIGINT) AS mad4
             |       FROM r2 JOIN cnt2 ON r2.g = cnt2.g
             |       WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
             |       GROUP BY r2.g)
             |SELECT dev.g AS event_type, count(*) AS n, max(dev.med2) AS med2,
             |  max(m2.mad4) AS mad4,
             |  CAST(sum(CASE WHEN dev.d * 2 > m2.mad4 * 3 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers
             |FROM dev JOIN m2 ON dev.g = m2.g GROUP BY 1""".stripMargin))
  )

  /** Generated DuckDB oracle for [[BpeTrainer.train]]: the identical
    * relational formulation, one CTE block per merge round (state s{k} →
    * pair counts p{k} → argmax sel{k} → greedy-run merge sites ch{k} →
    * rewritten state s{k+1}). Every CTE is MATERIALIZED: each state is
    * referenced by multiple downstream CTEs, so default inlining would
    * duplicate the whole prefix per reference — the same 4^rounds blow-up
    * localCheckpoint prevents on the Spark side (measured: runaway vs
    * 0.5 s at sf0.01). */
  private def bpeOracle(iters: Int): String =
    bpeCtes(iters) + "\n" + (1 to iters).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS step, a AS left_sym, b AS right_sym,
         |  a || b AS merged, cnt AS pair_freq FROM sel$k""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Encode oracle: the same training replay, but the answer is the FINAL
    * symbol state (encoding the training corpus with its own merge table
    * reproduces the training end-state). */
  private[graft] def bpeEncodeOracle(iters: Int): String =
    bpeCtes(iters) +
      s"""
         |SELECT w, freq, CAST(count(*) AS BIGINT) AS n_syms,
         |  string_agg(sym, '|' ORDER BY pos) AS encoding
         |FROM s${iters + 1} GROUP BY w, freq""".stripMargin

  private def bpeCtes(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""n$k AS MATERIALIZED (SELECT w, freq, pos, sym,
         |  lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM s$k),
         |p$k AS MATERIALIZED (
         |  SELECT sym AS a, nxt AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM n$k WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |sel$k AS MATERIALIZED (SELECT a, b, cnt FROM p$k
         |  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |mt$k AS MATERIALIZED (SELECT n.w, n.pos,
         |    n.pos - row_number() OVER (PARTITION BY n.w ORDER BY n.pos) AS grp
         |  FROM n$k n, sel$k WHERE n.sym = sel$k.a AND n.nxt = sel$k.b),
         |ch$k AS MATERIALIZED (SELECT w, pos FROM (
         |    SELECT w, pos,
         |      row_number() OVER (PARTITION BY w, grp ORDER BY pos) AS rk
         |    FROM mt$k) WHERE rk % 2 = 1),
         |s${k + 1} AS MATERIALIZED (SELECT w, freq,
         |    row_number() OVER (PARTITION BY w ORDER BY pos) AS pos, sym
         |  FROM (
         |    SELECT s.w, s.freq, s.pos,
         |      CASE WHEN c.pos IS NOT NULL THEN sel.a || sel.b
         |           ELSE s.sym END AS sym
         |    FROM s$k s CROSS JOIN sel$k sel
         |    LEFT JOIN ch$k c ON c.w = s.w AND c.pos = s.pos
         |    LEFT JOIN ch$k cp ON cp.w = s.w AND cp.pos = s.pos - 1
         |    WHERE cp.pos IS NULL))""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+${"$"}') GROUP BY w),
       |s1 AS MATERIALIZED (SELECT w, freq, i AS pos, substr(w, i, 1) AS sym
       |  FROM w0, (SELECT unnest(range(1, 256)) AS i) t WHERE i <= len(w)),
       |$rounds""".stripMargin
  }
}
