package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q
import graft.ext.Dedup

/** Round-9 batch 6 — back to the data-pipeline axis: rarity-weighted
  * Jaccard, boilerplate detection via lexicographic LCP, fulfillment fill
  * rate, a measured Bloom false-positive census, Tukey fence outlier
  * counts, and the duplicate-cluster size census over the q48 clustering.
  */
object Entries62 {

  val all: Seq[Q] = Seq(

    // RARITY-WEIGHTED JACCARD: same inverted-index candidate generation as
    // the exact n-gram Jaccard (q21), but shingles weighted by integer
    // rarity w = N DIV df — two docs sharing RARE shingles score higher
    // than two sharing boilerplate. wJ = Σ_inter w / (Σ_a w + Σ_b w −
    // Σ_inter w), all BIGINT until one final ppm floor. The weighting is
    // what makes shared boilerplate stop mattering at corpus scale.
    Q("q351_weighted_jaccard",
      (s, d) => {
        // persisted: sh (the corpus-wide shingle explode) feeds the df
        // census AND the weighted join; shw feeds totals and BOTH sides of
        // the intersection self-join — uncached, the explode replans 8
        // times (plan census r8)
        val sh = Dedup.shingleIds(Tables.documents(s, d), 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nDocs = Tables.documents(s, d).count()
        val w = sh.groupBy(col("sid")).agg(count(lit(1)).as("df"))
          .select(col("sid"), expr(s"${nDocs}L DIV df").as("w"))
        val shw = sh.join(w, Seq("sid"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = shw.groupBy(col("doc_id")).agg(sum(col("w")).as("tw"))
        val inter = shw.as("a")
          .join(shw.as("b"),
            col("a.sid") === col("b.sid") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .agg(sum(col("a.w")).as("iw"))
        inter
          .join(tot.select(col("doc_id").as("d1"), col("tw").as("twa")),
            Seq("d1"))
          .join(tot.select(col("doc_id").as("d2"), col("tw").as("twb")),
            Seq("d2"))
          .select(col("d1"), col("d2"), col("iw"),
            expr("(iw * 1000000L) DIV (twa + twb - iw)").as("wj_ppm"))
          .filter(col("wj_ppm") >= 300000L)
      },
      Some(s"""WITH ${ExtEntries.shinglesCte}, ${ExtEntries.shingleIdCte},
             |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |w AS (
             |  SELECT sid, n // CAST(count(*) AS BIGINT) AS w
             |  FROM shid CROSS JOIN nd GROUP BY sid, n),
             |shw AS (SELECT doc_id, shid.sid, w FROM shid
             |        JOIN w ON shid.sid = w.sid),
             |tw AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS tw
             |       FROM shw GROUP BY 1),
             |inter AS (
             |  SELECT a.doc_id AS d1, b.doc_id AS d2,
             |    CAST(sum(a.w) AS BIGINT) AS iw
             |  FROM shw a JOIN shw b
             |    ON a.sid = b.sid AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT d1, d2, iw,
             |  (iw * 1000000) // (ta.tw + tb.tw - iw) AS wj_ppm
             |FROM inter JOIN tw ta ON d1 = ta.doc_id
             |           JOIN tw tb ON d2 = tb.doc_id
             |WHERE (iw * 1000000) // (ta.tw + tb.tw - iw)
             |  >= 300000""".stripMargin)),

    // BOILERPLATE DETECTION via the LCP trick: the longest common prefix
    // of a SET of strings equals lcp(lexicographic min, lexicographic
    // max) — so per-source boilerplate costs one min/max aggregate plus a
    // bounded character scan on two strings, never a cross join. The
    // shared-template smell test next to the shingle-level q281/q286.
    Q("q352_boilerplate_lcp",
      (s, d) => {
        val mm = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), min(col("text")).as("mn"),
            max(col("text")).as("mx"))
        mm.withColumn("lim",
            least(length(col("mn")), length(col("mx"))).cast("int"))
          .withColumn("lcp_len", coalesce(
            expr("""array_min(filter(transform(sequence(1, lim),
                   | i -> CASE WHEN substring(mn, i, 1)
                   |   <> substring(mx, i, 1) THEN i ELSE NULL END),
                   | p -> p IS NOT NULL))""".stripMargin.replace("\n", " "))
              - 1, col("lim")).cast("long"))
          .select(col("source"), col("n_docs"), col("lcp_len"),
            (col("lcp_len") >= 20L).as("boilerplate"))
      },
      Some("""WITH mm AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    min(text) AS mn, max(text) AS mx
             |  FROM documents GROUP BY 1),
             |l AS (
             |  SELECT source, n_docs,
             |    least(len(mn), len(mx)) AS lim, mn, mx
             |  FROM mm)
             |SELECT source, n_docs,
             |  CAST(COALESCE(list_min(list_filter(list_transform(
             |      range(1, lim + 1),
             |      i -> CASE WHEN substr(mn, CAST(i AS INT), 1)
             |        <> substr(mx, CAST(i AS INT), 1)
             |        THEN i ELSE NULL END), p -> p IS NOT NULL)) - 1,
             |    lim) AS BIGINT) AS lcp_len,
             |  CAST(COALESCE(list_min(list_filter(list_transform(
             |      range(1, lim + 1),
             |      i -> CASE WHEN substr(mn, CAST(i AS INT), 1)
             |        <> substr(mx, CAST(i AS INT), 1)
             |        THEN i ELSE NULL END), p -> p IS NOT NULL)) - 1,
             |    lim) AS BIGINT) >= 20 AS boilerplate
             |FROM l""".stripMargin)),

    // FILL RATE: orders by line-status completeness — fully filled (every
    // line 'F'), partial, or open. The fulfillment KPI over the order
    // grain: one aggregate to order level, one census rollup.
    Q("q353_fill_rate",
      (s, d) => {
        val byOrder = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("l_linestatus") === "F", 1L).otherwise(0L))
              .as("n_f"))
          .withColumn("state",
            when(col("n_f") === col("n_lines"), "filled")
              .when(col("n_f") === 0L, "open").otherwise("partial"))
        byOrder.groupBy(col("state"))
          .agg(count(lit(1)).as("n_orders"), sum(col("n_lines")).as("lines"),
            sum(col("n_f")).as("lines_filled"))
      },
      Some("""WITH o AS (
             |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
             |    CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_f
             |  FROM lineitem GROUP BY 1)
             |SELECT CASE WHEN n_f = n_lines THEN 'filled'
             |            WHEN n_f = 0 THEN 'open'
             |            ELSE 'partial' END AS state,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(sum(n_lines) AS BIGINT) AS lines,
             |  CAST(sum(n_f) AS BIGINT) AS lines_filled
             |FROM o GROUP BY 1""".stripMargin)),

    // MEASURED BLOOM FALSE-POSITIVE RATE: the q213 filter's (m=2^20, k=3,
    // double-hashing) membership arithmetic, fed a probe set DISJOINT
    // from the key set by construction — every hit is a false positive.
    // The relational form of the bit test (3 semi-joins on positions) is
    // the cross-engine-honest formulation; the blob path is pinned in its
    // own spec. The empirical sibling of the q295/q168 accuracy gates.
    Q("q354_bloom_fpr",
      (s, d) => {
        def h48(c: org.apache.spark.sql.Column) =
          conv(substring(md5(c), 1, 12), 16, 10).cast("long")
        def pos(h: org.apache.spark.sql.Column, i: Int) =
          (pmod(h, lit(1048576L)) + lit(i.toLong) *
            shiftright(h, 20).bitwiseOR(lit(1L))) % lit(1048576L)
        // persisted (plan census r9): keys feed the bit set AND the key
        // count; the bit set is probed by all three semi-join rounds
        val keys = Tables.customer(s, d)
          .select(h48(concat(lit("key:"), col("c_custkey"))).as("h"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bits = keys
          .select(explode(array((0 until 3).map(i => pos(col("h"), i)): _*))
            .as("p")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val probes = s.range(100000)
          .select(h48(concat(lit("probe:"), col("id"))).as("h"))
        val hits = (0 until 3).foldLeft(
          probes.withColumn("ok", lit(true))) { (cur, i) =>
          cur.join(bits.select(col("p").as(s"p$i")),
              pos(col("h"), i) === col(s"p$i"), "left_semi")
        }
        val nk = keys.count()
        hits.agg(count(lit(1)).as("n_false_pos"))
          .select(lit(nk).as("n_keys"), lit(100000L).as("n_probes"),
            col("n_false_pos"),
            expr("(n_false_pos * 1000000L) DIV 100000L").as("fpr_ppm"))
      },
      Some("""WITH keys AS (
             |  SELECT ('0x' || substr(md5('key:' || CAST(c_custkey
             |    AS VARCHAR)), 1, 12))::BIGINT AS h
             |  FROM customer),
             |bits AS (
             |  SELECT DISTINCT (h % 1048576 + i * ((h >> 20) | 1))
             |    % 1048576 AS p
             |  FROM keys CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
             |probes AS (
             |  SELECT ('0x' || substr(md5('probe:' || CAST(id
             |    AS VARCHAR)), 1, 12))::BIGINT AS h
             |  FROM (SELECT unnest(range(0, 100000)) AS id)),
             |hits AS (
             |  SELECT h FROM probes
             |  WHERE (h % 1048576 + 0 * ((h >> 20) | 1)) % 1048576
             |      IN (SELECT p FROM bits)
             |    AND (h % 1048576 + 1 * ((h >> 20) | 1)) % 1048576
             |      IN (SELECT p FROM bits)
             |    AND (h % 1048576 + 2 * ((h >> 20) | 1)) % 1048576
             |      IN (SELECT p FROM bits))
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM keys) AS n_keys,
             |  CAST(100000 AS BIGINT) AS n_probes,
             |  CAST(count(*) AS BIGINT) AS n_false_pos,
             |  (CAST(count(*) AS BIGINT) * 1000000) // 100000 AS fpr_ppm
             |FROM hits""".stripMargin)),

    // TUKEY FENCE OUTLIER CENSUS per returnflag: exact quartiles located
    // on the reduced price-value domain (the q132 shape), fences kept
    // integer by doubling (lo×2 = 5·Q1 − 3·Q3), and one counting pass.
    // The classic box-plot rule beside the robust MAD (q123) and Hampel
    // (q190) detectors.
    Q("q355_tukey_fences",
      (s, d) => {
        // persisted (plan census r9): the value-domain rollup, the group
        // totals and the fence count all read the same two columns
        val fact = Tables.lineitem(s, d)
          .select(col("l_returnflag").as("g"),
            round(col("l_extendedprice") * 100).cast("long").as("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dom = fact.groupBy(col("g"), col("v"))
          .agg(count(lit(1)).as("cnt"))
        val wg = Window.partitionBy(col("g")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = dom.withColumn("cum", sum(col("cnt")).over(wg))
        val tot = fact.groupBy(col("g")).agg(count(lit(1)).as("n"))
        val qs = cum.join(broadcast(tot), Seq("g"))
          .groupBy(col("g"), col("n"))
          .agg(
            min(when(col("cum") >= expr("(n + 3) DIV 4"), col("v")))
              .as("q1"),
            min(when(col("cum") >= expr("(3 * n + 3) DIV 4"), col("v")))
              .as("q3"))
        fact.join(broadcast(qs), Seq("g"))
          .groupBy(col("g"), col("n"), col("q1"), col("q3"))
          .agg(
            sum(when(col("v") * 2 < lit(5L) * col("q1") - lit(3L) * col("q3"),
              1L).otherwise(0L)).as("n_low"),
            sum(when(col("v") * 2 > lit(5L) * col("q3") - lit(3L) * col("q1"),
              1L).otherwise(0L)).as("n_high"))
          .select(col("g").as("l_returnflag"), col("n"), col("q1"),
            col("q3"), col("n_low"), col("n_high"))
      },
      Some("""WITH f AS (
             |  SELECT l_returnflag AS g,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
             |  FROM lineitem),
             |dom AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
             |        FROM f GROUP BY 1, 2),
             |cum AS (
             |  SELECT g, v, CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cum
             |  FROM dom),
             |tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n
             |        FROM f GROUP BY 1),
             |qs AS (
             |  SELECT cum.g, n,
             |    min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS q1,
             |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS q3
             |  FROM cum JOIN tot ON cum.g = tot.g
             |  GROUP BY 1, 2)
             |SELECT f.g AS l_returnflag, n, q1, q3,
             |  CAST(sum(CASE WHEN v * 2 < 5 * q1 - 3 * q3 THEN 1
             |    ELSE 0 END) AS BIGINT) AS n_low,
             |  CAST(sum(CASE WHEN v * 2 > 5 * q3 - 3 * q1 THEN 1
             |    ELSE 0 END) AS BIGINT) AS n_high
             |FROM f JOIN qs ON f.g = qs.g
             |GROUP BY 1, 2, 3, 4""".stripMargin)),

    // DUPLICATE-CLUSTER SIZE CENSUS over the q48 near-dup clustering: how
    // much of the corpus sits in families of 1, 2, 3… — the one-table
    // answer to "how redundant is this corpus", and the denominator for
    // dedup-savings estimates. Cluster sizes → size histogram.
    Q("q356_dup_cluster_census",
      (s, d) => {
        val clusters = Dedup.nearDupClusters(Tables.documents(s, d),
          Dedup.ngramJaccardPairs(Tables.documents(s, d), 3, 0.5))
        clusters.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("sz"))
          .agg(count(lit(1)).as("n_clusters"),
            (count(lit(1)) * col("sz")).as("n_docs"))
          .select(col("sz").as("cluster_size"), col("n_clusters"),
            col("n_docs"))
      },
      Some(s"""WITH RECURSIVE ${ExtEntries.shinglesCte},
              |${ExtEntries.shingleIdCte}, ${ExtEntries.shingleCountCte},
              |${ExtEntries.shingleInterCte},
              |pairs AS (
              |  SELECT d1, d2 FROM shint
              |  JOIN shcnt ca ON d1 = ca.doc_id
              |  JOIN shcnt cb ON d2 = cb.doc_id
              |  WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.5),
              |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
              |          UNION ALL SELECT d2, d1 FROM pairs),
              |reach(doc_id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT reach.doc_id, e.b FROM reach
              |  JOIN edges e ON e.a = reach.r),
              |cl AS (SELECT doc_id, min(r) AS cluster_id
              |       FROM reach GROUP BY doc_id),
              |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
              |       FROM cl GROUP BY 1)
              |SELECT sz AS cluster_size,
              |  CAST(count(*) AS BIGINT) AS n_clusters,
              |  CAST(count(*) AS BIGINT) * sz AS n_docs
              |FROM sz GROUP BY sz""".stripMargin)))
}
