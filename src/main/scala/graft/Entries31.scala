package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 10: keyword extraction, OOV-rate gate, log2 histograms,
  * cross-source vocabulary overlap, declarative expectations engine.
  */
object Entries31 {

  val all: Seq[Q] = Seq(

    // KEYWORD EXTRACTION: top-3 terms per document by the log-free
    // tf·(N/df) relevance — cross-multiplied integer ORDERING (tf₁·N/df₁ >
    // tf₂·N/df₂ ⟺ tf₁·df₂ > tf₂·df₁, so rank needs no division at all;
    // emitted score is the exact integer pair (tf, df)). WindowGroupLimit
    // caps mapper output at 3/doc; document frequencies aggregate over the
    // distinct (doc, word) reduce.
    Q("q241_keywords",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val tf = words.groupBy(col("doc_id"), col("w"))
          .agg(count(lit(1)).as("tf"))
          // df aggregate + rank join both consume it
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        // rank by tf/df (N constant per rank scope): tf·df' comparison ⟺
        // exact rational order; ties by word for determinism
        val w = Window.partitionBy(col("doc_id"))
          .orderBy((col("tf").cast("double") / col("df")).desc,
            col("w").asc)
        tf.join(df, Seq("w"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("w"), col("tf"), col("df"))
      },
      Some("""WITH wrds AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM wrds GROUP BY 1, 2),
             |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY 1)
             |SELECT doc_id, rk, w, tf, df FROM (
             |  SELECT t.doc_id, t.w, t.tf, dfx.df,
             |    CAST(row_number() OVER (PARTITION BY t.doc_id
             |      ORDER BY CAST(t.tf AS DOUBLE) / dfx.df DESC, t.w)
             |      AS BIGINT) AS rk
             |  FROM tf t JOIN dfx ON t.w = dfx.w)
             |WHERE rk <= 3""".stripMargin)),

    // OOV-RATE GATE per source: tokens not covered by the top-100 corpus
    // vocabulary (the q73 vocab), as exact integer (oov, total) pairs —
    // the "will my tokenizer handle this source" coverage check a corpus
    // release runs before training. Vocabulary is a ≤100-row broadcast.
    Q("q242_oov_rate",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          // vocab build + probe side both consume it
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("n"))
          .withColumn("vocab_id", row_number().over(
            Window.orderBy(col("n").desc, col("w").asc)).cast("long"))
          .filter(col("vocab_id") <= 100)
          .select(col("w"), lit(true).as("in_vocab"))
        words.join(broadcast(vocab), Seq("w"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
              .as("n_oov"))
      },
      Some("""WITH wrds AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |voc AS (
             |  SELECT w FROM (
             |    SELECT w, row_number() OVER (ORDER BY count(*) DESC, w)
             |      AS vocab_id
             |    FROM wrds GROUP BY w)
             |  WHERE vocab_id <= 100)
             |SELECT source, count(*) AS n_tokens,
             |  CAST(sum(CASE WHEN voc.w IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_oov
             |FROM wrds LEFT JOIN voc ON wrds.w = voc.w
             |GROUP BY 1""".stripMargin)),

    // POWER-OF-TWO LENGTH HISTOGRAM per source: bucket = ⌊log₂ n_chars⌋
    // computed EXACTLY as length(bin(x)) − 1 — integer bit-math, no
    // floating log (the no-transcendentals discipline applied to the one
    // place everyone reaches for log2). The sequence-length profile that
    // sizes training batch buckets.
    Q("q243_log2_hist",
      (s, d) => Tables.documents(s, d)
        .select(col("source"),
          (length(bin(col("n_chars"))) - 1).cast("long").as("log2_bucket"))
        .groupBy(col("source"), col("log2_bucket"))
        .agg(count(lit(1)).as("n_docs")),
      Some("""SELECT source,
             |  CAST(length(bin(n_chars)) - 1 AS BIGINT) AS log2_bucket,
             |  count(*) AS n_docs
             |FROM documents GROUP BY 1, 2""".stripMargin)),

    // CROSS-SOURCE VOCABULARY OVERLAP: for every source pair, the exact
    // (intersection, union) of their distinct-word sets — the corpus
    // homogeneity matrix behind mixture decisions (q103). Word sets
    // reduce per (source, word) FIRST; the pair join fans out per word by
    // its source count (bounded by |sources| = 20), never |docs|².
    Q("q244_vocab_overlap",
      (s, d) => {
        val sw = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .distinct()
          // sizes + both pair sides consume it
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sizes = sw.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val pairs = sw.select(col("source").as("s1"), col("w"))
          .join(sw.select(col("source").as("s2"), col("w")), Seq("w"))
          .filter(col("s1") < col("s2"))
          .groupBy(col("s1"), col("s2"))
          .agg(count(lit(1)).as("n_inter"))
        pairs
          .join(broadcast(sizes.select(col("source").as("s1"),
            col("n").as("n1"))), Seq("s1"))
          .join(broadcast(sizes.select(col("source").as("s2"),
            col("n").as("n2"))), Seq("s2"))
          .select(col("s1"), col("s2"), col("n_inter"),
            (col("n1") + col("n2") - col("n_inter")).as("n_union"))
      },
      Some("""WITH sw AS (
             |  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |sizes AS (SELECT source, count(*) AS n FROM sw GROUP BY 1),
             |pairs AS (
             |  SELECT a.source AS s1, b.source AS s2, count(*) AS n_inter
             |  FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT p.s1, p.s2, p.n_inter,
             |  z1.n + z2.n - p.n_inter AS n_union
             |FROM pairs p
             |JOIN sizes z1 ON p.s1 = z1.source
             |JOIN sizes z2 ON p.s2 = z2.source""".stripMargin)),

    // DECLARATIVE EXPECTATIONS: a data-contract run over orders — each
    // rule one row (check, passed, n_violations), all from ONE scan
    // (conditional aggregates), plus a uniqueness rule from one more
    // aggregate. The Great-Expectations-lite promote gate, exact; the
    // row-level DQ profile (q79) is its column-stats sibling.
    Q("q245_expectations",
      (s, d) => {
        val o = Tables.orders(s, d)
        val scanChecks = o.agg(
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
            .as("v_key_null"),
          sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L))
            .as("v_price_pos"),
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L)).as("v_status_enum"),
          sum(when(col("o_orderdate") < to_date(lit("1990-01-01")) ||
            col("o_orderdate") > to_date(lit("2010-01-01")), 1L)
            .otherwise(0L)).as("v_date_range"))
        val dup = o.groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"))
          .agg(sum(when(col("n") > 1, col("n"))).as("v"))
          .select(lit("key_unique").as("check"),
            coalesce(col("v"), lit(0L)).as("n_violations"))
        val long_ = scanChecks.select(expr(
          "stack(4, 'key_not_null', v_key_null, 'price_positive', " +
            "v_price_pos, 'status_enum', v_status_enum, 'date_range', " +
            "v_date_range) AS (check, n_violations)"))
        long_.unionByName(dup)
          .select(col("check"), col("n_violations"),
            (col("n_violations") === 0L).as("passed"))
      },
      Some("""WITH scan AS (
             |  SELECT
             |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS v_key_null,
             |    CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS v_price_pos,
             |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS v_status_enum,
             |    CAST(sum(CASE WHEN o_orderdate < DATE '1990-01-01'
             |      OR o_orderdate > DATE '2010-01-01' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS v_date_range
             |  FROM orders),
             |dup AS (
             |  SELECT 'key_unique' AS "check", CAST(coalesce(sum(
             |    CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS n_violations
             |  FROM (SELECT o_orderkey, count(*) AS n FROM orders
             |    GROUP BY 1)),
             |long AS (
             |  SELECT 'key_not_null' AS "check", v_key_null AS n_violations
             |    FROM scan
             |  UNION ALL SELECT 'price_positive', v_price_pos FROM scan
             |  UNION ALL SELECT 'status_enum', v_status_enum FROM scan
             |  UNION ALL SELECT 'date_range', v_date_range FROM scan
             |  UNION ALL SELECT * FROM dup)
             |SELECT "check", n_violations, n_violations = 0 AS passed
             |FROM long""".stripMargin)))
}
