package graft

import org.apache.spark.sql.functions._
import graft.ext.Eval
import graft.ops.Sessions

/** Batch-2 round-4 operators pinned against hand-computed values and
  * brute-force references: sufficient-stats regression, rank-AUC (with tie
  * correction), Markov transitions, cohort retention.
  */
class Round4bSpec extends SparkSpec {
  import spark.implicits._

  test("groupRegression recovers an exact linear fit and its statistics") {
    // y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
    val df = Seq(("a", 1L, 3L), ("a", 2L, 5L), ("a", 3L, 7L), ("a", 4L, 9L))
      .toDF("grp", "x", "y")
    val r = Eval.groupRegression(df, "grp", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("groupRegression matches the textbook formulas on noisy data") {
    val pts = Seq((1L, 2L), (2L, 1L), (3L, 5L), (4L, 4L), (5L, 9L), (6L, 6L))
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("grp", "x", "y")
    val r = Eval.groupRegression(df, "grp", "x", "y").collect()(0)
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept")
      - (sy - slope * sx) / n) < 1e-12)
  }

  test("rankAuc equals the brute-force pairwise win/tie count") {
    // scores with ties across labels: pos {3, 2, 2}, neg {2, 1}
    val df = Seq((3L, true), (2L, true), (2L, true), (2L, false), (1L, false))
      .toDF("score", "label")
    val r = Eval.rankAuc(df, "score", "label").collect()(0)
    // pairs: (3 vs 2)=1 (3 vs 1)=1 (2 vs 2)=.5 (2 vs 1)=1 (2 vs 2)=.5 (2 vs 1)=1
    // auc = 5/6
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("auc_num2") == 10L) // 2*sum = 2*(1+1+.5+1+.5+1)
    assert(math.abs(r.getAs[Double]("auc") - 5.0 / 6.0) < 1e-15)
  }

  test("rankAuc on fixture events equals a brute-force O(n^2)-free check") {
    val ev = Tables.events(spark, sf)
      .select(round($"value" * 100).cast("long").as("score"),
        ($"event_type" === "purchase").as("label"))
      .filter($"score".isNotNull)
    val rows = ev.as[(Long, Boolean)].collect()
    val pos = rows.filter(_._2).map(_._1).sorted
    val neg = rows.filterNot(_._2).map(_._1).sorted
    // brute force via per-positive binary searches over sorted negatives
    var num2 = 0L
    pos.foreach { p =>
      val below = neg.count(_ < p).toLong // fine at fixture size
      val ties = neg.count(_ == p).toLong
      num2 += 2 * below + ties
    }
    val r = Eval.rankAuc(ev.toDF("score", "label"), "score", "label")
      .collect()(0)
    assert(r.getAs[Long]("auc_num2") == num2)
    assert(r.getAs[Long]("n_pos") == pos.length.toLong)
  }

  test("markovTransitions counts adjacent pairs per user in time order") {
    val df = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (2L, 10L, 4L, "a"), (2L, 20L, 5L, "b")
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Sessions.markovTransitions(df)
      .select($"prev_type", $"next_type", $"n_trans", $"total_from_prev")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L, 2L), ("b", "a", 1L, 1L)))
  }

  test("heavyHitters candidate pruning loses no true heavy hitter") {
    // threshold low enough that the naive groupBy is cheap to compare
    val toks = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tok"))
    val got = graft.ext.Sketches.heavyHitters(toks, "tok", 50L)
      .as[(String, Long)].collect().toSet
    val expect = toks.groupBy($"tok").count().filter($"count" >= 50L)
      .as[(String, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("heavyHitters is exact even when items straddle many partitions") {
    // 64 copies of "hot" spread over 8 partitions (8 per partition), local
    // threshold ceil(16/8)=2 <= 8 so the candidate pass must emit it;
    // "cold" appears once per partition and must NOT survive the recount
    val df = spark.range(0, 64, 1, 8)
      .selectExpr("CASE WHEN id % 2 = 0 THEN 'hot' ELSE concat('cold', id) END AS item")
    val got = graft.ext.Sketches.heavyHitters(df, "item", 16L)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("hot", 32L)))
  }

  test("heavyHitters degradation guards stay exact: candidate cap hit " +
    "and pigeonhole floor both fall back to the two-phase aggregate") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tok"))
    val expect = toks.groupBy($"tok").count().filter($"count" >= 50L)
      .as[(String, Long)].collect().toSet
    // cap = 0: every candidate set exceeds it → naive fallback
    val capped = graft.ext.Sketches
      .heavyHitters(toks, "tok", 50L, maxBroadcastCandidates = 0L)
      .as[(String, Long)].collect().toSet
    assert(capped == expect)
    // threshold <= partition count: localThr = 1, prune rejects nothing
    // → pass 1 skipped entirely, still exact
    val p = toks.rdd.getNumPartitions.toLong
    val lowThr = graft.ext.Sketches.heavyHitters(toks, "tok", p)
    val expectLow = toks.groupBy($"tok").count().filter($"count" >= p)
      .as[(String, Long)].collect().toSet
    assert(lowThr.as[(String, Long)].collect().toSet == expectLow)
  }

  test("weightedSample takes exactly k per group, ordered by hash/weight") {
    val docs = Tables.documents(spark, sf)
    val got = graft.ext.TrainPrep.weightedSample(docs, "source", "doc_id",
      "n_chars", 5)
    val counts = got.groupBy($"source").count().as[(String, Long)].collect()
    assert(counts.forall(_._2 == 5L) && counts.nonEmpty)
    // rank-1 row per source is the argmin of the priority (brute force)
    val raw = docs.select($"source", $"doc_id",
      graft.ext.Dedup.contentId($"doc_id".cast("string")).cast("double") /
        $"n_chars".cast("double"))
      .as[(String, Long, Double)].collect()
    val argmin = raw.groupBy(_._1).map { case (s, rs) =>
      s -> rs.minBy(r => (r._3, r._2))._2
    }
    got.filter($"rk" === 1).select($"source", $"doc_id")
      .as[(String, Long)].collect()
      .foreach { case (s, id) => assert(argmin(s) == id) }
  }

  test("kCore reaches the true k-core on a hand-built graph") {
    // triangle {1,2,3} plus a tail 3-4-5: 2-core = the triangle
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = graft.ext.Curation.kCore(edges, 2, 4)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("JaroWinkler matches DuckDB/rapidfuzz on pinned probe values") {
    import graft.functions.JaroWinklerImpl.jw
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // probed from duckdb jaro_winkler_similarity (exact doubles)
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0), // rapidfuzz convention, NOT the textbook 1.0
      ("a", "b", 0.0),
      ("crate", "trace", 0.7333333333333334),
      ("dwayne", "duane", 0.8400000000000001),
      ("ab", "ba", 0.0),
      ("aBc", "abc", 0.7999999999999999), // case-sensitive, prefix 1
      ("abcdxxxxxxx", "abcdyyyyyyy", 0.5757575757575758), // no boost <= 0.7
      ("abcdefg", "abcdefz", 0.9428571428571428)) // prefix capped at 4
    cases.foreach { case (a, b, want) =>
      assert(jw(u(a), u(b)) == want, s"jw($a, $b)")
    }
  }

  test("jaro_winkler expression is codegen'd and null-propagating") {
    graft.functions.GraftFunctions.register(spark)
    // literal pairs constant-fold (proving interpreted eval); null propagates
    val folded = Seq(("martha", "marhta"), (null, "x")).toDF("a", "b")
      .selectExpr("jaro_winkler(a, b) AS j")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(folded.toSeq == Seq(Some(0.9611111111111111), None))
    // a non-foldable source exercises doGenCode inside WholeStageCodegen
    val df = Tables.customer(spark, sf)
      .selectExpr("jaro_winkler(c_name, 'Customer#000000000') AS j")
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(df.queryExecution.executedPlan.toString
      .contains("*(1) Project [jaro_winkler"))
    assert(df.filter($"j" > 0.9).count() > 0)
  }

  test("targetEncodeLOO excludes the row's own target; singletons are null") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 7L)).toDF("id", "cat", "y")
    val got = graft.ext.TrainPrep
      .targetEncodeLOO(df, "cat", "id", col("y"))
      .select($"id", $"loo_cents").as[(Long, Option[Double])]
      .collect().toMap
    assert(got(1L).contains(25.0) && got(2L).contains(20.0) &&
      got(3L).contains(15.0) && got(4L).isEmpty)
  }

  test("winsorize clips to the exact ceil-rank order statistics") {
    // n=20 values 1..20 in one group: lo = rank ceil(1) = 1, hi = rank 19
    val df = (1L to 20L).map(i => ("g", i, i)).toDF("grp", "id", "v")
    val got = graft.ext.TrainPrep.winsorize(df, "grp", "id", col("v"))
    val lo = got.agg(min($"c_winsor")).as[Long].collect()(0)
    val hi = got.agg(max($"c_winsor")).as[Long].collect()(0)
    assert(lo == 1L && hi == 19L)
    assert(got.filter($"clipped" === 1).count() == 1) // only 20 clipped
    assert(got.filter($"clipped" === -1).count() == 0)
  }

  test("hardNegatives never returns the query's own label and is top-k") {
    graft.functions.GraftFunctions.register(spark)
    val got = graft.ext.Similarity
      .hardNegatives(Tables.embeddings(spark, sf), 10, 3)
    val rows = got.select($"q_id", $"q_label", $"n_label", $"rank")
      .as[(Long, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, ql, nl, _) => ql != nl })
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length))
    }
  }

  test("postingLists and phraseSearch pin the positional-index semantics") {
    val docs = Seq((1L, "a b a b"), (2L, "b a b x")).toDF("doc_id", "text")
    val pl = graft.ext.TextAnalysis.postingLists(docs)
      .select($"term", $"doc_id", $"n_occ", $"positions", $"n_docs")
      .as[(String, Long, Long, String, Long)].collect().toSet
    assert(pl == Set(
      ("a", 1L, 2L, "0,2", 2L), ("a", 2L, 1L, "1", 2L),
      ("b", 1L, 2L, "1,3", 2L), ("b", 2L, 2L, "0,2", 2L),
      ("x", 2L, 1L, "3", 1L)))
    // most frequent bigram: "a b" (3) beats "b a" (2); occurrences per doc
    val ph = graft.ext.TextAnalysis.phraseSearch(docs)
      .select($"doc_id", $"w1", $"w2", $"n_matches", $"first_pos")
      .as[(Long, String, String, Long, Long)].collect().toSet
    assert(ph == Set((1L, "a", "b", 2L, 0L), (2L, "a", "b", 1L, 1L)))
  }

  test("sortedNeighborhood candidates stay within block and window") {
    graft.functions.GraftFunctions.register(spark)
    val got = graft.ext.Dedup
      .sortedNeighborhoodPairs(Tables.documents(spark, sf), 2, 0.0)
    // every candidate pair shares the blocking key and d1 != d2
    val rows = got.select($"blk", $"d1", $"d2").collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(1) != r.getLong(2)))
    // high-threshold pairs are a subset of the low-threshold candidates
    val hi = graft.ext.Dedup
      .sortedNeighborhoodPairs(Tables.documents(spark, sf), 2, 0.95)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val lo = got.select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(hi.subsetOf(lo))
  }

  test("BPE encode applies merges greedily left-to-right in order") {
    val docs = Seq((1L, "abab abab aa")).toDF("doc_id", "text")
    // merge 1: (a,b) -> ab ; merge 2: (ab,ab) -> abab
    val got = graft.ext.BpeTrainer
      .encode(docs, Seq(("a", "b"), ("ab", "ab")))
      .select($"w", $"freq", $"n_syms", $"encoding")
      .as[(String, Long, Long, String)].collect().toSet
    assert(got == Set(("abab", 2L, 1L, "abab"), ("aa", 1L, 2L, "a|a")))
    // and encoding the corpus with its own trained merges equals the
    // training end-state (the oracle's identity)
    val corpus = Tables.documents(spark, sf)
    val merges = graft.ext.BpeTrainer.train(corpus, 3).collect()
      .sortBy(_.getAs[Long]("step"))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length == 3)
    val enc = graft.ext.BpeTrainer.encode(corpus, merges)
    assert(enc.count() > 0)
  }

  test("cohortRetention buckets by first-activity bucket with offset-0 size") {
    // buckets of 100us; user 1 starts bucket 0 active in 0,2; user 2 starts
    // bucket 0; user 3 starts bucket 2
    val df = Seq(
      (1L, 10L), (1L, 250L), (2L, 50L), (3L, 210L), (3L, 260L)
    ).toDF("user_id", "ts_us")
    val got = Sessions.cohortRetention(df, 100L)
      .select($"cohort", $"offset_buckets", $"n_active", $"cohort_size")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 2L, 2L), (0L, 2L, 1L, 2L), (2L, 0L, 1L, 1L)))
  }
}
