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
