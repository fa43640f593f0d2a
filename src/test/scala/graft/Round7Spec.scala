package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Eval, Similarity, TrainPrep}
import graft.functions.GraftFunctions
import graft.ops.{Relational, Snapshots}

/** Round-6 batch 1: nearest-tolerance join, Count-Min sketch, LSH recall
  * gate, survivorship merge. Each pinned against a brute-force reference or
  * a structural invariant computed differently. */
class Round7Spec extends SparkSpec {

  import spark.implicits._

  test("nearestJoin: matches the brute-force argmin with backward tie-break") {
    val left = Seq(
      (1L, 100L, "a"), (1L, 205L, "b"), (1L, 400L, "c"),
      (2L, 50L, "d"), (3L, 10L, "e"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 90L, 900L), (1L, 210L, 2100L), (1L, 200L, 2000L),
      (2L, 500L, 5000L))
      .toDF("k", "ts", "v")
    val tol = 20L
    val out = Snapshots.nearestJoin(left, right, "k", "ts", "ts", tol,
      Seq("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toMap
    val rightRows = Seq((1L, 90L, 900L), (1L, 210L, 2100L), (1L, 200L, 2000L),
      (2L, 500L, 5000L))
    def brute(k: Long, ts: Long): Option[(Long, Long)] = {
      val c = rightRows.filter(r => r._1 == k && math.abs(r._2 - ts) <= tol)
      // min distance, earlier right ts on tie (backward preferred)
      if (c.isEmpty) None
      else Some {
        val best = c.minBy(r => (math.abs(r._2 - ts), r._2))
        (best._3, best._2)
      }
    }
    for ((k, ts) <- Seq((1L, 100L), (1L, 205L), (1L, 400L), (2L, 50L), (3L, 10L))) {
      val expected = brute(k, ts)
      assert(out((k, ts))._1 === expected.map(_._1),
        s"payload for ($k,$ts)")
      assert(out((k, ts))._2 === expected.map(_._2), s"r_ts for ($k,$ts)")
    }
    // (1,205): backward 200 (d=5) beats forward 210 (d=5) on the tie
    assert(out((1L, 205L))._2 === Some(200L))
  }

  test("cms: estimate >= exact for every key; merge across partitionings identical") {
    GraftFunctions.register(spark)
    val keys = Tables.lineitem(spark, sf)
      .select(col("l_partkey").cast("string").as("k"))
    val sk1 = keys.coalesce(1).agg(GraftFunctions.cmsSketch(col("k")))
      .head.getSeq[Long](0)
    val skN = keys.repartition(7).agg(GraftFunctions.cmsSketch(col("k")))
      .head.getSeq[Long](0)
    // merge order/partitioning cannot change a counter matrix
    assert(sk1 === skN)
    // total mass = row count in every depth row
    val n = keys.count()
    val w = graft.functions.CmsCodec.Width
    (0 until graft.functions.CmsCodec.Depth).foreach { j =>
      assert(sk1.slice(j * w, (j + 1) * w).sum === n)
    }
    // point estimates dominate exact counts (CMS one-sided error)
    val sketch = keys.agg(GraftFunctions.cmsSketch(col("k")).as("sk"))
    val bad = keys.groupBy(col("k")).agg(count(lit(1)).as("exact"))
      .join(broadcast(sketch))
      .select(col("k"), col("exact"),
        GraftFunctions.cmsEstimate(col("sk"), col("k")).as("est"))
      .filter(col("est") < col("exact"))
    assert(bad.count() === 0)
  }

  test("lshRecall: hits bounded by truth; every verified LSH pair is a hit") {
    val docs = Tables.documents(spark, sf)
    val out = Eval.lshRecall(docs, 3, 0.0).collect()
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_hit <= n_truth
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // the verified pipeline's output (banding + exact >= 0.5) is a subset
    // of the banding candidates, so every such pair must be counted a hit:
    // total hits >= verified pair count at the same shingle size
    val verified = Dedup.minhashLshPairs(docs, 3, 0.5).count()
    assert(out.map(_.getLong(2)).sum >= verified)
  }

  test("kCenterGreedy: matches an in-memory replay of the greedy; radius shrinks") {
    val emb = Tables.embeddings(spark, sf)
    val k = 6
    val out = Similarity.kCenterGreedy(emb, k).collect()
      .sortBy(_.getLong(0))
    // pure-Scala replay on the collected corpus
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var chosen = Vector(vecs.head._1)
    val dist = scala.collection.mutable.Map(
      vecs.map(v => v._1 -> Double.MaxValue): _*)
    var expected = Vector[(Long, Double)]()
    for (_ <- 1 until k) {
      val c = vecs.find(_._1 == chosen.last).get._2
      vecs.foreach { case (id, v) => dist(id) = math.min(dist(id), d2(v, c)) }
      val cands = vecs.filterNot(v => chosen.contains(v._1))
      val best = cands.maxBy(v => (dist(v._1), -v._1))
      chosen :+= best._1
      expected :+= ((best._1, dist(best._1)))
    }
    assert(out.head.getLong(1) === vecs.head._1)
    assert(out.head.isNullAt(2))
    out.tail.zip(expected).foreach { case (row, (id, d)) =>
      assert(row.getLong(1) === id)
      assert(row.getDouble(2) === d)
    }
    // coverage radius is non-increasing
    val radii = out.tail.map(_.getDouble(2))
    radii.sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _ =>
    }
  }

  test("fkAudit: clean edges are all-zero; injected orphans and nulls are counted") {
    val clean = Relational.fkAudit(Seq(
      Relational.FkEdge("li->orders", Tables.lineitem(spark, sf), "l_orderkey",
        Tables.orders(spark, sf), "o_orderkey"),
      Relational.FkEdge("n->region", Tables.nation(spark, sf), "n_regionkey",
        Tables.region(spark, sf), "r_regionkey"))).collect()
    clean.foreach { r =>
      assert(r.getLong(2) === 0L, s"orphans in ${r.getString(0)}")
      assert(r.getLong(4) === 0L, s"null keys in ${r.getString(0)}")
    }
    assert(clean.find(_.getString(0) == "li->orders").get.getLong(1) ===
      Tables.lineitem(spark, sf).count())
    // synthetic: two orphan rows on one unknown key + one null key
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Relational.fkAudit(Seq(
      Relational.FkEdge("t", child, "fk", parent, "pk"))).head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((5L, 2L, 1L, 1L)))
  }

  test("rrfFuse: known fusion on synthetic lists; both-list hits outrank") {
    val a = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L))
      .toDF("q_id", "rank", "n_id")
    val b = Seq((1L, 1, 11L), (1L, 2, 13L))
      .toDF("q_id", "rank", "n_id")
    val out = Similarity.rrfFuse(a, b, 60, 5).collect()
      .map(r => r.getLong(2) -> (r.getInt(1), r.getDouble(3))).toMap
    // 11 in both lists (ranks 2 and 1) beats 10 (single rank 1)
    assert(out(11L)._1 === 1)
    assert(out(11L)._2 === 1.0 / 62 + 1.0 / 61)
    assert(out(10L)._2 === 1.0 / 61)
    assert(out(13L)._2 === 1.0 / 62)
    assert(out(12L)._2 === 1.0 / 63)
    // ordering: 11, 10, 13, 12
    assert(Seq(11L, 10L, 13L, 12L).map(out(_)._1) === Seq(1, 2, 3, 4))
  }

  test("purgedTimeFolds: contiguous balanced folds; embargo only at boundaries") {
    val p = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val embargo = 86400000000L
    val out = TrainPrep.purgedTimeFolds(p, "ts_us", "event_id", 5, embargo)
    val rows = out.select("fold", "ts_us", "embargoed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // balanced: fold sizes differ by at most 1; folds are time-contiguous
    val sizes = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(sizes.keySet === (1L to 5L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    val ranges = rows.groupBy(_._1).view
      .mapValues(v => (v.map(_._2).min, v.map(_._2).max)).toMap
    (1L to 4L).foreach(f => assert(ranges(f)._2 <= ranges(f + 1)._1))
    // embargo flag == within embargo of the next fold's start; fold 5 never
    rows.foreach { case (f, ts, e) =>
      val expected = f < 5 && (ranges(f + 1)._1 - ts) <= embargo
      assert(e === expected, s"embargo at fold $f ts $ts")
    }
    assert(rows.exists(_._3), "fixture should produce some embargoed rows")
  }

  test("calibrationBins: partition of the population, exact ranges, pinned means") {
    val c = Tables.customer(spark, sf)
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("score"),
        (col("c_mktsegment") === "BUILDING").as("label"))
    val out = Eval.calibrationBins(c, "score", "label", "c_custkey", 10)
      .collect().sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq === (1L to 10L))
    assert(out.map(_.getLong(1)).sum === c.count())
    assert(out.map(_.getLong(2)).sum ===
      c.filter(col("label")).count())
    // bins ordered by score: ranges are non-overlapping and increasing
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) <= b.getLong(3))
      case _ =>
    }
    out.foreach { r =>
      assert(r.getDouble(5) === r.getLong(2).toDouble / r.getLong(1))
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("quantileNormalize: rank-preserving, extremes map to global extremes") {
    val c = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("score"))
    val out = TrainPrep.quantileNormalize(c, "c_mktsegment", "c_custkey", "score")
    assert(out.count() === c.count()) // one row per input, no dup/loss
    val globalMin = c.agg(min("score")).head.getLong(0)
    val globalMax = c.agg(max("score")).head.getLong(0)
    // per group: the min-rank row lands on the global min value, max on max
    val rows = out.collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.minBy(_._2)._3 === globalMin)
      assert(g.maxBy(_._2)._3 === globalMax)
      // monotone: sorting by raw score never decreases the normalized score
      val sorted = g.sortBy(_._2).map(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a <= b)
        case _ =>
      }
    }
  }

  test("negativeSample: m per user, positives excluded, hash-ascending") {
    val users = Seq(1L, 2L).toDF("uid")
    val items = (1L to 100L).toDF("item")
    val pos = Seq((1L, 5L), (1L, 6L), (2L, 7L)).toDF("uid", "item")
    val out = TrainPrep.negativeSample(users, "uid", items, "item", pos, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 8)
    assert(!out.exists(r => Set((1L, 5L), (1L, 6L), (2L, 7L))((r._1, r._2))))
    out.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
      // ranks follow ascending hash
      assert(g.sortBy(_._4).map(_._3).toSeq === g.map(_._3).sorted.toSeq)
    }
    // reproducible: second run identical
    val again = TrainPrep.negativeSample(users, "uid", items, "item", pos, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet === out.toSet)
  }

  test("proportionalAllocate: exact budget, proportional within 1, reproducible") {
    val c = Tables.customer(spark, sf)
    val total = c.count()
    val out = TrainPrep.proportionalAllocate(c, "c_mktsegment", "c_custkey", 73L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length === 73)
    // per-stratum counts equal the declared quota, and quota is within 1
    // of the exact proportional share
    val strata = c.groupBy(col("c_mktsegment")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_._2).foreach { case (seg, rs) =>
      assert(rs.length.toLong === rs.head._3)
      val exact = 73.0 * strata(seg) / total
      assert(math.abs(rs.length - exact) < 1.0, s"$seg: ${rs.length} vs $exact")
    }
    val again = TrainPrep.proportionalAllocate(c, "c_mktsegment", "c_custkey", 73L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSet === out.toSet)
  }

  test("cusumChangepoint: matches a brute-force scan of the statistic") {
    val df = Seq(
      // group A: level shift after bucket 3 (1,1,1, then 9,9,9)
      ("A", 1L, 1L), ("A", 2L, 1L), ("A", 3L, 1L),
      ("A", 4L, 9L), ("A", 5L, 9L), ("A", 6L, 9L),
      // group B: flat — every deviation 0, tie broken to the EARLIEST bucket
      ("B", 1L, 5L), ("B", 2L, 5L), ("B", 3L, 5L))
      .toDF("g", "b", "v")
    val out = graft.ops.History.cusumChangepoint(df, "g", "b", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // A: S=(1,2,3,12,21,30), tot=30, n=6; D_i=6*S_i-i*30 → (-24,-48,-72,-48,-24,0)
    assert(out("A") === ((6L, 3L, -72L, 30L)))
    // B: all D_i = 0 → earliest bucket wins
    assert(out("B") === ((3L, 1L, 0L, 15L)))
  }

  test("weightedMedian: brute-force parity and the 2·W(≤v) ≥ W_total contract") {
    val df = Seq(("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 100L),
      ("b", 5L, 3L), ("b", 7L, 3L), ("c", 9L, 2L))
      .toDF("g", "v", "w")
    val out = Relational.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a") === ((30L, 102L))) // heavy tail value dominates
    assert(out("b") === ((5L, 6L))) // exact half reached at the first value
    assert(out("c") === ((9L, 2L)))
    // fixture-scale sanity vs an in-memory scan
    val li = Tables.lineitem(spark, sf).select(col("l_returnflag"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      col("l_quantity").cast("long").as("qty"))
    val got = Relational.weightedMedian(li, "l_returnflag", "cents", "qty")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    li.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).foreach { case (flag, rows) =>
        val sorted = rows.sortBy(_._2)
        val tot = rows.map(_._3).sum
        var cum = 0L
        val exp = sorted.find { r => cum += r._3; cum * 2 >= tot }.get._2
        assert(got(flag) === exp, s"flag $flag")
      }
  }

  test("binnedOverlapJoin: equals the quadratic reference on adversarial spans") {
    // spans crossing bin boundaries, nested spans, exact-touch endpoints,
    // and a span far from everything
    val left = Seq((1L, 0L, 150L), (2L, 90L, 110L), (3L, 500L, 510L))
      .toDF("lid", "span_start", "span_end")
    val right = Seq((10L, 100L, 200L), (11L, 150L, 160L), (12L, 20L, 30L),
      (13L, 900L, 950L))
      .toDF("rid", "span_start", "span_end")
    val got = Relational.binnedOverlapJoin(left, right,
      "span_start", "span_end", 100L)
      .select(col("l_lid"), col("r_rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lr = Seq((1L, 0L, 150L), (2L, 90L, 110L), (3L, 500L, 510L))
    val rr = Seq((10L, 100L, 200L), (11L, 150L, 160L), (12L, 20L, 30L),
      (13L, 900L, 950L))
    val expected = (for {
      (a, s1, e1) <- lr; (b, s2, e2) <- rr
      if s1 <= e2 && s2 <= e1
    } yield (a, b)).toSet
    assert(got === expected)
    // and no duplicates from multi-bin co-membership
    val all = Relational.binnedOverlapJoin(left, right,
      "span_start", "span_end", 100L)
      .select(col("l_lid"), col("r_rid")).collect()
    assert(all.length === expected.size)
  }

  test("hampelOutliers: brute-force parity; spike flagged, plateau not") {
    // flat series with one spike; edge windows shrink
    val df = (1L to 9L).map(d => ("g", d, if (d == 5) 100L else 10L))
      .toDF("g", "b", "v")
    val out = graft.ops.History.hampelOutliers(df, "g", "b", "v", 3, 3L)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    def lowerMed(xs: Seq[Long]) = xs.sorted.apply((xs.length + 1) / 2 - 1)
    (1L to 9L).foreach { d =>
      val win = (math.max(1L, d - 3) to math.min(9L, d + 3))
        .map(x => if (x == 5) 100L else 10L)
      val med = lowerMed(win)
      val mad = lowerMed(win.map(x => math.abs(x - med)))
      val (gv, gm, gmad, gout) = out(d)
      assert(gm === med, s"med at $d")
      assert(gmad === mad, s"mad at $d")
      assert(gout === (math.abs(gv - med) > 3 * mad), s"flag at $d")
    }
    assert(out(5L)._4, "the spike must be flagged")
    assert(!out(1L)._4 && !out(9L)._4)
  }

  test("htEstimate: truth recovered exactly when a stratum is fully sampled") {
    val df = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val total = df.count()
    // budget == population ⇒ every stratum fully sampled ⇒ ht_est == true_sum
    val full = TrainPrep.htEstimate(df, "c_mktsegment", "c_custkey",
      "cents", total)
    full.collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(2)) // n_s == quota
      assert(r.getLong(3) === r.getLong(4)) // true == sample
      assert(r.getDouble(5) === r.getLong(3).toDouble)
    }
    // partial budget: quotas sum to the budget; estimate finite per stratum
    val part = TrainPrep.htEstimate(df, "c_mktsegment", "c_custkey",
      "cents", 60L).collect()
    assert(part.map(_.getLong(2)).sum === 60L)
  }

  test("windowFunnel: brute-force parity over every user at sf0.001") {
    val W = 86400000000L
    val out = graft.ops.Sessions.windowFunnel(Tables.events(spark, sf), W)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    ev.groupBy(_._1).foreach { case (u, rows) =>
      val views = rows.filter(_._3 == "view").map(_._2)
      if (views.isEmpty) assert(!out.contains(u))
      else {
        val clicks = rows.filter(_._3 == "click").map(_._2).sorted
        val purch = rows.filter(_._3 == "purchase").map(_._2).sorted
        val best = views.map { v =>
          // brute force: ANY click/purchase chain within the window
          val s3 = clicks.exists(c => c >= v && c <= v + W &&
            purch.exists(p => p >= c && p <= v + W))
          val s2 = clicks.exists(c => c >= v && c <= v + W)
          if (s3) 3L else if (s2) 2L else 1L
        }.max
        assert(out(u) === ((views.length.toLong, best)), s"user $u")
      }
    }
  }

  test("goldenRecord: agrees with an independent max(struct) formulation") {
    val ev = Tables.events(spark, sf)
    val out = Relational.goldenRecord(ev)
    // alternative last_sku: max over (notnull, ts, id) struct, then unpack
    val alt = ev.groupBy(col("user_id")).agg(
      max(when(col("props").isNotNull,
        struct(col("ts_us"), col("event_id"), col("props"))))
        .getField("props").as("alt_sku"),
      count(lit(1)).as("alt_n"))
    val joined = out.join(alt, Seq("user_id"))
    assert(joined.filter(not(col("last_sku") <=> col("alt_sku"))).count() === 0)
    assert(joined.filter(col("n_events") =!= col("alt_n")).count() === 0)
    // profile grain: exactly one row per user present in the events
    assert(out.count() === ev.select("user_id").distinct.count())
    // mode tie-break is lexicographic-min among max-count types (recompute)
    val tc = ev.groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("c"))
    val expMode = tc.collect().groupBy(_.getLong(0)).map { case (u, rws) =>
      val mx = rws.map(_.getLong(2)).max
      u -> rws.filter(_.getLong(2) == mx).map(_.getString(1)).min
    }
    out.collect().foreach { r =>
      assert(r.getString(6) === expMode(r.getLong(0)), s"mode for ${r.getLong(0)}")
    }
  }
}
