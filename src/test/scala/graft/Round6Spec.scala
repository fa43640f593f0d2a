package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity}
import graft.ops.{History, Snapshots, Tpch}

/** Round-5 batch 1: temporal-history ops, duplicated-substring spans,
  * mutual-kNN graph, TPC-H decorrelation shapes. Each pinned against an
  * independent brute-force reference or a structural invariant. */
class Round6Spec extends SparkSpec {

  import spark.implicits._

  private def purchases = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("user_id"), col("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))

  test("scd2Build: intervals tile the change history; as-of picks the live version") {
    val scd2 = History.scd2Build(purchases, "user_id", "ts_us", "cents")
    val byUser = scd2.collect().groupBy(_.getLong(0))
    byUser.values.foreach { vs =>
      val sorted = vs.sortBy(_.getLong(4)) // version order
      // exactly one open (current) version per user, and it is the last
      assert(sorted.count(_.getBoolean(5)) === 1)
      assert(sorted.last.getBoolean(5))
      // intervals tile: each valid_to equals the next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) === b.getLong(2))
          // change suppression: consecutive versions differ in value
          assert(a.getLong(1) !== b.getLong(1))
        case _ =>
      }
    }
    // round trip: backward as-of join of the raw log onto the SCD2 table
    // returns, for every event, the cents of the version live at its ts
    val dim = scd2.select(col("user_id"), col("valid_from").as("ts_us"),
      col("cents").as("dim_cents"))
    val back = Snapshots.asOfJoin(
      purchases.select(col("user_id"), col("ts_us"), col("cents")),
      dim, "user_id", "ts_us", Seq("dim_cents"))
    assert(back.filter(col("cents") =!= col("dim_cents")).count() === 0)
    assert(back.filter(col("dim_cents").isNull).count() === 0)
  }

  test("attribution: revenue is conserved and channels come from the frame") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_type"), col("value"))
    val out = History.attribution(ev, 7L * 86400000000L)
    val total = out.agg(sum("revenue_cents")).as[Long].head()
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long"))).as[Long].head()
    assert(total === expected)
    // brute-force one purchase: earliest/latest touch in [t-7d, t]
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val somePurchase = raw.filter(_._3 == "purchase").head
    val touches = raw.filter(e => e._1 == somePurchase._1 &&
      e._3 != "purchase" &&
      e._2 >= somePurchase._2 - 7L * 86400000000L && e._2 <= somePurchase._2)
    if (touches.nonEmpty) {
      val first = touches.minBy(t => (t._2, Map("click" -> 1, "view" -> 2,
        "signup" -> 3, "error" -> 4)(t._3)))._3
      val pairs = out.select(col("first_channel")).distinct()
        .as[String].collect().toSet
      assert(pairs.contains(first) || pairs.contains("none"))
    }
  }

  test("interpolate: exact rational brackets the neighbors; boundaries are null") {
    val out = History.interpolate(purchases, "user_id", "ts_us", "cents")
    val rs = out.collect().groupBy(_.getLong(0))
    rs.values.foreach { vs =>
      val sorted = vs.sortBy(_.getLong(1))
      // first and last point per user have no two-sided neighborhood
      assert(sorted.head.isNullAt(3) && sorted.last.isNullAt(3))
      sorted.drop(1).dropRight(1).foreach { r =>
        assert(!r.isNullAt(3) && !r.isNullAt(4))
        val (num, den) = (r.getLong(3), r.getLong(4))
        assert(den > 0)
        // the interpolant lies between the neighbor values: num/den within
        // [min(pv,nv), max(pv,nv)] — check by cross-multiplication
        val i = sorted.indexOf(r)
        val (pv, nv) = (sorted(i - 1).getLong(2), sorted(i + 1).getLong(2))
        assert(num >= math.min(pv, nv) * den && num <= math.max(pv, nv) * den)
      }
    }
  }

  test("compactionBins: deterministic greedy packing invariants") {
    val files = Tables.orders(spark, sf)
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .as("mon"), to_date(col("o_orderdate")).as("file_date"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("bytes"))
    val out = History.compactionBins(files, "mon", "file_date", "bytes",
      1000000L)
    val byPart = out.collect().groupBy(_.get(0))
    byPart.values.foreach { vs =>
      val inOrder = vs.sortBy(r => (-r.getLong(2), r.getDate(1).toString))
      var cum = 0L
      inOrder.foreach { r =>
        assert(r.getLong(3) === cum / 1000000L) // bin = exclusive cumsum DIV
        cum += r.getLong(2)
      }
      // first bin is 0; a file larger than the target legitimately SKIPS
      // bin ids (same as a split bigger than maxPartitionBytes), so only
      // monotonicity in packing order is promised, not contiguity
      assert(inOrder.head.getLong(3) === 0L)
      assert(inOrder.map(_.getLong(3)).sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true
      })
    }
  }

  test("dupSpans: crafted shared substring becomes one maximal span") {
    val k = 16
    val shared = "the-exact-shared-run-of-characters-here" // 39 chars
    val docs = Seq(
      (1L, s"prefix-one $shared suffix-one"),
      (2L, s"a different head $shared and a different tail"),
      (3L, "entirely unrelated content with no overlap at all......"))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    // docs 1 and 2 each get exactly one span; doc 3 none
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    val sharedWithSpaces = s" $shared " // the flanking spaces also repeat
    out.foreach { case (id, s, e) =>
      val text = docs.collect().find(_.getLong(0) == id).get.getString(1)
      assert(text.substring(s.toInt, e.toInt) === sharedWithSpaces)
    }
    // span length = shared run length (maximality: no fragmentation)
    assert(out.forall { case (_, s, e) => e - s == sharedWithSpaces.length })
  }

  test("mutualKnn: pairs are exactly the symmetric subset of directed kNN") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(60).cache()
    val out = Similarity.mutualKnn(emb, 3)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    // brute-force directed kNN in scala
    val vs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val knn = vs.map { case (id, v) =>
      id -> vs.filter(_._1 != id)
        .map { case (j, u) => (j, cos(v, u)) }
        .sortBy { case (j, c) => (-c, j) }.take(3).map(_._1).toSet
    }.toMap
    val expected = (for {
      (u, nu) <- knn.toSeq; v <- nu
      if u < v && knn(v).contains(u)
    } yield (u, v)).toSet
    assert(out === expected)
    emb.unpersist()
  }

  test("onlyLateSupplier matches the literal EXISTS/NOT EXISTS run in Spark SQL") {
    val li = Tables.lineitem(spark, sf); val o = Tables.orders(spark, sf)
    val su = Tables.supplier(spark, sf)
    li.createOrReplaceTempView("li"); o.createOrReplaceTempView("ord")
    su.createOrReplaceTempView("sup")
    val literal = spark.sql(
      """WITH pairs AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    max(CASE WHEN l.l_shipdate > ord.o_orderdate
        |          + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS late
        |  FROM li l JOIN ord ON l.l_orderkey = ord.o_orderkey
        |  GROUP BY 1, 2)
        |SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM pairs p1 JOIN sup s ON p1.l_suppkey = s.s_suppkey
        |WHERE p1.late = 1
        |  AND EXISTS (SELECT 1 FROM pairs p2
        |    WHERE p2.l_orderkey = p1.l_orderkey
        |      AND p2.l_suppkey <> p1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM pairs p3
        |    WHERE p3.l_orderkey = p1.l_orderkey
        |      AND p3.l_suppkey <> p1.l_suppkey AND p3.late = 1)
        |GROUP BY 1""".stripMargin)
      .as[(String, Long)].collect().toMap
    val rewritten = Tpch.onlyLateSupplier(li, o, su, 90)
      .as[(String, Long)].collect().toMap
    assert(rewritten === literal)
    assert(rewritten.nonEmpty)
  }

  test("streaks: brute-force islands per user agree") {
    val out = History.streaks(
      Tables.events(spark, sf).select(col("user_id"), col("ts_us")),
      "user_id", "ts_us")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_us DIV 86400000000").as("day"))
      .as[(Long, Long)].collect().groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      val days = rows.map(_._2).distinct.sorted
      var (longest, cur, streakN) = (1L, 1L, 1L)
      days.sliding(2).foreach {
        case Array(a, b) =>
          if (b == a + 1) cur += 1 else { streakN += 1; cur = 1 }
          longest = math.max(longest, cur)
        case _ =>
      }
      assert(out(u) === ((longest, streakN, days.max)), s"user $u")
    }
  }

  test("cdcApply: deletes drop keys, latest op wins, ties break by id") {
    val feed = Seq(
      (1L, 100L, 1L, "I", 10L), (1L, 200L, 2L, "U", 20L), // live, value 20
      (2L, 100L, 3L, "I", 30L), (2L, 300L, 4L, "D", 0L),  // deleted
      (3L, 100L, 5L, "I", 40L), (3L, 100L, 6L, "U", 50L)  // same-ts: id 6 wins
    ).toDF("k", "ts", "id", "op", "v")
    val out = History.cdcApply(feed, "k", "ts", "id", "op", "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(1L -> ((200L, 20L)), 3L -> ((100L, 50L))))
  }

  test("groupTopKList: list order is rank order, independent of arrival") {
    val df = Seq((1L, "b", 5L), (1L, "a", 5L), (1L, "c", 9L), (1L, "d", 1L),
      (2L, "x", 2L)).toDF("g", "item", "m")
    val out = graft.ops.Relational.groupTopKList(df, "g", "item", "m", 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // ties on metric break by item asc: c(9), a(5), b(5)
    assert(out === Map(1L -> (("c,a,b", 3L)), 2L -> (("x", 1L))))
  }

  test("revenueShare / topRevenueSupplier: share and max invariants hold") {
    val li = Tables.lineitem(spark, sf)
    val share = Tpch.revenueShare(li, 2000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = li.select(sum(round(col("l_extendedprice") *
      (lit(1.0) - col("l_discount")) * 100).cast("long"))).as[Long].head()
    assert(share.nonEmpty)
    share.foreach { case (_, c) => assert(c * 2000L > total) }
    val top = Tpch.topRevenueSupplier(li, Tables.supplier(spark, sf),
      "1996-01-01 00:00:00", "1996-04-01 00:00:00")
      .select(col("total_rev_cents")).as[Long].collect()
    assert(top.nonEmpty && top.distinct.length === 1) // ties all carry the max
  }

  test("merkleDiff: bucketed drill equals the direct full diff, statuses exact") {
    val (v1, v2) = graft.ops.TableDiff.perturbedOrders(
      Tables.orders(spark, sf))
    val out = graft.ops.TableDiff.merkleDiff(v1, v2, "o_orderkey",
      Seq("cents", "o_orderstatus"), 64)
      .as[(Long, String)].collect().toMap
    val keys = v1.select($"o_orderkey").as[Long].collect()
    val expected = keys.flatMap { k =>
      if (k % 101 == 0) Some(k -> "only_v1")
      else if (k % 97 == 0) Some(k -> "changed")
      else None
    }.toMap
    assert(out === expected)
    assert(out.nonEmpty)
  }

  test("intervalGaps: gaps exactly complement the merged intervals") {
    val iv = Seq((1L, 0L, 10L, 1L), (1L, 5L, 12L, 2L), (1L, 20L, 25L, 3L),
      (1L, 40L, 41L, 4L), (2L, 0L, 1L, 5L))
      .toDF("k", "span_start", "span_end", "id")
    val gaps = graft.ops.Relational
      .intervalGaps(iv, "k", "span_start", "span_end", "id")
      .as[(Long, Long, Long, Long)].collect().sortBy(g => (g._1, g._2))
    assert(gaps.toSeq === Seq((1L, 12L, 20L, 8L), (1L, 25L, 40L, 15L)))
  }

  test("kAnonymityAudit: cell sizes sum to the table; small cells flagged") {
    val out = graft.ext.Curation.kAnonymityAudit(
      Tables.customer(spark, sf), 5L).collect()
    assert(out.map(_.getLong(3)).sum === Tables.customer(spark, sf).count())
    out.foreach(r => assert(r.getBoolean(4) === (r.getLong(3) < 5L)))
  }

  test("annRecall: self-evaluation is perfect, hits bounded by k, zero-hit queries kept") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val brute = graft.ext.Similarity.bruteForceTopK(emb, 10, 5)
    val self = graft.ext.Eval.annRecall(brute, brute, 5)
      .as[(Long, Long, Long, Long)].collect()
    assert(self.length === 10)
    assert(self.forall { case (_, hits, k, worst) =>
      hits == 5 && k == 5 && worst == 5 })
    // disjoint approx (shifted neighbor ids guaranteed absent) → 0 hits,
    // query rows still present, worst_kept_rank NULL
    val none = graft.ext.Eval.annRecall(
      brute.withColumn("n_id", col("n_id") + 1000000L), brute, 5)
      .collect()
    assert(none.length === 10)
    assert(none.forall(r => r.getLong(1) == 0L && r.isNullAt(3)))
  }

  test("seasonalDecompose: trend only on full consecutive windows; identities hold") {
    val out = graft.ops.History.seasonalDecompose(
      Tables.orders(spark, sf).select(
        graft.ops.Relational.epochUs(col("o_orderdate")).as("ts_us"),
        round(col("o_totalprice") * 100).cast("long").as("cents")),
      "ts_us", "cents").collect()
    val byDay = out.map(r => r.getLong(0) -> r).toMap
    val days = byDay.keySet
    out.foreach { r =>
      val (day, wd, rev) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(wd === ((day % 7 + 7) % 7))
      val windowDays = (day - 3) to (day + 3)
      if (windowDays.forall(days.contains)) {
        // full window: trend = sum of the 7 revenues, detr = 7·rev − trend
        val t = windowDays.map(byDay(_).getLong(2)).sum
        assert(!r.isNullAt(3) && r.getLong(3) === t)
        assert(r.getLong(4) === rev * 7 - t)
      } else assert(r.isNullAt(3) && r.isNullAt(4))
    }
    // seasonal rational: per weekday, sum of non-null detrended residuals
    val expSeasonal = out.filter(!_.isNullAt(4))
      .groupBy(_.getLong(1)).map { case (wd, rs) =>
        wd -> (rs.map(_.getLong(4)).sum, rs.length.toLong) }
    out.filter(!_.isNullAt(5)).foreach { r =>
      val (s, n) = expSeasonal(r.getLong(1))
      assert(r.getLong(5) === s && r.getLong(6) === n)
    }
  }

  test("smallQtyRevenue: decorrelated predicate equals the correlated scalar form") {
    val li = Tables.lineitem(spark, sf); val p = Tables.part(spark, sf)
    val out = Tpch.smallQtyRevenue(li, p, "Brand#13")
      .as[(Long, Long)].head()
    // brute force in scala
    val brandParts = p.filter(col("p_brand") === "Brand#13")
      .select("p_partkey").as[Long].collect().toSet
    val lines = li.collect().map(r => (
      r.getLong(r.fieldIndex("l_partkey")),
      math.round(r.getDouble(r.fieldIndex("l_quantity")) * 100),
      math.round(r.getDouble(r.fieldIndex("l_extendedprice")) * 100)))
      .filter(l => brandParts.contains(l._1))
    val stats = lines.groupBy(_._1).map { case (k, ls) =>
      k -> (ls.map(_._2).sum, ls.length) }
    val qualifying = lines.filter { case (k, q, _) =>
      val (s, n) = stats(k); q * 5 * n < s }
    assert(out === ((qualifying.map(_._3).sum, qualifying.length.toLong)))
  }
}
