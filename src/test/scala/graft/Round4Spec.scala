package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, Snapshots}
import graft.ext.Curation

/** Round-4 operators vs in-memory brute-force references: interval
  * coalescing, 2-D skyline, forward as-of join, integer kernels, bounded
  * BFS. The brute forces are independent formulations (no window tricks),
  * so agreement proves the distributed formulation, not the arithmetic.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  test("coalesceIntervals merges overlapping and touching spans, splits gaps") {
    // key 1: [0,10] [5,15] (overlap) [15,20] (touching -> merge) [25,30] (gap)
    // key 2: single span
    val df = Seq(
      (1L, 0L, 10L, 1L), (1L, 5L, 15L, 2L), (1L, 15L, 20L, 3L),
      (1L, 25L, 30L, 4L), (2L, 100L, 110L, 5L)
    ).toDF("k", "s", "e", "id")
    val got = Relational.coalesceIntervals(df, "k", "s", "e", "id")
      .orderBy($"k", $"interval_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 20L, 3L), (1L, 25L, 30L, 1L),
      (2L, 100L, 110L, 1L)))
  }

  test("coalesceIntervals matches brute-force union-of-spans on events") {
    val iv = Tables.events(spark, sf).select($"user_id".as("k"),
      $"ts_us".as("s"), ($"ts_us" + 600000000L).as("e"), $"event_id".as("id"))
    val got = Relational.coalesceIntervals(iv, "k", "s", "e", "id")
      .select($"k", $"interval_start", $"interval_end", $"n_rows")
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute force: per key, sort spans, linear sweep in plain Scala
    val raw = iv.as[(Long, Long, Long, Long)].collect()
    val expect = raw.groupBy(_._1).flatMap { case (k, spans) =>
      val sorted = spans.map(t => (t._2, t._3)).sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var (cs, ce, n) = (sorted.head._1, sorted.head._2, 1L)
      for ((s, e) <- sorted.tail) {
        if (s > ce) { out += ((k, cs, ce, n)); cs = s; ce = e; n = 1L }
        else { ce = math.max(ce, e); n += 1L }
      }
      out += ((k, cs, ce, n))
      out
    }.toSet
    assert(got == expect)
  }

  test("skyline2D equals the brute-force dominance check") {
    val li = Tables.lineitem(spark, sf).select(
      $"l_quantity".cast("long").as("x"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
    val got = Relational.skyline2D(li, "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    val pairs = li.as[(Long, Long)].collect()
      .groupBy(identity).map { case (p, g) => (p._1, p._2, g.length.toLong) }
    val expect = pairs.filter { case (x, y, _) =>
      !pairs.exists { case (x2, y2, _) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.toSet
    assert(got == expect && got.nonEmpty)
  }

  test("asOfJoinForward: exact-ts match taken, ties by id, no-match -> null") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 99L, "c"),
      (2L, 5L, "d")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100L, "r10"), (1L, 10L, 50L, "r10lo"),
      (1L, 30L, 7L, "r30"), (3L, 1L, 1L, "rx"))
      .toDF("k", "ts", "rid", "rv")
    val got = Snapshots.asOfJoinForward(left, right, "k", "ts", "rid",
        Seq("rid", "rv"))
      .orderBy($"k", $"ts")
      .select($"k", $"ts", $"tag", $"rid", $"rv").collect()
    // ts=10 exact match exists; tie (two right rows at ts=10) -> min rid=50
    assert(got(0).getLong(0) == 1L && got(0).getLong(3) == 50L &&
      got(0).getString(4) == "r10lo")
    // ts=20 -> next right at 30
    assert(got(1).getLong(3) == 7L && got(1).getString(4) == "r30")
    // ts=99 -> nothing after: nulls
    assert(got(2).isNullAt(3) && got(2).isNullAt(4))
    // key 2 has no right rows at all
    assert(got(3).isNullAt(3) && got(3).isNullAt(4))
  }

  test("asOfJoinForward matches brute force on events") {
    val ev = Tables.events(spark, sf)
    val purch = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"event_id".as("click_id"),
        $"ts_us".as("click_ts_us"))
    val got = Snapshots.asOfJoinForward(purch, clicks, "user_id", "ts_us",
        "click_id", Seq("click_id", "click_ts_us"))
      .select($"event_id", $"click_id", $"click_ts_us")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    val p = purch.as[(Long, Long, Long)].collect()
    val c = clicks.select($"user_id", $"ts_us", $"click_id")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val expect = p.map { case (eid, u, ts) =>
      val cands = c.getOrElse(u, Array.empty).filter(_._2 >= ts)
      if (cands.isEmpty) (eid, None, None)
      else {
        val best = cands.minBy(t => (t._2, t._3))
        (eid, Some(best._3), Some(best._2))
      }
    }.toSet
    assert(got == expect)
  }

  test("kernelSmooth integer kernels match hand computation") {
    val df = Seq((1L, 1L, 1L, 1.00), (1L, 2L, 2L, 2.00), (1L, 3L, 3L, 3.00),
      (1L, 4L, 4L, 4.00)).toDF("k", "ts", "id", "v")
    val got = Relational.kernelSmooth(df, "k", "ts", "id", "v")
      .orderBy($"ts")
      .select($"cents", $"causal_w15", $"centered_w4")
      .as[(Long, Long, Long)].collect().toSeq
    // cents 100,200,300,400
    assert(got.map(_._1) == Seq(100L, 200L, 300L, 400L))
    // causal at t4: 8*400+4*300+2*200+100 = 4900
    assert(got(3)._2 == 4900L)
    // centered at t2: 100 + 2*200 + 300 = 800
    assert(got(1)._3 == 800L)
    // boundary: t1 causal = 8*100, centered = 2*100 + 200
    assert(got(0)._2 == 800L && got(0)._3 == 400L)
  }

  test("prefixJaccardPairs equals brute-force shingle-set Jaccard") {
    val k = 16
    val docs = Tables.documents(spark, sf)
    val got = graft.ext.Dedup.prefixJaccardPairs(docs, k, 4, 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute force on RAW shingle strings (the 48-bit content ids the
    // operator joins on are injective here short of md5-prefix collisions)
    val toks = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> (0 to t.length - k).map(i => t.substring(i, i + k)).toSet }
      .filter(_._2.nonEmpty).sortBy(_._1)
    val expect = (for {
      i <- toks.indices; j <- (i + 1) until toks.length
      (d1, a) = toks(i); (d2, b) = toks(j)
      ix = (a & b).size.toLong
      un = (a | b).size.toLong
      if ix * 5 >= un * 4
    } yield (d1, d2, ix, un)).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("BpeTrainer matches the classic in-memory BPE reference") {
    val docs = Tables.documents(spark, sf)
    val got = graft.ext.BpeTrainer.train(docs, 5)
      .orderBy($"step")
      .as[(Long, String, String, String, Long)].collect().toSeq
    // reference: textbook BPE on word types (dict of symbol lists)
    val words = docs.select($"text").as[String].collect()
      .flatMap(_.split(" ")).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    var vocab: Map[List[String], Long] =
      words.map { case (w, f) => w.toList.map(_.toString) -> f }.toMap
    val expect = (1 to 5).map { step =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- vocab; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + f
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      vocab = vocab.map { case (syms, f) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toList -> f
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      (step.toLong, a, b, a + b, cnt)
    }
    assert(got == expect)
  }

  test("bfsDistances equals brute-force BFS on the purchase graph") {
    val edges = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, sf).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
    val got = Curation.bfsDistances(edges, col("node") % 50 === 0, 3)
      .as[(Long, Long)].collect().toMap
    // brute force: adjacency map + 3 BFS rounds in plain Scala
    val e = edges.as[(Long, Long)].collect()
      .flatMap(t => Seq(t, t.swap)).distinct
    val adj = e.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = adj.keySet
    var dist = nodes.filter(_ % 50 == 0).map(_ -> 0L).toMap
    for (h <- 1 to 3) {
      val reached = dist.keys.flatMap(adj(_)).toSet
      dist = dist ++ reached.filterNot(dist.contains).map(_ -> h.toLong).toMap
    }
    // the sf0.001 purchase graph is dense: everything is within 2 hops of
    // the seed set, so assert multi-hop reach rather than the cap itself
    assert(got == dist && got.valuesIterator.max >= 2L)
  }
}
