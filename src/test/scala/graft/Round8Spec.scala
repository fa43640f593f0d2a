package graft

import org.apache.spark.sql.functions._
import graft.ext.Bloom
import graft.functions.{BitmapCodec, GraftFunctions}
import graft.ops.Running

/** Round-7 batch 2: Bloom membership join, clamped running balance, Allen
  * census invariants. */
class Round8Spec extends SparkSpec {

  import spark.implicits._

  test("containsSerialized agrees with the deserialized state on random ids") {
    val rnd = new scala.util.Random(42)
    val ids = Seq.fill(500)(math.abs(rnd.nextLong()) % (1L << 22))
    val st: BitmapCodec.State = scala.collection.mutable.LongMap.empty
    ids.foreach(BitmapCodec.set(st, _))
    val bytes = BitmapCodec.serialize(st)
    val full = BitmapCodec.deserialize(bytes)
    val probes = ids ++ Seq.fill(500)(math.abs(rnd.nextLong()) % (1L << 22))
    probes.foreach { v =>
      val want = full.get(v >>> 16).exists { w =>
        val bit = (v & 0xffffL).toInt
        (w(bit >>> 6) >>> (bit & 63) & 1L) == 1L
      }
      assert(BitmapCodec.containsSerialized(bytes, v) === want,
        s"mismatch at $v")
    }
    // never true for ids past the last page / absent pages
    assert(!BitmapCodec.containsSerialized(bytes, (1L << 40) + 17))
  }

  test("Bloom memberJoin equals the plain semi-join and actually prunes") {
    GraftFunctions.register(spark)
    val probe = (1L to 400L).map(i => (i, i * 7L)).toDF("id", "h")
    // base contains 40 of the probe hashes plus disjoint extras
    val base = ((1L to 40L).map(_ * 70L) ++ (1L to 200L).map(1000000L + _))
      .toDF("h")
    val got = Bloom.memberJoin(probe, base)
      .select($"id").as[Long].collect().sorted
    val want = probe.join(base, Seq("h"), "left_semi")
      .select($"id").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(got.length === 40)
    // pruning: bloom-positive candidate count stays near the true matches
    val candidates = probe
      .crossJoin(broadcast(Bloom.build(base.select($"h"))))
      .filter((0 until Bloom.K).map(i =>
        GraftFunctions.bitmapContains($"bloom",
          Bloom.position($"h", i))).reduce(_ && _))
      .count()
    assert(candidates < 100, // 400 probes, 40 true, fp rate ~ tiny at m=2^20
      s"bloom should prune most of the 400 probes, kept $candidates")
  }

  test("bitmap_and: canonical bytes equal a direct build; 3-way chain " +
    "equals set intersection") {
    val a = Seq(1L, 5L, 70000L, 70001L, 999999L)
    val b = Seq(5L, 70001L, 999999L, 123L)
    val c = Seq(5L, 70001L, 42L)
    def st(xs: Seq[Long]) = {
      val s: BitmapCodec.State = scala.collection.mutable.LongMap.empty
      xs.foreach(BitmapCodec.set(s, _)); s
    }
    val ab = BitmapCodec.and(st(a), st(b))
    // canonical: AND result serializes identically to building a∩b directly
    assert(BitmapCodec.serialize(ab).sameElements(
      BitmapCodec.serialize(st(a.intersect(b)))))
    val abc = BitmapCodec.and(ab, st(c))
    assert(BitmapCodec.cardinality(abc) ===
      a.intersect(b).intersect(c).size.toLong)
    // page that intersects to empty must be DROPPED (999999 alone on its
    // page in ab, absent from c)
    assert(!BitmapCodec.containsSerialized(BitmapCodec.serialize(abc), 999999L))
  }

  test("clampedBalance equals the imperative max(0, s+delta) fold") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      k <- 1 to 5
      i <- 1 to 200
    } yield (k.toLong, i.toLong, rnd.nextInt(21) - 10L)
    val df = rows.toDF("k", "seq", "delta")
    val got = Running.clampedBalance(df, "k", "delta", Seq("seq"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var s = 0L
      var peak = 0L
      var hits = 0L
      rs.sortBy(_._2).foreach { case (_, _, d) =>
        s = math.max(0L, s + d)
        peak = math.max(peak, s)
        if (s == 0L) hits += 1
      }
      assert(got(k) === ((rs.size.toLong, s, peak, hits)), s"key $k")
    }
  }

  test("asOfJoin: a matched right row with NULL values yields NULL, " +
    "never a stale earlier value (ADVICE r3 regression pin)") {
    val left = Seq((1L, 100L, "x"), (1L, 200L, "y")).toDF("k", "ts", "tag")
    val right = Seq((1L, 50L, Some(7L), Some(70L)),
      (1L, 150L, None, Some(80L))) // later match: v1 NULL, v2 present
      .toDF("k", "ts", "v1", "v2")
    val out = graft.ops.Snapshots.asOfJoin(left, right, "k", "ts",
      Seq("v1", "v2"))
      .orderBy($"ts").collect()
    // ts=100 matches right@50 → (7, 70)
    assert(out(0).getAs[Any]("v1") === 7L && out(0).getAs[Any]("v2") === 70L)
    // ts=200 matches right@150 → v1 must be NULL (not the stale 7) and
    // BOTH columns must come from the SAME right row
    assert(out(1).isNullAt(out(1).fieldIndex("v1")),
      s"stale v1 leaked: ${out(1)}")
    assert(out(1).getAs[Any]("v2") === 80L)
  }

  test("Allen census covers every consecutive pair exactly once") {
    val spans = Seq(
      (1L, 10L, 0L, 5L), (1L, 11L, 5L, 8L), (1L, 12L, 6L, 7L),
      (1L, 13L, 6L, 7L), (2L, 20L, 0L, 5L), (2L, 21L, 1L, 9L))
      .toDF("o_custkey", "o_orderkey", "s", "e")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"s".asc, $"e".asc, $"o_orderkey".asc)
    val rels = spans
      .withColumn("s2", lead($"s", 1).over(w))
      .withColumn("e2", lead($"e", 1).over(w))
      .filter($"s2".isNotNull)
      .withColumn("rel",
        when($"s" === $"s2" && $"e" === $"e2", "equals")
          .when($"s" === $"s2", "starts")
          .when($"e" < $"s2", "precedes")
          .when($"e" === $"s2", "meets")
          .when($"e" < $"e2", "overlaps")
          .when($"e" === $"e2", "finished_by")
          .otherwise("contains"))
    // n-1 pairs per key, every pair classified (no null relation)
    assert(rels.count() === 4)
    val byRel = rels.groupBy($"rel").count().as[(String, Long)].collect().toMap
    assert(byRel === Map("meets" -> 1L, "contains" -> 1L, "equals" -> 1L,
      "overlaps" -> 1L))
  }
}
