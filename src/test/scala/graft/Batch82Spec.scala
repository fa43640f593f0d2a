package graft

/** Round-12 continuation batch 10 pins: audio ZCR fingerprint (q460),
  * curriculum tiers (q461), plus the streaming HDR sink lives in
  * StreamingSpec. */
class Batch82Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q460

  test("q460: audio ZCR fingerprints — symbol counts partition the " +
    "frames, fingerprints are md5 hex, and shared-fp groups are " +
    "consistent") {
    val out = q("q460_audio_zcr").collect()
    assert(out.nonEmpty)
    val byFp = out.groupBy(_.getAs[String]("fp"))
    out.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      assert(nf >= 4L, "len ≥ 64 ⇒ at least 4 full frames")
      assert((0 to 3).map(i => r.getAs[Long](s"c$i")).sum === nf,
        "2-bit symbols partition the frame set")
      assert(r.getAs[String]("fp").length === 32)
      assert(r.getAs[Long]("n_same_fp") ===
        byFp(r.getAs[String]("fp")).length.toLong,
        "n_same_fp must count the docs sharing the fingerprint")
    }
  }

  test("q460: identical payloads collide and the mean-centered sign " +
    "actually crosses (raw ascii never would)") {
    import spark.implicits._
    val t = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "0123456789!@#$"  // 66 chars, mixed codes
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    // replicate the frame/symbol arithmetic driver-side for doc 1
    val nu = (t.length / 16) * 16
    val bs = t.take(nu).map(_.toLong)
    val tt = bs.sum
    val sgns = bs.map(_ * nu > tt)
    val crossings = (1 until nu).count(i =>
      i % 16 != 0 && sgns(i) != sgns(i - 1))
    assert(crossings > 0L,
      "mean-centered signs must cross on a mixed-code payload")
    assert(docs.count() === 2)
  }

  // ---------------------------------------------------------------- q461

  test("q461: curriculum tiers — 5 tiers partition the corpus, length " +
    "ranges are disjoint and ordered, the unlock schedule is monotone " +
    "and ends at exactly 1e6 ppm") {
    val out = q("q461_curriculum_tiers").collect()
      .sortBy(_.getAs[Long]("tier"))
    assert(out.map(_.getAs[Long]("tier")).toSeq === (1L to 5L))
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === total)
    // ntile balance: sizes differ by at most 1
    val sizes = out.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1L)
    // ordered, non-overlapping length ranges (ties may touch)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_chars") <= b.getAs[Long]("min_chars"),
        "tier length ranges must be ordered")
    }
    val unlocks = out.map(_.getAs[Long]("unlock_ppm"))
    assert(unlocks === unlocks.sorted, "unlock schedule must be monotone")
    assert(unlocks.last === 1000000L,
      "the final tier unlocks the whole corpus exactly")
    val cums = out.map(_.getAs[Long]("cum_chars"))
    assert(cums.last === out.map(_.getAs[Long]("chars")).sum)
  }
}
