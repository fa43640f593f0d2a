package graft

/** Round-13 batch 2 pins: matrix profile (q472), FM/PCSA sketch (q473),
  * content-defined chunking (q474). */
class Batch86Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q472

  test("q472: matrix profile — one row per valid start, exclusion zone " +
    "respected, profile symmetric-bounded") {
    val out = q("q472_matrix_profile").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val i = r.getAs[Long]("pos")
      val j = r.getAs[Long]("mp_pos")
      assert(math.abs(i - j) >= 4,
        s"pos $i matched $j inside the m=4 exclusion zone")
      assert(r.getAs[Long]("mp_dist") >= 0L)
    }
    // the profile of i's match j cannot beat j's own profile by definition:
    // mp(j) <= dist(j, i) = dist(i, j) = mp(i) when j is a valid start
    val mp = out.map(r => (r.getAs[Int]("nation"), r.getAs[Long]("pos")) ->
      r.getAs[Long]("mp_dist")).toMap
    out.foreach { r =>
      val nk = r.getAs[Int]("nation")
      val j = r.getAs[Long]("mp_pos")
      mp.get((nk, j)).foreach { mpj =>
        assert(mpj <= r.getAs[Long]("mp_dist"),
          s"nation $nk: mp($j) must be <= dist to its own matcher")
      }
    }
  }

  test("q472: squared-distance arithmetic on a hand pair") {
    // windows (1,2,3,4) vs (2,4,6,8): 1+4+9+16 = 30
    assert(Seq(1L, 2L, 3L, 4L).zip(Seq(2L, 4L, 6L, 8L))
      .map { case (a, b) => (a - b) * (a - b) }.sum === 30L)
  }

  // ---------------------------------------------------------------- q473

  test("q473: FM/PCSA — weekly OR-merge equals the direct build, " +
    "estimate is a power-of-two ladder around n_exact") {
    val out = q("q473_fm_sketch").collect()
    assert(out.length === 5, "one row per event_type")
    out.foreach { r =>
      assert(r.getAs[Long]("sum_r") === r.getAs[Long]("sum_r_merged"),
        s"${r.getAs[String]("event_type")}: bit_or rollup must be " +
          "build-order-free (the monoid IS the merge)")
      val est = r.getAs[Long]("est_pow2")
      assert(est >= 64L && est % 64L === 0L &&
        ((est / 64L) & (est / 64L - 1L)) === 0L, "estimate is 64·2^k")
      assert(r.getAs[Long]("n_exact") > 0L)
    }
  }

  test("q473: trailing-zero register arithmetic — the bit tricks") {
    // rho of y: bit_count((y & -y) - 1)
    def rho(y: Long): Long = java.lang.Long.bitCount((y & -y) - 1).toLong
    assert(rho(1L) === 0L)
    assert(rho(8L) === 3L)
    assert(rho(12L) === 2L)
    // lowest zero bit index of bitmap b: bit_count(((b+1) & ~b) - 1)
    def lowZero(b: Long): Long =
      java.lang.Long.bitCount(((b + 1L) & ~b) - 1L).toLong
    assert(lowZero(0L) === 0L)
    assert(lowZero(1L) === 1L)
    assert(lowZero(0x7L) === 3L)
    assert(lowZero(0xBL) === 2L) // 1011 → lowest zero at index 2
  }

  // ---------------------------------------------------------------- q474

  test("q474: CDC chunks — census accounting holds per source") {
    val out = q("q474_cdc_chunks").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_chunks")
      val u = r.getAs[Long]("n_unique")
      val tb = r.getAs[Long]("total_bytes")
      val ub = r.getAs[Long]("uniq_bytes")
      assert(u <= n && u > 0L)
      assert(ub <= tb)
      assert(r.getAs[Long]("dedup_ppm") === ub * 1000000L / tb)
    }
    // total_bytes must equal the sum of source text lengths — chunking
    // partitions every document exactly
    import org.apache.spark.sql.functions._
    val expected = Tables.documents(spark, sf)
      .groupBy("source").agg(sum(length(col("text"))).as("tb"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("tb"))
      .toMap
    out.foreach { r =>
      assert(r.getAs[Long]("total_bytes") ===
        expected(r.getAs[String]("source")),
        "chunk lengths must tile the corpus byte-exactly")
    }
  }

  test("q474: identical payloads chunk identically — dedup detects them") {
    import spark.implicits._
    // two identical 100-char docs + one distinct: unique bytes < total
    val text = ("the quick brown fox jumps over the lazy dog again and " +
      "again until the corpus repeats itself fully").take(100)
    val docs = Seq((1L, text, "s"), (2L, text, "s"),
      (3L, text.reverse, "s"))
      .toDF("doc_id", "text", "source")
    // replay the boundary rule driver-side
    def md5l(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12), 16)
    }
    def chunksOf(t: String): Seq[String] = {
      val bounds = (8 to t.length)
        .filter(p => md5l(t.substring(p - 8, p)) % 64 == 0) :+ t.length
      val bs = bounds.distinct.sorted
      bs.zip(0 +: bs.dropRight(1)).map { case (e, s0) => t.substring(s0, e) }
    }
    val all = Seq(text, text, text.reverse).flatMap(chunksOf)
    assert(all.mkString.length === text.length * 3)
    assert(all.distinct.map(_.length).sum < text.length * 3,
      "duplicate payloads must share chunks")
  }
}
