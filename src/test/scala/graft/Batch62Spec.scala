package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 6 pins: weighted-Jaccard dominance over boilerplate, LCP
  * correctness on constructed prefixes, fill-rate partition, measured
  * Bloom FPR near its design point, Tukey quartile ordering, cluster
  * census conservation. */
class Batch62Spec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q351: weighted-Jaccard scores are proper ppm fractions above the " +
    "emission threshold") {
    val out = q("q351_weighted_jaccard").collect()
    out.foreach { r =>
      val wj = r.getAs[Long]("wj_ppm")
      assert(wj >= 300000L && wj <= 1000000L, s"$r")
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"), s"$r")
      assert(r.getAs[Long]("iw") > 0L, s"$r")
    }
  }

  test("q351 semantics: a shared RARE shingle outweighs shared " +
    "boilerplate under w = N DIV df") {
    // 10 docs: a shingle in all 10 has w = 1; one in 2 docs has w = 5 —
    // two docs sharing only the rare shingle score 5/(5+5+? ) vs
    // boilerplate-only pairs at 1/(tw_a + tw_b - 1)
    val n = 10L
    val wCommon = n / 10L // df = 10
    val wRare = n / 2L // df = 2
    assert(wRare > wCommon)
    // pair sharing rare+common: iw = 6, tw each = 6 → wJ = 1
    // pair sharing only common: iw = 1, tw each = 6 → 1/11
    val wjRare = (wRare + wCommon) * 1000000L /
      ((wRare + wCommon) * 2 - (wRare + wCommon))
    val wjCommon = wCommon * 1000000L /
      ((wRare + wCommon) * 2 - wCommon)
    assert(wjRare === 1000000L)
    assert(wjCommon < 100000L)
  }

  test("q352: LCP matches a direct computation per source") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1))).toMap
    val out = q("q352_boilerplate_lcp").collect()
    out.foreach { r =>
      val texts = docs(r.getAs[String]("source"))
      val (mn, mx) = (texts.min, texts.max)
      val lcp = mn.zip(mx).takeWhile { case (a, b) => a == b }.length
      assert(r.getAs[Long]("lcp_len") === lcp.toLong, s"$r")
      assert(r.getAs[Long]("n_docs") === texts.length.toLong)
      assert(r.getAs[Boolean]("boilerplate") === (lcp >= 20))
      // the min/max trick: lcp(min, max) == lcp over the whole set
      val full = texts.reduce { (a, b) =>
        a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1).mkString
      }
      assert(lcp === full.length)
    }
  }

  test("q353: fill states partition the order universe") {
    val out = q("q353_fill_rate").collect()
    val totalOrders = Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).distinct().count()
    assert(out.map(_.getAs[Long]("n_orders")).sum === totalOrders)
    out.foreach { r =>
      assert(r.getAs[Long]("lines_filled") <= r.getAs[Long]("lines"), s"$r")
      r.getAs[String]("state") match {
        case "filled" =>
          assert(r.getAs[Long]("lines_filled") === r.getAs[Long]("lines"))
        case "open" => assert(r.getAs[Long]("lines_filled") === 0L)
        case "partial" =>
          assert(r.getAs[Long]("lines_filled") > 0L &&
            r.getAs[Long]("lines_filled") < r.getAs[Long]("lines"))
        case other => fail(s"unknown state $other")
      }
    }
  }

  test("q354: measured FPR sits in the right decade for m=2^20, k=3 and " +
    "never exceeds a loose cap") {
    val r = q("q354_bloom_fpr").head()
    val (nk, fp) = (r.getAs[Long]("n_keys"), r.getAs[Long]("n_false_pos"))
    assert(r.getAs[Long]("n_probes") === 100000L)
    // theoretical p = (1 - exp(-k·n/m))^k; allow a generous 5× envelope
    val p = math.pow(1.0 - math.exp(-3.0 * nk / 1048576.0), 3.0)
    assert(fp <= math.max(20.0, 5 * p * 100000).toLong,
      s"fp=$fp theory=${p * 100000}")
    assert(r.getAs[Long]("fpr_ppm") === fp * 1000000L / 100000L)
  }

  test("q355: quartiles ordered, fences contain the box, outliers are a " +
    "minority") {
    q("q355_tukey_fences").collect().foreach { r =>
      val (q1, q3) = (r.getAs[Long]("q1"), r.getAs[Long]("q3"))
      assert(q1 <= q3, s"$r")
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("n_low") + r.getAs[Long]("n_high") < n / 4,
        s"$r")
    }
  }

  test("q356: the cluster census conserves the document count") {
    val out = q("q356_dup_cluster_census").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === nDocs)
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
  }
}
