package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 5 pins: ANOVA bounds, the exact Parseval identity for the
  * unnormalized Haar pyramid (engine vs independent Scala fold), Wilson
  * interval containment, Cramér's V range, EWMA dyadic exactness, and
  * Page–Hinkley on a hand-folded step series. */
class Batch61Spec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  private def dailyDollars: Seq[(Long, Long)] =
    Tables.orders(spark, sf)
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("day"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS LONG)) DIV 100")
        .as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

  test("q345: eta2 is a proper fraction, SSB <= SST, 7 DOW groups") {
    val r = q("q345_eta_squared").head()
    assert(r.getAs[Long]("k") === 7L)
    assert(r.getAs[Long]("ssb_q") >= 0L)
    assert(r.getAs[Long]("ssb_q") <= r.getAs[Long]("sst_q"))
    val eta = r.getAs[Long]("eta2_ppm")
    assert(eta >= 0L && eta <= 1000000L)
    assert(r.getAs[Long]("f_milli") >= 0L)
  }

  test("q346: engine energies equal an independent Scala Haar fold and " +
    "satisfy Parseval exactly") {
    val days = dailyDollars
    val d0 = days.head._1
    val xs = Array.fill[Long](4096)(0L)
    days.foreach { case (d, x) => xs((d - d0).toInt) = x / 1000 }
    var cur = xs.toArray
    val model = (1 to 12).map { _ =>
      val half = cur.length / 2
      val s = Array.tabulate(half)(i => cur(2 * i) + cur(2 * i + 1))
      val det = Array.tabulate(half)(i => cur(2 * i) - cur(2 * i + 1))
      cur = s
      det.map(v => v * v).sum
    }
    val out = q("q346_haar_energy").collect()
      .map(r => r.getAs[Long]("level") -> r.getAs[Long]("energy")).toMap
    (1 to 12).foreach { k =>
      assert(out(k.toLong) === model(k - 1), s"level $k")
    }
    // Parseval for unnormalized Haar: Σx² = Σ_k energy_k / 2^k + top² / 2^L
    val lhs = xs.map(v => v.toDouble * v).sum
    val rhs = model.zipWithIndex
      .map { case (e, i) => e.toDouble / (1L << (i + 1)) }.sum +
      cur.head.toDouble * cur.head / 4096.0
    assert(math.abs(lhs - rhs) < 1e-6 * math.max(lhs, 1.0),
      s"Parseval: $lhs vs $rhs")
  }

  test("q347: Wilson bounds bracket the point estimate and stay in " +
    "[0, 1e6]") {
    val out = q("q347_wilson_bounds").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, k) = (r.getAs[Long]("n"), r.getAs[Long]("k"))
      val p_ppm = k * 1000000L / n
      assert(r.getAs[Long]("lo_ppm") >= 0L, s"$r")
      assert(r.getAs[Long]("hi_ppm") <= 1000000L, s"$r")
      assert(r.getAs[Long]("lo_ppm") <= p_ppm, s"$r")
      assert(r.getAs[Long]("hi_ppm") + 1L >= p_ppm, s"$r")
    }
  }

  test("q348: Cramér's V is a proper effect size") {
    val r = q("q348_cramers_v").head()
    assert(r.getAs[Long]("chi2_q") >= 0L)
    val v = r.getAs[Long]("v_milli")
    assert(v >= 0L && v <= 1000L)
  }

  test("q349: EWMA of a constant series is exactly (2^20 - 1)·c, and the " +
    "fixture chart covers every day") {
    // dyadic-weight identity: Σ_{k=0..19} c·2^(19-k) = c·(2^20 − 1)
    val c = 7L
    val scaled = (0 until 20).map(k => c * (1L << (19 - k))).sum
    assert(scaled === c * 1048575L)
    val out = q("q349_ewma_chart").collect()
    assert(out.length.toLong === dailyDollars.length.toLong)
    out.foreach(r => assert(r.getAs[Long]("ewma_scaled") >= 0L))
  }

  test("q350: PH is nonnegative, detects inside the series, and a " +
    "hand-folded step series detects at the step regime") {
    val r = q("q350_page_hinkley").head()
    assert(r.getAs[Long]("ph_scaled") >= 0L)
    val days = dailyDollars
    assert(r.getAs[Long]("detect_day") >= days.head._1)
    assert(r.getAs[Long]("detect_day") <= days.last._1)
    // model: 10 low then 10 high values — the scaled PH max sits in the
    // high regime (index >= 10)
    val xs = (Seq.fill(10)(100L) ++ Seq.fill(10)(200L)).toArray
    val n = xs.length.toLong
    val s = xs.sum
    var cum = 0L
    var minM = Long.MaxValue
    var best = (Long.MinValue, -1)
    xs.zipWithIndex.foreach { case (x, i) =>
      cum += x
      val m = n * cum - (i + 1) * s
      minM = math.min(minM, m)
      val ph = m - minM
      if (ph > best._1) best = (ph, i)
    }
    assert(best._2 >= 10, s"detected at ${best._2}")
    assert(best._1 > 0L)
  }
}
