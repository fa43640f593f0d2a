package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 4 pins: XYZ partition + cut respect, cohort triangle
  * share budget, LOO z-score hand-check, runs-test closed forms, Theil–Sen
  * median membership, Lorenz curve shape (ends at (1,1), sits under the
  * diagonal, monotone). */
class Batch60Spec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q339: classes partition the part universe and respect the cuts") {
    val out = q("q339_xyz_classes").collect()
    val totalParts = Tables.lineitem(spark, sf)
      .select(col("l_partkey")).distinct().count()
    assert(out.map(_.getAs[Long]("n_parts")).sum === totalParts)
    out.foreach { r =>
      assert(r.getAs[Long]("cv_ppm_min") <= r.getAs[Long]("cv_ppm_max"))
      r.getAs[String]("xyz") match {
        case "X" => assert(r.getAs[Long]("cv_ppm_max") <= 3500000L)
        case "Y" => assert(r.getAs[Long]("cv_ppm_min") > 3500000L &&
          r.getAs[Long]("cv_ppm_max") <= 4500000L)
        case "Z" => assert(r.getAs[Long]("cv_ppm_min") > 4500000L)
        case other => fail(s"unknown class $other")
      }
    }
  }

  test("q340: cohort shares sum to the ppm budget under floor loss and " +
    "ages are non-negative") {
    val out = q("q340_cohort_triangle").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("age_wk") >= 0L, s"$r"))
    out.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Long]("share_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rs.length, s"shares $s")
      // one size per cohort
      assert(rs.map(_.getAs[Long]("cohort_users")).distinct.length === 1)
    }
  }

  test("q341: LOO z-score matches a hand computation on a 4-supplier toy") {
    // group {10, 12, 14, 100}: z of the whale against peers {10,12,14}
    val xs = Seq(10.0, 12.0, 14.0, 100.0)
    val x = 100.0
    val peers = xs.filterNot(_ == x)
    val mu = peers.sum / peers.length
    val sd = math.sqrt(peers.map(v => (v - mu) * (v - mu)).sum /
      (peers.length - 1))
    val zHand = (x - mu) / sd
    // the algebraic form the query uses, from group (n, Σx, Σx²)
    val (n, sx, sxx) = (xs.length.toDouble, xs.sum,
      xs.map(v => v * v).sum)
    val looMean = (sx - x) / (n - 1)
    val looVar = ((sxx - x * x) - (n - 1) * looMean * looMean) / (n - 2)
    assert(math.abs(math.sqrt(looVar) - sd) < 1e-9)
    assert(math.abs((x - looMean) / math.sqrt(looVar) - zHand) < 1e-9)
    // and on the fixture: every retained nation has n >= 4
    q("q341_peer_zscore").collect().foreach { r =>
      assert(r.getAs[Long]("n") >= 4L, s"$r")
    }
  }

  test("q342: runs bounded by sign counts; alternating toy maximizes " +
    "runs, trending toy minimizes them") {
    val r = q("q342_runs_test").head()
    val (n1, n2, runs) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("runs"))
    assert(runs >= 1L && runs <= n1 + n2)
    assert(runs <= 2L * math.min(n1, n2) + 1L, "runs cap 2*min+1")
    // closed forms: alternating signs -> runs = n; sorted signs -> 2 runs
    def countRuns(s: Seq[Int]): Int =
      1 + s.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
    assert(countRuns(Seq(0, 1, 0, 1, 0, 1)) === 6)
    assert(countRuns(Seq(0, 0, 0, 1, 1, 1)) === 2)
  }

  test("q343: the reported medians are genuine banded slopes and bracket " +
    "the true median rank") {
    val r = q("q343_theil_sen").head()
    val lo = r.getAs[Long]("med_lo_q")
    val hi = r.getAs[Long]("med_hi_q")
    val np = r.getAs[Long]("n_pairs")
    assert(lo <= hi)
    // recompute the banded slope multiset independently and check ranks
    val daily = Tables.orders(spark, sf)
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("day"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS LONG)) DIV 100")
        .as("x"))
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).sortBy(_._1)
    val slopes = (for {
      (d1, x1) <- daily
      (d2, x2) <- daily
      if d2 > d1 && d2 <= d1 + 30
    } yield math.floor((x2 - x1).toDouble * 1e6 /
      (d2 - d1).toDouble).toLong).sorted
    assert(slopes.length.toLong === np)
    assert(slopes((slopes.length + 1) / 2 - 1) === lo)
    assert(slopes(slopes.length / 2) === hi)
  }

  test("q344: Lorenz points end at (1e6, 1e6), are monotone, and sit on " +
    "or under the diagonal") {
    val out = q("q344_lorenz_points").collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Int]("c_nationkey")).foreach { case (_, rs) =>
      val pts = rs.sortBy(_.getAs[Long]("decile"))
      val last = pts.last
      assert(last.getAs[Long]("users_ppm") === 1000000L, s"$last")
      assert(last.getAs[Long]("spend_ppm") === 1000000L, s"$last")
      pts.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("users_ppm") <= b.getAs[Long]("users_ppm"))
          assert(a.getAs[Long]("spend_ppm") <= b.getAs[Long]("spend_ppm"))
        case _ =>
      }
      // ascending-spend ordering ⇒ curve under the diagonal (allow the
      // ppm floor slack)
      pts.foreach { p =>
        assert(p.getAs[Long]("spend_ppm") <=
          p.getAs[Long]("users_ppm") + 1L, s"$p")
      }
    }
  }
}
