package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Knife-edge audit for every floored-transcendental term that reaches an
  * oracle-checked output.
  *
  * Policy background (PLANS.md "Transcendental policy hardened", escape
  * hatch 3): a `floor(ln(x) * grain)` column is cross-engine safe only
  * because a 1-ulp JVM-vs-glibc `ln` disagreement (relative ~2^-52) flips
  * the floor only when the true value sits within ~|v|*2^-52 of a grid
  * boundary. That argument is probabilistic — and q395 LOST the r6 lottery
  * (one operand landed on a boundary on the driver box). This spec converts
  * the claim into a measured guarantee for the 9 floored-ln sites:
  * it recomputes each query's pre-floor scaled term over the sf0.01 gate
  * fixture and asserts every term sits at least 1e-12 * max(|v|, 1) from the
  * nearest integer — ~4,000x the worst 1-ulp libm error, so ANY
  * faithfully-rounded libm pair agrees on every floor. If a fixture
  * regeneration ever drops a term onto a boundary, this trips locally before
  * the driver's DuckDB compare does.
  *
  * ln(1) = 0 exactly in every libm (and the engines' CASE guards make the
  * multiplier exactly 0 in the same rows), so arg == 1 rows are boundary
  * hits BOTH engines resolve identically — excluded from the distance scan.
  *
  * Each probe duplicates its query's pipeline prefix by design (the
  * registered query must stay byte-stable); the duplicated block cites the
  * Entries file:line it mirrors — keep them in sync.
  */
class KnifeEdgeSpec extends SparkSpec {

  /** The driver's correctness-gate scale factor (override to audit another
    * SF, e.g. GRAFT_KNIFE_SF=/root/testdata/sf0.1 for the round-close
    * sweep). */
  private val gate =
    sys.env.getOrElse("GRAFT_KNIFE_SF", "/root/testdata/sf0.01")

  /** Assert every pre-floor scaled term `v` is far from an integer
    * boundary. Tolerance 1e-12 relative (floor 1e-12 absolute) vs a 1-ulp
    * libm error of ~2.2e-16 relative. */
  private def assertFloorSafe(name: String, vs: DataFrame): Unit = {
    // A ±Inf/NaN/NULL term (e.g. ln(0) from a degenerate operand) would be
    // SKIPPED by the min() below — the audit would pass while the real
    // query output diverges cross-engine. Fail loudly on any non-finite.
    val nonFinite = vs.selectExpr("CAST(v AS DOUBLE) AS v")
      .where("v IS NULL OR isnan(v) OR abs(v) = double('Infinity')").count()
    assert(nonFinite == 0L,
      s"$name: $nonFinite non-finite pre-floor terms — a degenerate operand " +
        "reached the transcendental; guard it in the query, not the probe")
    val agg = vs.selectExpr("CAST(v AS DOUBLE) AS v")
      .selectExpr("v - floor(v) AS frac", "greatest(abs(v) * 1e-12, 1e-12) AS tol")
      .selectExpr("least(frac, 1.0 - frac) AS dist", "tol")
      .agg(min(expr("dist / tol")).as("ratio"), count(lit(1)).as("n"),
        min(col("dist")).as("dist"))
      .head()
    val (ratio, n, dist) = (agg.getDouble(0), agg.getLong(1), agg.getDouble(2))
    info(f"$name: $n%d terms, min boundary distance $dist%.3e = $ratio%.0fx tolerance")
    assert(n > 0L, s"$name: probe produced no terms — pipeline drift vs the query?")
    assert(ratio > 1.0,
      f"$name: a floored term sits $dist%.3e from a grid boundary — within the " +
        "cross-libm knife edge. Re-express this term exactly (q395 precedent).")
  }

  /** Assert a double comparison whose right side contains ln() has margin:
    * |lhs - rhs| must exceed 1e-12 * max(|lhs|, 1). */
  private def assertCompareSafe(name: String, margins: DataFrame): Unit = {
    val nonFinite = margins
      .selectExpr("CAST(margin AS DOUBLE) AS m", "CAST(scale AS DOUBLE) AS s")
      .where("m IS NULL OR isnan(m) OR abs(m) = double('Infinity') OR " +
        "s IS NULL OR isnan(s) OR abs(s) = double('Infinity')").count()
    assert(nonFinite == 0L,
      s"$name: $nonFinite non-finite comparison margins — min() would skip " +
        "them and the audit would vacuously pass")
    val agg = margins.selectExpr("CAST(margin AS DOUBLE) AS m", "CAST(scale AS DOUBLE) AS s")
      .selectExpr("abs(m) AS dist", "greatest(abs(s) * 1e-12, 1e-12) AS tol")
      .agg(min(expr("dist / tol")).as("ratio"), count(lit(1)).as("n"),
        min(col("dist")).as("dist"))
      .head()
    val (ratio, n, dist) = (agg.getDouble(0), agg.getLong(1), agg.getDouble(2))
    info(f"$name: $n%d comparisons, min margin $dist%.3e = $ratio%.0fx tolerance")
    assert(n > 0L)
    assert(ratio > 1.0, f"$name: a ln-dependent comparison has margin $dist%.3e")
  }

  /** Tie a probe's duplicated pipeline prefix to the REGISTERED query: the
    * probe measures knife-edge distance on recomputed terms, so a probe
    * that silently drifts from the query would audit the wrong pipeline.
    * Each pin equates a probe-side row count with one derived from the
    * query's own output at the same SF. (q314 has no pin: its output is
    * the top-20 window per source, which exposes no prefix cardinality.) */
  private def assertNoDrift(name: String, probeCount: Long, queryCount: Long): Unit =
    assert(probeCount == queryCount,
      s"$name: probe pipeline drifted from the registered query " +
        s"(probe=$probeCount, query=$queryCount) — re-sync KnifeEdgeSpec " +
        "with the Entries implementation")

  // ---- q298 Zipf slope (Entries51.scala:294-307): x/y = floor(ln(k)*1e4)

  test("q298: ln(rank) and ln(cnt) terms clear the 1e-4 grid boundaries") {
    val toks = Tables.documents(spark, gate)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = toks.withColumn("rank",
      row_number().over(Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("tok").asc)))
      .where(col("rank") <= 100)
    val sumNpts = SparkEntry.queries("q298_zipf_slope")(spark, gate)
      .agg(sum(col("n_pts")).cast("long")).head().getLong(0)
    assertNoDrift("q298", ranked.count(), sumNpts)
    // VALUE-level anti-drift pin (ADVICE r7): re-aggregate the probe's own
    // floored terms through the query's exact-integer moment algebra and
    // assert the shipped (n_pts, zipf_slope) reproduce per language — the
    // final division is the same exact-integer pair in the same JVM, so
    // equality is bitwise, not approximate.
    val probeSlope = ranked
      .withColumn("x", floor(log(col("rank").cast("double")) * 1e4).cast("long"))
      .withColumn("y", floor(log(col("cnt").cast("double")) * 1e4).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("pn"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("lang"), col("pn"),
        ((col("pn") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("pn") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("probe_slope"))
    val mismatched = probeSlope
      .join(SparkEntry.queries("q298_zipf_slope")(spark, gate), Seq("lang"))
      .where(col("pn") =!= col("n_pts") ||
        col("probe_slope") =!= col("zipf_slope"))
    assert(mismatched.isEmpty,
      "q298: probe moments no longer reproduce the query's zipf_slope")
    val vs = ranked.where(col("rank") > 1)
      .select((log(col("rank").cast("double")) * 1e4).as("v"))
      .union(ranked.where(col("cnt") > 1)
        .select((log(col("cnt").cast("double")) * 1e4).as("v")))
    assertFloorSafe("q298", vs)
  }

  // ---- q300 bigram NLL (Entries52.scala:104-129): floor(ln((c2+1)/(c1+V))*1e4)

  test("q300: smoothed bigram log-prob terms clear the 1e-4 grid boundaries") {
    val docs = Tables.documents(spark, gate)
    val sp = ext.TrainPrep.hashSplit(docs, "doc_id")
    val bigrams = sp
      .withColumn("w", split(col("text"), " "))
      // guard: a 1-token doc makes sequence(1, 0) = [1, 0] (Spark defaults
      // the step to -1 when start > stop) and element_at(w, 0) throws; such
      // docs contribute no bigrams anyway, so the filter is a no-op on the
      // probe's term set
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), col("source"), col("split"),
        explode(expr(
          "transform(sequence(1, size(w) - 1), " +
            "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"))
          .as("bg"))
      .select(col("source"), col("split"), col("bg.w1"), col("bg.w2"))
    val trBg = bigrams.filter(col("split") === "train")
    val c2 = trBg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val v = sp.filter(col("split") === "train")
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    val scoredArgs = bigrams.filter(col("split") === "test")
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .select(col("source"),
        ((coalesce(col("c2"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("c1"), lit(0L)) + v).cast("double")).as("arg"))
    val outBigrams = SparkEntry.queries("q300_bigram_nll")(spark, gate)
      .agg(sum(col("n_bigrams")).cast("long")).head().getLong(0)
    assertNoDrift("q300", scoredArgs.count(), outBigrams)
    // VALUE-level anti-drift pin (ADVICE r7): re-aggregate the probe's own
    // floored log-probs per source and assert the shipped
    // (n_bigrams, avg_nll) reproduce — identical exact-integer division in
    // the same JVM, so equality is bitwise.
    val probeNll = scoredArgs
      .select(col("source"),
        floor(log(col("arg")) * 1e4).cast("long").as("lp_q"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("pn"), sum(col("lp_q")).as("slp"))
      .select(col("source"), col("pn"),
        (-col("slp").cast("double") / col("pn") / 1e4).as("probe_nll"))
    val mismatched = probeNll
      .join(SparkEntry.queries("q300_bigram_nll")(spark, gate), Seq("source"))
      .where(col("pn") =!= col("n_bigrams") ||
        col("probe_nll") =!= col("avg_nll"))
    assert(mismatched.isEmpty,
      "q300: probe log-probs no longer reproduce the query's avg_nll")
    val vs = scoredArgs.where(col("arg") =!= 1.0)
      .select((log(col("arg")) * 1e4).as("v"))
    assertFloorSafe("q300", vs)
  }

  // ---- q303 PSI drift (Entries52.scala:315-334): floor((p-q)*ln(p/q)*1e8)

  test("q303: PSI terms clear the 1e-8 grid boundaries") {
    val o = Tables.orders(spark, gate)
      .select((graft.ops.Relational.epochUs(col("o_orderdate"))
        / 86400000000L).cast("long").as("day"),
        floor(col("o_totalprice") / 50000.0).cast("long").as("band"))
    val mid = o.agg(((min(col("day")) + max(col("day"))) / lit(2L))
      .cast("long")).head().getLong(0)
    val counts = o.groupBy(col("band"))
      .agg(sum(when(col("day") < mid, 1L).otherwise(0L)).as("na"),
        sum(when(col("day") >= mid, 1L).otherwise(0L)).as("nb"))
    val tots = counts.agg(sum(col("na")), sum(col("nb")), count(lit(1))).head()
    val (ta, tb, nb2) = (tots.getLong(0), tots.getLong(1), tots.getLong(2))
    assertNoDrift("q303", counts.count(),
      SparkEntry.queries("q303_psi_drift")(spark, gate).count())
    val terms = counts
      .withColumn("arg",
        ((col("na") + 1L).cast("double") * lit(tb + nb2).cast("double")) /
          ((col("nb") + 1L).cast("double") * lit(ta + nb2).cast("double")))
      .withColumn("v",
        (((col("na") + 1L).cast("double") / lit(ta + nb2).cast("double")) -
          ((col("nb") + 1L).cast("double") / lit(tb + nb2).cast("double"))) *
          log(col("arg")) * 1e8)
    // VALUE-level anti-drift pin (ADVICE r7): flooring the probe's own
    // pre-floor term must reproduce the query's shipped psi_term_q for
    // every band — a grid-grain or formula edit that survives the row-
    // count pin above fails here. arg==1 rows floor to 0 on both sides.
    val mismatched = terms
      .select(col("band"), floor(col("v")).cast("long").as("probe_q"))
      .join(SparkEntry.queries("q303_psi_drift")(spark, gate)
        .select(col("band"), col("psi_term_q")), Seq("band"))
      .where(col("probe_q") =!= col("psi_term_q"))
    assert(mismatched.isEmpty,
      "q303: probe term no longer reproduces the query's psi_term_q — " +
        "the probe audits a different formula/grain than the query ships")
    assertFloorSafe("q303",
      terms.where(col("arg") =!= 1.0).select(col("v")))
  }

  // ---- q308 word PMI (Entries53.scala:195-217): floor(ln(c_ab*N/(c_a*c_b))*1e4)

  test("q308: PMI terms clear the 1e-4 grid boundaries") {
    val dw = Tables.documents(spark, gate)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = Tables.documents(spark, gate).count()
    val cw = dw.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = dw.as("a")
      .join(dw.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    val joined = pairs
      .join(cw.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(cw.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .select(col("w1"), col("w2"),
        ((col("c_ab") * lit(n)).cast("double") /
          (col("c_a") * col("c_b")).cast("double")).as("arg"))
    val vs = joined.where(col("arg") =!= 1.0)
      .select((log(col("arg")) * 1e4).as("v"))
    try {
      assertNoDrift("q308", joined.count(),
        SparkEntry.queries("q308_word_pmi")(spark, gate).count())
      // VALUE-level anti-drift pin (ADVICE r7): the probe's floored term
      // must equal the query's shipped pmi_q for every pair
      val mismatched = joined
        .select(col("w1"), col("w2"),
          floor(log(col("arg")) * 1e4).cast("long").as("probe_q"))
        .join(SparkEntry.queries("q308_word_pmi")(spark, gate)
          .select(col("w1"), col("w2"), col("pmi_q")), Seq("w1", "w2"))
        .where(col("probe_q") =!= col("pmi_q"))
      assert(mismatched.isEmpty,
        "q308: probe term no longer reproduces the query's pmi_q")
      assertFloorSafe("q308", vs)
    } finally dw.unpersist()
  }

  // ---- q314 weighted reservoir (Entries55.scala:53-58): floor(ln((h+1)/2^48)*1e6)

  test("q314: reservoir ln(u) keys clear the 1e-6 grid boundaries") {
    // Term expression is SHARED with the query (Entries55.q314PreFloorTerm /
    // q314LnuQ) — drift is impossible by construction; the lockstep of the
    // pre-floor term with the shipped floored key is asserted below.
    val docs = Tables.documents(spark, gate).filter(col("n_chars") >= 1L)
    val vs = docs
      .select(Entries55.q314PreFloorTerm.as("v"), Entries55.q314LnuQ.as("q"))
    // (h+1)/2^48 = 1 ⇒ ln = 0 exactly in every libm; such rows are
    // engine-identical boundary hits, excluded from the distance scan —
    // but they must still satisfy the floor-lockstep pin first.
    assert(vs.where("CAST(floor(v) AS BIGINT) <> q").isEmpty,
      "q314: pre-floor probe term out of lockstep with the shipped key")
    assertFloorSafe("q314", vs.where(col("v") =!= 0.0).select(col("v")))
  }

  // ---- q318 mutual information (Entries56.scala:73-94):
  //      floor((n_xy/N)*ln(n_xy*N/(n_x*n_y))*1e8)

  test("q318: MI terms clear the 1e-8 grid boundaries") {
    val jo = Tables.orders(spark, gate)
      .join(broadcast(Tables.customer(spark, gate)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    val cells = jo.groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy(col("c_mktsegment")).agg(sum(col("n_xy")).as("n_x"))
    val my = cells.groupBy(col("o_orderpriority")).agg(sum(col("n_xy")).as("n_y"))
    val n = cells.agg(sum(col("n_xy"))).head().getLong(0)
    val joined = cells.join(broadcast(mx), Seq("c_mktsegment"))
      .join(broadcast(my), Seq("o_orderpriority"))
      .select(col("c_mktsegment"), col("o_orderpriority"), col("n_xy"),
        ((col("n_xy") * lit(n)).cast("double") /
          (col("n_x") * col("n_y")).cast("double")).as("arg"))
    assertNoDrift("q318", joined.count(),
      SparkEntry.queries("q318_mutual_info")(spark, gate).count())
    // VALUE-level anti-drift pin (ADVICE r7): flooring the probe's term
    // must reproduce the query's mi_term_q for every cell (arg==1 rows
    // floor to 0 on both sides)
    val mismatched = joined
      .select(col("c_mktsegment"), col("o_orderpriority"),
        floor((col("n_xy").cast("double") / lit(n.toDouble)) *
          log(col("arg")) * 1e8).cast("long").as("probe_q"))
      .join(SparkEntry.queries("q318_mutual_info")(spark, gate)
        .select(col("c_mktsegment"), col("o_orderpriority"),
          col("mi_term_q")),
        Seq("c_mktsegment", "o_orderpriority"))
      .where(col("probe_q") =!= col("mi_term_q"))
    assert(mismatched.isEmpty,
      "q318: probe term no longer reproduces the query's mi_term_q")
    val vs = joined.where(col("arg") =!= 1.0)
      .select(((col("n_xy").cast("double") / lit(n.toDouble)) *
        log(col("arg")) * 1e8).as("v"))
    assertFloorSafe("q318", vs)
  }

  // ---- q388 BH-FDR (Entries68.scala:145-180): the step-up compare
  //      chi2 >= -2*ln(rk*0.1/m) is the only ln-dependent decision; chi2
  //      itself is an identical IEEE chain (same chi2Str in both engines).

  test("q388: BH step-up comparisons have margin at every rank") {
    val cells = Tables.orders(spark, gate)
      .join(broadcast(Tables.customer(spark, gate)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nation"),
        (conv(substring(md5(col("o_orderkey").cast("string")), 1, 12),
          16, 10).cast("long") % 2L).as("arm"),
        when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"), 0)
          .when(substring(col("o_orderpriority"), 1, 1) === "3", 1)
          .otherwise(2).as("cls"))
    val tab = cells.groupBy(col("nation")).agg(
      sum(when(col("arm") === 0L && col("cls") === 0, 1L).otherwise(0L)).as("ca0"),
      sum(when(col("arm") === 0L && col("cls") === 1, 1L).otherwise(0L)).as("ca1"),
      sum(when(col("arm") === 0L && col("cls") === 2, 1L).otherwise(0L)).as("ca2"),
      sum(when(col("arm") === 1L && col("cls") === 0, 1L).otherwise(0L)).as("cb0"),
      sum(when(col("arm") === 1L && col("cls") === 1, 1L).otherwise(0L)).as("cb1"),
      sum(when(col("arm") === 1L && col("cls") === 2, 1L).otherwise(0L)).as("cb2"))
    val chi = tab.selectExpr("nation", "ca0", "ca1", "ca2", "cb0", "cb1", "cb2",
        "ca0 + ca1 + ca2 AS ra", "cb0 + cb1 + cb2 AS rb",
        "ca0 + cb0 AS t0", "ca1 + cb1 AS t1", "ca2 + cb2 AS t2")
      .selectExpr("nation",
        "CAST(ra + rb AS DOUBLE) AS nn0", "ra", "rb", "t0", "t1", "t2",
        "ca0", "ca1", "ca2", "cb0", "cb1", "cb2")
      .withColumnRenamed("nn0", "nn")
      .selectExpr("nation", s"${Entries68.chi2Str} AS chi2")
    val margins = chi.selectExpr("chi2",
        "row_number() OVER (ORDER BY chi2 DESC, nation ASC) AS rk",
        "CAST(count(*) OVER () AS BIGINT) AS m")
      .selectExpr(
        "chi2 - (-2.0 * ln((CAST(rk AS DOUBLE) * 0.1) / m)) AS margin",
        "chi2 AS scale")
    assertNoDrift("q388", chi.count(),
      SparkEntry.queries("q388_bh_fdr")(spark, gate).count())
    assertCompareSafe("q388", margins)
  }

  // ---- q391 DP histogram (Entries68.scala:369-386): floor(±ln(1∓2z)*1000)

  test("q391: Laplace inverse-CDF noise terms clear the milli grid") {
    val geo = Tables.customer(spark, gate)
      .join(broadcast(Tables.nation(spark, gate)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, gate)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    val zdf = Tables.orders(spark, gate)
      .join(broadcast(geo), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name").as("region"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("cnt"))
      .selectExpr("region", "priority", "cnt",
        "CAST(conv(substring(md5(concat(region, '|', priority)), 1, 12), 16, 10) AS BIGINT) AS h")
      .selectExpr("region", "priority", "cnt",
        "CAST(h AS DOUBLE) / 281474976710656.0 - 0.5 AS z")
      .selectExpr("region", "priority", "cnt",
        "CASE WHEN z >= 0.0 THEN 1.0 - 2.0*z ELSE 1.0 + 2.0*z END AS arg",
        "z")
    assertNoDrift("q391", zdf.count(),
      SparkEntry.queries("q391_dp_histogram")(spark, gate).count())
    // VALUE-level anti-drift pin (ADVICE r7): rebuilding the release from
    // the probe's own count + floored noise must reproduce the query's
    // shipped noisy_milli for every cell
    val mismatched = zdf
      .selectExpr("region", "priority",
        "cnt * 1000 + CAST(floor((CASE WHEN z >= 0.0 THEN -ln(arg) " +
          "ELSE ln(arg) END) * 1000) AS BIGINT) AS probe_milli")
      .join(SparkEntry.queries("q391_dp_histogram")(spark, gate)
        .select(col("region"), col("priority"), col("noisy_milli")),
        Seq("region", "priority"))
      .where(col("probe_milli") =!= col("noisy_milli"))
    assert(mismatched.isEmpty,
      "q391: probe noise no longer reproduces the query's noisy_milli")
    val vs = zdf.where(col("arg") =!= 1.0)
      .selectExpr(
        "(CASE WHEN z >= 0.0 THEN -ln(arg) ELSE ln(arg) END) * 1000 AS v")
    assertFloorSafe("q391", vs)
  }

  // ---- q418 Moore–Lewis (Entries73.scala): floor(ln((c2+1)/(c1+V))*1e4),
  //      TWO LMs per bigram (in-domain and full-pool)

  test("q418: both LMs' smoothed log-prob terms clear the 1e-4 grid boundaries") {
    val docs = Tables.documents(spark, gate)
    val sp = ext.TrainPrep.hashSplit(docs, "doc_id")
    val bigrams = sp
      .withColumn("w", split(col("text"), " "))
      // same 1-token-doc guard as the q300 probe above: sequence(1, 0)
      // descends and element_at(w, 0) throws; no bigrams are lost
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), col("lang"), col("split"),
        explode(expr(
          "transform(sequence(1, size(w) - 1), " +
            "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"))
          .as("bg"))
      .select(col("doc_id"), col("lang"), col("split"),
        col("bg.w1"), col("bg.w2"))
    val tr = bigrams.filter(col("split") === "train")
    val vIn = sp.filter(col("split") === "train" && col("lang") === "en")
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    val vOut = sp.filter(col("split") === "train")
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    val c2i = tr.filter(col("lang") === "en")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2i"))
    val c1i = c2i.groupBy(col("w1")).agg(sum(col("c2i")).as("c1i"))
    val c2o = tr.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2o"))
    val c1o = c2o.groupBy(col("w1")).agg(sum(col("c2o")).as("c1o"))
    val scored = bigrams.filter(col("split") === "test")
      .join(c2i, Seq("w1", "w2"), "left").join(c1i, Seq("w1"), "left")
      .join(c2o, Seq("w1", "w2"), "left").join(c1o, Seq("w1"), "left")
      .select(col("doc_id"),
        ((coalesce(col("c2i"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("c1i"), lit(0L)) + vIn).cast("double")).as("arg_in"),
        ((coalesce(col("c2o"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("c1o"), lit(0L)) + vOut).cast("double")).as("arg_out"))
    val out = SparkEntry.queries("q418_moore_lewis")(spark, gate)
    assertNoDrift("q418", scored.count(),
      out.agg(sum(col("n_bigrams")).cast("long")).head().getLong(0))
    // VALUE-level anti-drift pin: per-doc sums of the probe's own floored
    // diffs must reproduce the shipped score_q bitwise (same JVM)
    val probeScores = scored
      .select(col("doc_id"),
        (floor(log(col("arg_out")) * 1e4).cast("long") -
          floor(log(col("arg_in")) * 1e4).cast("long")).as("d_q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("pn"), sum(col("d_q")).as("ps"))
    val mismatched = probeScores.join(out, Seq("doc_id"))
      .where(col("pn") =!= col("n_bigrams") || col("ps") =!= col("score_q"))
    assert(mismatched.isEmpty,
      "q418: probe scores no longer reproduce the query's score_q")
    val vs = scored.select(col("arg_in").as("arg"))
      .union(scored.select(col("arg_out").as("arg")))
      .where(col("arg") =!= 1.0)
      .select((log(col("arg")) * 1e4).as("v"))
    assertFloorSafe("q418", vs)
  }

  // ---- q419/q420 unigram LM (ext/UnigramLm.scala): floor(ln(arg)*1e4) at
  //      round 0 (cnt/T0) and each EM re-score ((c+1)/(T+V0))

  test("q419/q420: every unigram-LM scoring term clears the 1e-4 grid " +
    "boundaries") {
    // NO duplicated prefix here: UnigramLm.lnArgsForAudit returns the
    // pre-floor arguments from the SAME training plan the registered
    // queries run (the arg column rides inside the lp relations), so the
    // probe cannot drift from the query by construction.
    val vs = ext.UnigramLm.lnArgsForAudit(Tables.documents(spark, gate))
      .where(col("arg") =!= 1.0)
      .select((log(col("arg")) * 1e4).as("v"))
    assertFloorSafe("q419", vs)
  }

  // ---- q428 prune round (ext/UnigramLm.scala): the post-prune M-step
  //      re-score adds floor(ln((c+1)/(T'+V1))*1e4) terms over the PRUNED
  //      vocabulary — the only new floors beyond the q419 training audit

  test("q428: the post-prune re-score terms clear the 1e-4 grid " +
    "boundaries") {
    // same-plan hook (UnigramLm.pruneLnArgsForAudit) — the arg column
    // rides inside the q428 lpPost relation, so no duplicated pipeline
    val vs = ext.UnigramLm.pruneLnArgsForAudit(Tables.documents(spark, gate))
      .where(col("arg") =!= 1.0)
      .select((log(col("arg")) * 1e4).as("v"))
    assertFloorSafe("q428", vs)
  }

  // ---- q421 DSIR (Entries74.scala): floor(ln((c+1)/(T+256))*1e4) for the
  //      two bucket models + floor(ln((2h+1)/2e6)*1e4) acceptance uniform

  test("q421: DSIR bucket-model terms and acceptance uniforms clear the " +
    "1e-4 grid boundaries") {
    // mirrors Entries74.scala q421 — keep in sync
    val docs = Tables.documents(spark, gate)
    val sp = ext.TrainPrep.hashSplit(docs, "doc_id")
    val toks = sp
      .withColumn("w", split(col("text"), " "))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), col("lang"), col("split"),
        explode(expr(
          "transform(sequence(1, size(w) - 1), " +
            "i -> struct(element_at(w, i) AS w1, " +
            "element_at(w, i + 1) AS w2))")).as("bg"))
      .select(col("doc_id"), col("lang"), col("split"),
        pmod(ext.Dedup.contentId(
          concat(col("bg.w1"), lit(" "), col("bg.w2"))), lit(256L)).as("b"))
    val ct = toks.filter(col("split") === "train" && col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ctb"))
    val cr = toks.filter(col("split") === "train")
      .groupBy(col("b")).agg(count(lit(1)).as("crb"))
    val tt = ct.agg(sum(col("ctb")).as("tt")).head().getLong(0)
    val tr = cr.agg(sum(col("crb")).as("tr")).head().getLong(0)
    val scored = toks.filter(col("split") === "test")
      .join(ct, Seq("b"), "left").join(cr, Seq("b"), "left")
      .select(col("doc_id"),
        ((coalesce(col("ctb"), lit(0L)) + 1L).cast("double") /
          lit(tt + 256L).cast("double")).as("arg_t"),
        ((coalesce(col("crb"), lit(0L)) + 1L).cast("double") /
          lit(tr + 256L).cast("double")).as("arg_r"))
    val out = SparkEntry.queries("q421_dsir_resample")(spark, gate)
    assertNoDrift("q421", scored.count(),
      out.agg(sum(col("n_bigrams")).cast("long")).head().getLong(0))
    // VALUE-level anti-drift pin: the probe's floored diffs must reproduce
    // the shipped logw_q bitwise (same JVM)
    val probeScores = scored
      .select(col("doc_id"),
        (floor(log(col("arg_t")) * 1e4).cast("long") -
          floor(log(col("arg_r")) * 1e4).cast("long")).as("d_q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("pn"), sum(col("d_q")).as("ps"))
    val mismatched = probeScores.join(out, Seq("doc_id"))
      .where(col("pn") =!= col("n_bigrams") || col("ps") =!= col("logw_q"))
    assert(mismatched.isEmpty,
      "q421: probe scores no longer reproduce the query's logw_q")
    // acceptance uniforms: one per test doc, u = (2h+1)/2e6
    val uArgs = out.select(
      ((pmod(ext.Dedup.contentId(col("doc_id").cast("string")),
        lit(1000000L)) * 2L + 1L).cast("double") / lit(2000000.0)).as("arg"))
    val vs = scored.select(col("arg_t").as("arg"))
      .union(scored.select(col("arg_r").as("arg")))
      .union(uArgs)
      .where(col("arg") =!= 1.0)
      .select((log(col("arg")) * 1e4).as("v"))
    assertFloorSafe("q421", vs)
  }

  // ---- q423/q424 HLL linear counting (Entries74.scala):
  //      floor(ln(256/V)*1e4) — shared by the per-group sketch and the
  //      month rollup (identical argument domain)

  test("q423: linear-counting terms clear the 1e-4 grid boundaries — " +
    "exhaustively, for every possible register-zero count") {
    // the ln argument is 256/V for V in 1..255 — the FULL domain is 255
    // rationals, so audit all of them, not just the fixture's draws
    // (V = 256 is excluded by the query's v_zero > 0 guard; 256/256 = 1
    // is the exact-zero case both engines agree on anyway)
    val vs = spark.range(1, 256)
      .select((log(lit(256.0) / col("id").cast("double")) * 1e4).as("v"))
    assertFloorSafe("q423", vs)
  }

  // ---- q443 BM25 (Entries77.scala): floor(ln((2N+2)/(2df+1))·1e4) —
  //      the Lucene idf form, one argument per selected query term

  test("q443: the ten query-term idf arguments clear the 1e-4 grid " +
    "boundaries, and the probe idfs reproduce the query's idf_q") {
    val toks = Tables.documents(spark, gate)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val nDocs = toks.select(col("doc_id")).distinct().count()
    val dfT = toks.distinct().groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc).limit(10)
    val probe = dfT.select(col("term"),
      ((lit(nDocs) * 2 + 2).cast("double") /
        (col("df") * 2 + 1).cast("double")).as("arg"))
    val out = SparkEntry.queries("q443_bm25_topk")(spark, gate)
      .select(col("term"), col("idf_q")).distinct()
    assertNoDrift("q443", probe.count(), out.count())
    val mismatched = probe
      .select(col("term"),
        floor(log(col("arg")) * 1e4).cast("long").as("p_idf"))
      .join(out, Seq("term"))
      .where(col("p_idf") =!= col("idf_q"))
    assert(mismatched.isEmpty,
      "q443: probe idfs no longer reproduce the query's idf_q")
    assertFloorSafe("q443", probe.select((log(col("arg")) * 1e4).as("v")))
  }

  test("q454: every modified-precision ln argument clears the 1e-4 grid " +
    "boundaries (probe reads the query's own clip/len output — no " +
    "pipeline duplication, no drift)") {
    // p_n = clip_n / (c_len − n + 1); audit rows with 0 < clip_n < tot_n
    // (clip = 0 is the sentinel branch, clip = tot is ln(1) = 0 — exact
    // in every libm, the spec-documented excluded class)
    val out = SparkEntry.queries("q454_bleu_pairs")(spark, gate)
      .select(col("c_len"), col("clip1"), col("clip2"), col("clip3"),
        col("clip4"))
    val terms = (1 to 4).map { n =>
      out.selectExpr(s"clip$n AS clip", s"c_len - ${n - 1} AS tot")
        .where(col("clip") > 0 && col("clip") < col("tot"))
        .selectExpr("ln(CAST(clip AS DOUBLE) / tot) * 1e4 AS v")
    }.reduce(_ unionByName _)
    assertFloorSafe("q454", terms)
  }
}
