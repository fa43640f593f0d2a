package graft

import org.apache.spark.sql.functions._

/** Round-11 batch 1 pins: unigram-LM vocabulary/segmentation invariants
  * (coverage, reconstruction, count conservation) and DSIR resampling
  * accounting (weight-threshold rule, argmax acceptance). */
class Batch74Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q419: the trained vocabulary is substrings-only, scores are " +
    "negative log-probs, and counts conserve total segmented length") {
    val types = graft.ext.UnigramLm.wordTypes(Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = q("q419_unigram_lm").collect()
    assert(vocab.nonEmpty)
    vocab.foreach { r =>
      val piece = r.getAs[String]("piece")
      assert(piece.nonEmpty && piece.length <= graft.ext.UnigramLm.MaxPiece)
      assert(types.keys.exists(_.contains(piece)),
        s"vocab piece '$piece' is not a substring of any training word type")
      assert(r.getAs[Long]("cnt") > 0L)
      // a probability < 1 on the 1e-4 grid floors to <= -1
      assert(r.getAs[Long]("lp_q") < 0L)
    }
    // CHARACTER CONSERVATION: summing |piece|*cnt over the vocab equals
    // the freq-weighted total character count of the training word types
    // (every char of every word instance is covered by exactly one piece
    // of its segmentation — Viterbi paths are exact covers)
    val coveredChars = vocab
      .map(r => r.getAs[String]("piece").length * r.getAs[Long]("cnt")).sum
    val totalChars = types.map { case (w, f) => w.length * f }.sum
    assert(coveredChars === totalChars,
      s"piece counts cover $coveredChars chars, corpus has $totalChars")
  }

  test("q420: every encoding reconstructs its word exactly and n_pieces " +
    "matches; the piece set equals the trained vocabulary") {
    val enc = q("q420_unigram_encode").collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val w = r.getAs[String]("w")
      val pieces = r.getAs[String]("encoding").split('|')
      assert(pieces.mkString("") === w,
        s"encoding '${r.getAs[String]("encoding")}' does not reconstruct '$w'")
      assert(pieces.length.toLong === r.getAs[Long]("n_pieces"))
    }
    // the encode pass segments under the FINAL smoothed scores — the same
    // scores whose usage counts q419 reports, but from one EM step later,
    // so the piece SET may differ only by pieces the last re-score moved;
    // assert both sets draw from the seed (len <= MaxPiece) and overlap
    val encPieces = enc.flatMap(_.getAs[String]("encoding").split('|')).toSet
    val vocab = q("q419_unigram_lm").collect()
      .map(_.getAs[String]("piece")).toSet
    assert(encPieces.forall(_.length <= graft.ext.UnigramLm.MaxPiece))
    assert((encPieces intersect vocab).nonEmpty)
  }

  test("q420: one output row per trainable word type") {
    val types = graft.ext.UnigramLm.wordTypes(Tables.documents(spark, sf))
    assert(q("q420_unigram_encode").count() === types.count())
  }

  test("q421: selection follows the hash-threshold rule and the argmax " +
    "doc is always accepted") {
    val out = q("q421_dsir_resample").collect()
    assert(out.nonEmpty)
    val mx = out.map(_.getAs[Long]("logw_q")).max
    out.foreach { r =>
      val lnu = r.getAs[Long]("lnu_q")
      assert(lnu < 0L, "ln of a uniform in (0,1) must floor below zero")
      assert(r.getAs[Boolean]("selected") ===
        (lnu < r.getAs[Long]("logw_q") - mx))
      assert(r.getAs[Long]("n_bigrams") > 0L)
    }
    // the max-weight doc's threshold is 0 > lnu_q — always selected
    val top = out.filter(_.getAs[Long]("logw_q") == mx)
    assert(top.forall(_.getAs[Boolean]("selected")))
    // and one row per test-split doc that has at least one bigram
    val expected = graft.ext.TrainPrep
      .hashSplit(Tables.documents(spark, sf), "doc_id")
      .filter(col("split") === "test" &&
        size(split(col("text"), " ")) >= 2)
      .count()
    assert(out.length.toLong === expected)
  }

  test("q422: the SQL-text surface reaches the dedup views; no near-dup " +
    "pair survives with both members kept") {
    val out = q("q422_sql_dedup_keep").collect()
    // one row per document, and the views landed in the catalog
    assert(out.length.toLong === Tables.documents(spark, sf).count())
    for (v <- Seq("graft_neardup_pairs", "graft_quality", "graft_docs",
      "graft_exact_dups", "graft_simhash", "graft_langid"))
      assert(spark.catalog.tableExists(v), s"view $v not registered")
    val keep = out.filter(_.getAs[Int]("keep") == 1)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(keep.nonEmpty && keep.size < out.length,
      "fixture has near-dups, so some doc must be dropped and some kept")
    val pairs = graft.ext.Dedup
      .minhashLshPairs(Tables.documents(spark, sf), 3, 0.5).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { p =>
      assert(!(keep(p.getAs[Long]("d1")) && keep(p.getAs[Long]("d2"))),
        s"pair (${p.get(0)}, ${p.get(1)}): both members kept — the SQL " +
          "loser rule must drop one side of every verified pair")
    }
  }

  test("q423: HLL register algebra is consistent and the estimate lands " +
    "within the published error envelope in its regime") {
    val out = q("q423_hll_registers").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r.getAs[Long]("v_zero")
      assert(v >= 0L && v <= 256L)
      // harmonic-sum bounds: every register contributes (0, 2^41]
      val s = r.getAs[Long]("s_scaled")
      assert(s > 0L && s <= 256L * (1L << 41))
      // the regime rule: raw <= 2.5m with zeros -> linear counting
      val raw = r.getAs[Long]("raw_milli")
      val est = r.getAs[Long]("est_milli")
      if (raw <= 640000L && v > 0L)
        assert(est === r.getAs[Long]("lc_milli"))
      else assert(est === raw)
      // m = 256 -> relative std error ~1.04/sqrt(256) = 6.5%; gate at
      // 4 sigma (26%) so a fixture regeneration can't flake the spec
      // while a broken rho/register build (orders-of-magnitude off)
      // still fails loudly
      assert(r.getAs[Long]("err_ppm") < 260000L,
        s"${r.getAs[String]("grp")}: est $est vs exact " +
          s"${r.getAs[Long]("n_exact")} — outside 4 sigma")
    }
  }

  test("q425: the compression report reconciles with the encode output " +
    "and the code length is positive") {
    val rep = q("q425_unigram_report").head()
    val enc = q("q420_unigram_encode")
      .agg(sum(col("freq") * col("n_pieces")).as("tp"),
        sum(col("freq")).as("nw"), count(lit(1)).as("nt"))
      .head()
    // both run the encode pass under the FINAL scores — totals must agree
    assert(rep.getAs[Long]("total_pieces") === enc.getLong(0))
    assert(rep.getAs[Long]("n_words") === enc.getLong(1))
    assert(rep.getAs[Long]("n_types") === enc.getLong(2))
    assert(rep.getAs[Long]("fertility_milli") >= 1000L,
      "a segmentation has at least one piece per word")
    assert(rep.getAs[Long]("code_len_q") > 0L)
    assert(rep.getAs[Long]("vocab_used") <= rep.getAs[Long]("total_pieces"))
  }

  test("q426: set identities hold exactly on the exact side and the " +
    "union estimate respects monotonicity") {
    val out = q("q426_hll_overlap").collect()
      .map(r => r.getAs[String]("set_name") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("est_milli"))).toMap
    assert(out.keySet === Set("a", "b", "union", "inter"))
    // exact inclusion-exclusion is an identity, not an estimate
    assert(out("a")._1 + out("b")._1 - out("inter")._1 === out("union")._1)
    // union >= each side, inter <= each side (exact)
    assert(out("union")._1 >= out("a")._1 && out("union")._1 >= out("b")._1)
    assert(out("inter")._1 <= out("a")._1 && out("inter")._1 <= out("b")._1)
    // estimated union >= each side's estimate (register max dominates)
    assert(out("union")._2 >= out("a")._2 && out("union")._2 >= out("b")._2)
    // estimate errors inside the (compounded) envelope
    Seq("a", "b", "union").foreach { k =>
      val (n, e) = out(k)
      assert(math.abs(e - n * 1000) < n * 1000 * 26 / 100, s"$k: $e vs $n")
    }
  }

  test("q424: week->month register max-merge equals the direct month " +
    "build (max associativity, executed) and the estimate stays in the " +
    "error envelope") {
    import org.apache.spark.sql.functions.{length => sqlLength}
    val out = q("q424_hll_rollup").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("err_ppm") < 260000L,
      s"month ${r.getAs[Long]("month")}: outside 4 sigma"))
    // associativity: registers built per month DIRECTLY from raw events
    // must equal the week-then-month max-merge the query performs —
    // compare the derived harmonic sums
    val ev = Tables.events(spark, sf)
    val h = graft.ext.Dedup.contentId(col("user_id").cast("string"))
    val direct = ev
      .select(expr("(ts_us DIV 604800000000) * 7 DIV 30").as("month"),
        (h % 256L).as("j"),
        (h.cast("long") / lit(256L)).cast("long").as("w"))
      .select(col("month"), col("j"),
        when(col("w") === 0L, lit(41L))
          .otherwise(lit(41L) - sqlLength(bin(col("w"))).cast("long"))
          .as("rho"))
      .groupBy(col("month"), col("j")).agg(max(col("rho")).as("m_j"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(41 - m_j AS INT))"))
          .as("s_seen"))
      .select(col("month"),
        (col("s_seen") + (lit(256L) - col("n_regs")) * lit(1L << 41))
          .as("s_direct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("s_scaled") === direct(r.getAs[Long]("month")),
        s"month ${r.getAs[Long]("month")}: rolled-up registers differ " +
          "from the direct build — max-merge lost information")
    }
  }
}
