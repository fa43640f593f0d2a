package graft

/** Round-12 continuation batch 8 pins: pairwise log-BLEU (q454),
  * temperature-2 source mixing (q455), modularity report (q456). */
class Batch80Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q454

  test("q454: log-BLEU pairs — clips bounded by both sides' gram totals, " +
    "bp/precision terms non-positive, score reassembles from its parts, " +
    "zero flag consistent") {
    val out = q("q454_bleu_pairs").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (cLen, rLen) = (r.getAs[Long]("c_len"), r.getAs[Long]("r_len"))
      val clips = (1 to 4).map(n => r.getAs[Long](s"clip$n"))
      val ps = (1 to 4).map(n => r.getAs[Long](s"p${n}_q"))
      val bp = r.getAs[Long]("bp_q")
      (1 to 4).foreach { n =>
        val bound = math.max(0L, math.min(cLen, rLen) - n + 1)
        assert(clips(n - 1) >= 0L && clips(n - 1) <= bound,
          s"clip$n=${clips(n - 1)} exceeds min-side gram total $bound")
      }
      assert(bp <= 0L)
      assert((bp === 0L) === (cLen >= rLen),
        "brevity penalty fires exactly when the candidate is shorter")
      val zero = r.getAs[Long]("zero_ngram")
      assert((zero === 1L) === clips.contains(0L))
      if (zero === 0L) {
        ps.foreach(p => assert(p <= 0L && p > -99999999L,
          "modified precision ≤ 1 ⇒ grid log ≤ 0, and no sentinel leaks"))
        assert(r.getAs[Long]("bleu_q4") === 4 * bp + ps.sum,
          "score must reassemble from its floored parts")
      } else {
        assert(r.getAs[Long]("bleu_q4") === -99999999L)
        (1 to 4).foreach { n =>
          if (clips(n - 1) === 0L) assert(ps(n - 1) === -99999999L)
        }
      }
    }
  }

  test("q454: BLEU arithmetic identities — a perfect self-match scores 0, " +
    "and the rational brevity penalty reproduces ceil((r-c)/c·1e4)") {
    // p_n = 1 for all n and c = r ⇒ every grid term is exactly 0
    assert(4 * 0L + Seq(0L, 0L, 0L, 0L).sum === 0L)
    // bp: c=80, r=100 → 1 − r/c = −0.25 → grid −2500 exactly
    val (c, rr) = (80L, 100L)
    val bp = -(((rr - c) * 10000 + c - 1) / c)
    assert(bp === -2500L)
    // non-divisible case rounds TOWARD −∞ (ceil of the positive ratio):
    // c=3, r=4 → −(1/3)·1e4 = −3333.33… → −3334
    val bp2 = -(((4L - 3L) * 10000 + 3L - 1) / 3L)
    assert(bp2 === -3334L)
  }

  // ---------------------------------------------------------------- q455

  test("q455: temperature mix — quotas sum exactly to the budget, the " +
    "integer sqrt is exact, and the largest-remainder top-up is 0/1") {
    val out = q("q455_temperature_mix").collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("quota")).sum === 1000000L,
      "Hamilton allocation must conserve the budget exactly")
    out.foreach { r =>
      val x = BigInt(r.getAs[Long]("chars")) * 1000000
      val s = BigInt(r.getAs[Long]("s"))
      assert(s * s <= x && (s + 1) * (s + 1) > x,
        s"s=${r.getAs[Long]("s")} is not the exact isqrt of $x")
      assert(Set(0L, 1L).contains(r.getAs[Long]("extra")))
      assert(r.getAs[Long]("quota") ===
        r.getAs[Long]("base") + r.getAs[Long]("extra"))
      assert(r.getAs[Long]("rate_ppm") >= 0L)
    }
    // T=2 flattens: the max/min quota ratio must not exceed the max/min
    // CHAR ratio (sqrt compresses spread) — the property the rule exists for
    val chars = out.map(_.getAs[Long]("chars").toDouble)
    val quotas = out.map(_.getAs[Long]("quota").toDouble)
    assert(quotas.max / quotas.min <= chars.max / chars.min + 1e-9,
      "temperature sampling must compress the source spread")
  }

  // ---------------------------------------------------------------- q456

  test("q456: modularity report — degree masses sum to 2m, intra edges " +
    "≤ m, contributions reassemble, and |Q| ≤ 1") {
    val out = q("q456_modularity_report").collect()
    assert(out.nonEmpty)
    val m = out.head.getAs[Long]("m")
    assert(m > 0L)
    assert(out.map(_.getAs[Long]("d_c")).sum === 2 * m,
      "Σ community degree mass must equal 2m (handshake lemma)")
    assert(out.map(_.getAs[Long]("e_intra")).sum <= m)
    out.foreach { r =>
      assert(r.getAs[Long]("contrib_num") ===
        4 * m * r.getAs[Long]("e_intra") -
          r.getAs[Long]("d_c") * r.getAs[Long]("d_c"))
    }
    val qNum = out.map(_.getAs[Long]("contrib_num")).sum
    assert(math.abs(qNum) <= 4 * m * m,
      "modularity must lie in [−1, 1]")
  }

  test("q456: modularity arithmetic on a hand graph — two triangles " +
    "joined by one bridge, communities = the triangles") {
    // m = 7 edges; each triangle community: e_c = 3, d_c = 7 (bridge
    // endpoint has degree 3) → contrib = 4·7·3 − 49 = 35 each;
    // Q = 70/(4·49) = 0.357… the textbook value for this graph
    val m = 7L
    val contrib = 4 * m * 3L - 49L
    assert(contrib === 35L)
    assert((2 * contrib).toDouble / (4 * m * m) > 0.35)
  }
}
