package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication — exact, n-gram Jaccard, MinHash+LSH, SimHash —
  * the LLM-training-data pipeline surface (BASELINE.json north-star).
  *
  * Determinism-by-construction: fuzzy dedup normally relies on random hash
  * families. Here every "random" hash is a fixed affine family
  * `h_j(x) = (A_j·x + B_j) mod P` over a *48-bit content id* — the first 12
  * hex chars of md5(token) parsed as an integer. md5 is bit-identical in
  * every engine (Spark `conv(substr(md5(x),1,12),16,10)` ≡ DuckDB
  * `('0x'||substr(md5(x),1,12))::BIGINT`), so even the LSH candidate sets
  * are oracle-checkable — AND, unlike a rank dictionary (dense_rank over the
  * globally sorted distinct token set), the id needs no distinct, no global
  * sort, and no dictionary join: it is computed inline at explode time.
  * That is the 100 TB shape — per-row arithmetic only, zero extra shuffles.
  * 48 bits keeps `A_j·sid` under 2^63 (ANSI-safe); a same-id collision
  * (p ≈ n²/2^49) would be replayed identically by the oracle.
  */
object Dedup {
  val P = 1000003L
  val NumHashes = 16
  val BandSize = 4 // 4 bands × 4 rows
  def hashA(j: Int): Long = 101L * j + 37L
  def hashB(j: Int): Long = 577L * j + 89L

  /** Exact dedup by content hash: one row per distinct text with the kept
    * (minimum) doc_id and the duplicate count. Plain hash aggregation —
    * one shuffle on the group key, partial aggregation map-side. */
  def exact(documents: DataFrame): DataFrame =
    documents.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word k-shingles, distinct per doc: [w_i..w_{i+k-1}] joined by ' '. */
  def shingles(documents: DataFrame, k: Int = 3): DataFrame =
    documents
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("w")) - (k - 1)),
          i => concat_ws(" ", slice(col("w"), i, lit(k)))))).as("sh"))

  /** (doc_id, sid) pairs: the distinct word k-shingles of each doc projected
    * to their 48-bit content ids — shingle strings never leave the mapper;
    * every downstream shuffle and join key is an 8-byte long. */
  def shingleIds(documents: DataFrame, k: Int = 3): DataFrame =
    shingles(documents, k).select(col("doc_id"), contentId(col("sh")).as("sid"))

  /** Exact n-gram Jaccard near-dup pairs: |A∩B| via self-join on shingle id,
    * |A∪B| = |A|+|B|−|A∩B|. The shingle self-join is the scalable exact
    * formulation (shuffle on shingle id; ubiquitous shingles are the skew
    * axis — at 100 TB, drop top-frequency shingles like stop-ngrams first).
    * Jaccard = int/int → bit-identical across engines. */
  def ngramJaccardPairs(documents: DataFrame, k: Int = 3,
                        threshold: Double = 0.5): DataFrame =
    jaccardFromShingleIds(shingleIds(documents, k).cache(), threshold)

  /** Exact Jaccard pairs from a (doc_id, sid) table; `cands` = optional
    * pre-filter of (doc_id, doc_id2) pairs to verify (the LSH path). */
  private[ext] def jaccardFromShingleIds(sh: DataFrame, threshold: Double,
                                    cands: Option[DataFrame] = None): DataFrame = {
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val left = cands match {
      case Some(c) => c.join(sh, Seq("doc_id"))
      case None => sh.as("a")
    }
    val inter = left
      .join(sh.select(col("doc_id").as("doc_id2"), col("sid")),
        cands match {
          case Some(_) => Seq("doc_id2", "sid")
          case None => Seq("sid")
        })
      .filter(cands match {
        case Some(_) => lit(true)
        case None => col("doc_id") < col("doc_id2")
      })
      .groupBy(col("doc_id"), col("doc_id2")).agg(count(lit(1)).as("ix"))
    inter
      .join(cnt.withColumnRenamed("n", "na"), Seq("doc_id"))
      .join(cnt.withColumnRenamed("n", "nb")
        .withColumnRenamed("doc_id", "doc_id2"), Seq("doc_id2"))
      .withColumn("jaccard",
        col("ix").cast("double") / (col("na") + col("nb") - col("ix")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id").as("d1"), col("doc_id2").as("d2"), col("jaccard"))
  }

  /** Deterministic 48-bit content id: first 12 hex chars of md5, as a long.
    * Cross-engine identical (see object scaladoc) and computed per-row —
    * no dictionary materialization at any scale. */
  def contentId(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  private def minhashWideFromIds(ids: DataFrame): DataFrame = {
    val hashes = (0 until NumHashes).map { j =>
      min((lit(hashA(j)) * col("sid") + lit(hashB(j))) % lit(P)).as(s"h$j")
    }
    ids.groupBy(col("doc_id")).agg(hashes.head, hashes.tail: _*)
  }

  /** MinHash signatures, LONG format: (doc_id, j, minh) for j in 0..15 with
    * minh_j = min over shingles of (A_j·sid + B_j) mod P. */
  def minhashLong(documents: DataFrame, k: Int = 3): DataFrame =
    minhashWideFromIds(shingleIds(documents, k))
      .select(col("doc_id"),
        explode(map((0 until NumHashes).flatMap(j =>
          Seq(lit(j), col(s"h$j"))): _*)).as(Seq("j", "minh")))

  /** MinHash signatures, WIDE format (doc_id, h0..h15) — the materialized
    * signature table an incremental dedup service would maintain. */
  def minhashWide(documents: DataFrame, k: Int = 3): DataFrame =
    minhashWideFromIds(shingleIds(documents, k))

  /** MinHash-LSH near-dup pairs: band signatures (4 bands × 4 hashes) →
    * bucket self-join per band → distinct candidates → exact-Jaccard verify.
    * Bucket join + verify is the 100 TB path: candidates ≪ all-pairs, and the
    * final filter makes the output exact w.r.t. the candidate set. */
  def minhashLshPairs(documents: DataFrame, k: Int = 3,
                      threshold: Double = 0.5): DataFrame = {
    // one cached shingle-id pass feeds signatures, counts AND the verify join
    val sh = shingleIds(documents, k).cache()
    // exact-verify ONLY candidate pairs: join candidates to their shingle
    // sets first — computing the full co-shingle self-join here would be the
    // same quadratic blowup LSH exists to avoid
    jaccardFromShingleIds(sh, threshold, Some(minhashLshCandidates(sh)))
  }

  /** The CANDIDATE stage of [[minhashLshPairs]] alone — distinct banding
    * collisions with no exact verify. Exposed so the recall gate (ext/Eval
    * lshRecall) can measure what the banding finds vs exact ground truth.
    * `sh` is a shingle-id table from [[shingleIds]]. */
  def minhashLshCandidates(sh: DataFrame): DataFrame = {
    val wide = minhashWideFromIds(sh)
    def bandSig(b: Int): Column =
      concat_ws(",", (0 until BandSize).map(r => col(s"h${b * BandSize + r}")): _*)
    val nBands = NumHashes / BandSize
    // each row carries ALL band sigs so pair dedup needs no distinct():
    // a pair sharing k bands is kept only at its FIRST matching band
    // (all earlier bands must differ), a narrow filter instead of a
    // shuffle over the candidate set
    val bands = (0 until nBands).map { b =>
      wide.select(col("doc_id"), lit(b).as("band"), bandSig(b).as("sig"),
        array((0 until nBands).map(bandSig): _*).as("sigs"))
    }.reduce(_ unionByName _)
    val firstMatch = (0 until nBands).map { b =>
      (col("band") === b) && (0 until b)
        .map(bp => col("sigs")(bp) =!= col("sigs2")(bp))
        .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    bands.as("x")
      .join(bands.select(col("doc_id").as("doc_id2"), col("band"),
        col("sig"), col("sigs").as("sigs2")).as("y"), Seq("band", "sig"))
      .filter(col("doc_id") < col("doc_id2"))
      .filter(firstMatch)
      .select(col("doc_id"), col("doc_id2"))
  }

  /** Near-dup CLUSTER formation: connected components over the similarity
    * pair graph via iterative min-label propagation (cluster id = smallest
    * doc_id in the component — the row you keep). Deterministic, converges
    * in O(component diameter) joins; each iteration is one shuffle. This is
    * the step that turns pairwise dedup output into "keep one per cluster"
    * at corpus scale (a bounded-iteration driver loop, NOT a driver-side
    * algorithm — all data stays distributed).
    */
  def nearDupClusters(documents: DataFrame, pairs: DataFrame,
                      maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .unionByName(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .cache()
    var labels = documents.select(col("doc_id"), col("doc_id").as("cluster_id"))
    var converged = false
    var iter = 0
    // labels are monotone non-increasing per key, so Σ cluster_id strictly
    // decreases iff ANY label changed — one aggregate on the cached frame
    // detects convergence, no per-iteration diff join
    var prevSum = Long.MaxValue
    while (!converged && iter < maxIters) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("doc_id", "b2"),
          col("b") === col("b2"))
        .select(col("a").as("doc_id"), col("cluster_id"))
      // localCheckpoint (not cache): labels feed both the edge join and the
      // union each round, so an uncut lineage doubles per iteration —
      // truncating to the materialized RDD keeps the plan O(1) per round
      val next = labels.unionByName(viaEdges)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint()
      val sumRow = next.agg(sum(col("cluster_id"))).collect()(0)
      // sum over ZERO rows is NULL (empty corpus): nothing to propagate
      val curSum = if (sumRow.isNullAt(0)) prevSum else sumRow.getLong(0)
      labels = next
      converged = curSum == prevSum
      prevSum = curSum
      iter += 1
    }
    edges.unpersist()
    // a silent cap would return WRONG cluster ids for components whose
    // diameter exceeds the iteration budget — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"nearDupClusters did not converge in $maxIters iterations " +
        "(similarity-chain diameter exceeds budget); raise maxIters")
    labels
  }

  /** Connected components via alternating small-star / large-star — the
    * 100 TB scale path for cluster formation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14; same algorithm ships in
    * GraphFrames' connectedComponents).
    *
    * `nearDupClusters` (min-label propagation) needs O(diameter) rounds and
    * every round re-aggregates the FULL node set; star contraction converges
    * in O(log n) rounds and each round touches only the shrinking edge set —
    * the right trade at corpus scale, where similarity chains (A~B~C~...)
    * can be long. Both compute the same fixpoint (component label = min
    * doc_id); CcSpec asserts they agree on the fixtures.
    *
    * Each phase is one groupBy (neighborhood min) + one join (re-point
    * edges) — all distributed, nothing driver-side but the 1-row
    * convergence signature. Output: (doc_id, cluster_id), singletons
    * included.
    */
  def ccBigStar(documents: DataFrame, pairs: DataFrame,
                maxIters: Int = 30): DataFrame = {
    // small-star: point every edge downward (u > v), then hook u and all its
    // smaller neighbors to the neighborhood minimum
    def smallStar(e: DataFrame): DataFrame = {
      val down = e.select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      val mins = down.groupBy(col("u")).agg(min(col("v")).as("m"))
      down.join(mins, "u")
        .select(explode(array(
          struct(col("u").as("a"), col("m").as("b")),
          struct(col("v").as("a"), col("m").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    }
    // large-star: for each node, hook every LARGER neighbor to the
    // neighborhood minimum (self included)
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("a"), col("b"))
        .unionByName(e.select(col("b").as("a"), col("a").as("b")))
      val mins = nbrs.groupBy(col("a"))
        .agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("mn"), col("a")).as("m"))
      nbrs.join(mins, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    }
    // localCheckpoint (not cache): each round references the previous edge
    // set FOUR times (both stars read it twice), so an uncut lineage grows
    // 4^rounds plan nodes — checkpointing truncates the plan to the
    // materialized RDD each round (same pattern as FeatureStore.upsertGold)
    var edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .localCheckpoint()
    // convergence = edge-set fixpoint; (count, xor of pair hashes) is an
    // order-independent SET signature in one aggregate (edges are distinct
    // after each phase; xor can't overflow under ANSI, unlike sum)
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var sig = (-1L, -1L)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nextSig = signature(next)
      edges = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"ccBigStar did not converge in $maxIters rounds")
    // fixpoint is a star forest (a → component min); attach singletons
    val labels = edges.groupBy(col("a")).agg(min(col("b")).as("lbl"))
    documents.select(col("doc_id"))
      .join(labels.withColumnRenamed("a", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
  }

  /** 64-bit SimHash over the word multiset: bit_j = sign of
    * Σ_words count(word) · (2·((A_j·wid + B_j) mod P mod 2) − 1), with
    * wid the 48-bit md5-prefix content id (no dictionary, see scaladoc).
    * Bit 63 contributes −2^63 (two's complement) — the sum of distinct
    * signed powers equals the bitwise OR, in any engine with int64
    * semantics. */
  def simhash(documents: DataFrame): DataFrame = {
    // one shuffle: summing the ±1 sign per word OCCURRENCE equals summing
    // wcnt·sign per distinct word (integer math), so no (doc_id, word)
    // pre-aggregation is needed — partial aggregation combines map-side
    val withId = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("wid", contentId(col("w")))
    val bitSums = (0 until 64).map { j =>
      sum((((lit(hashA(j)) * col("wid") + lit(hashB(j))) % lit(P) % 2) * 2 - 1))
        .as(s"s$j")
    }
    withId.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist (< 4): banding
    * the 64 bits into 4 16-bit bands gives EXACT recall by pigeonhole (≤3
    * differing bits can't touch all 4 bands), so the banded join is a
    * lossless pruning of the quadratic all-pairs comparison. */
  def simhashPairs(documents: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "band count (4) guarantees recall only for dist < 4")
    val sig = simhash(documents).cache()
    val bands = (0 until 4).map { b =>
      sig.select(col("doc_id"), col("simhash"), lit(b).as("band"),
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("nib"))
    }.reduce(_ unionByName _)
    // Pair dedup WITHOUT a distinct(): a pair sharing k bands would surface
    // k times, so keep only the row from the pair's FIRST matching band —
    // every earlier band must differ, which the xor of the two full
    // signatures tells us locally. Turns the post-join pipeline into a pure
    // narrow filter (no shuffle over the candidate set, the dominant cost
    // when the corpus is near-dup heavy).
    val xor = col("simhash").bitwiseXOR(col("simhash2"))
    def bandDiffers(b: Int): Column =
      shiftright(xor, b * 16).bitwiseAND(lit(0xffffL)) =!= 0L
    val firstMatch = (0 until 4).map { b =>
      (col("band") === b) && (0 until b).map(bandDiffers)
        .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    bands.as("x")
      .join(bands.select(col("doc_id").as("doc_id2"),
        col("simhash").as("simhash2"), col("band"), col("nib")).as("y"),
        Seq("band", "nib"))
      .filter(col("doc_id") < col("doc_id2"))
      .withColumn("hamming", bit_count(xor))
      .filter(col("hamming") <= maxDist && firstMatch)
      .select(col("doc_id").as("d1"), col("doc_id2").as("d2"),
        col("hamming").cast("int").as("hamming"))
  }

  /** Prefix-filtered set-similarity self-join (the SSJoin/PPJoin pipeline
    * of Chaudhuri/Xiao et al.): all doc pairs whose `k`-gram SHINGLE-set
    * Jaccard is ≥ num/den, exactly.
    *
    * Three filters compose, each integer-exact and recall-lossless:
    * - PREFIX (pigeonhole): sort each doc's shingles by global rarity
    *   (df asc, cid asc — one total order both lists share) and join only
    *   the first `sz − ceil(t·sz) + 1`; J ≥ t forces a common shingle
    *   inside both prefixes.
    * - LENGTH: J ≥ t forces `t·sb ≤ sa` — size-incompatible pairs never
    *   leave the join (`sa·num ≤ sb·den` both ways).
    * - POSITIONAL (PPJoin): a match at prefix positions (pa, pb) bounds
    *   the whole intersection by `min(pa,pb) + min(sa−pa, sb−pb)`
    *   (common shingles are split by the matched one in BOTH sorted
    *   lists); pairs whose bound can't reach `t/(1+t)·(sa+sb)` die at
    *   generation, cross-multiplied as
    *   `bound·(num+den) ≥ num·(sa+sb)`.
    * Survivors verify with an exact intersection count; the oracle is the
    * independent UNFILTERED formulation — the hash-match proves the
    * cascade loses nothing.
    *
    * Shingles, not words, deliberately: the fixture corpus has a ~31-word
    * vocabulary, so every word is in ~3/4 of all docs and a word-level
    * prefix filter degenerates (measured 22M candidates / 135 s at sf0.1);
    * 16-char shingles have a discriminative df distribution and the same
    * cascade yields candidates ≈ true pairs (258 vs 256) in ~2 s. Shingles
    * travel as 48-bit md5-prefix content ids (engine convention, oracle-
    * reproducible); df attach is a vocabulary-sized join AQE broadcasts.
    */
  def prefixJaccardPairs(documents: DataFrame, k: Int, num: Int,
                         den: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents
      .filter(length(col("text")) >= k)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), length(col("text")) - k)).as("p0"))
      .select(col("doc_id"),
        contentId(col("text").substr(col("p0") + 1, lit(k))).as("cid"))
      .distinct()
      // five consumers (sizes, df census, prefix, both verify sides):
      // uncut, the explode+md5+distinct subtree would plan five times.
      // localCheckpoint, NOT persist — measured both ways in r13: the
      // five consumers hit this relation hard, and the columnar IMR's
      // build + per-consumer decompress made the query 6.6 s steady vs
      // 3.5 s with the checkpointed raw-row RDD (sf0.1, isolated).
      .localCheckpoint()
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val dfv = toks.groupBy(col("cid")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("cid").asc)
    val prefix = toks.join(dfv, Seq("cid"))
      .join(sizes, Seq("doc_id"))
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <=
        col("sz") - expr(s"($num * sz + ${den - 1}) DIV $den") + 1)
      .select(col("cid"), col("doc_id"), col("pos"), col("sz"))
    val a = prefix.select(col("cid"), col("doc_id").as("d1"),
      col("pos").as("pa"), col("sz").as("sa"))
    val b = prefix.select(col("cid"), col("doc_id").as("d2"),
      col("pos").as("pb"), col("sz").as("sb"))
    val cand = a.join(b, Seq("cid"))
      .filter(col("d1") < col("d2") &&
        col("sa") * num <= col("sb") * den &&
        col("sb") * num <= col("sa") * den &&
        (least(col("pa"), col("pb")) +
          least(col("sa") - col("pa"), col("sb") - col("pb"))) *
          (num + den) >= (col("sa") + col("sb")) * num)
      .select(col("d1"), col("d2"))
      .distinct()
    val inter = cand
      .join(toks.select(col("doc_id").as("d1"), col("cid")), Seq("d1"))
      .join(toks.select(col("doc_id").as("d2"), col("cid")), Seq("d2", "cid"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("ix"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sa")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sb")), Seq("d2"))
      .filter(col("ix") * den >= (col("sa") + col("sb") - col("ix")) * num)
      .select(col("d1"), col("d2"), col("ix"),
        (col("sa") + col("sb") - col("ix")).as("un"))
  }

  /** Sorted-neighborhood record linkage: the THIRD candidate-generation
    * strategy in the dedup family (vs MinHash-LSH banding q23 and SSJoin
    * prefix filtering q122). Records sort by a key inside coarse blocks;
    * only rows within `w` positions of each other in that order become
    * candidates; an exact similarity verify (codegen'd Jaro-Winkler on the
    * 40-char prefix) filters them.
    *
    * Scale shape: blocks partition the sort (Window.partitionBy — no global
    * order, no single-partition sweep); the candidate generation is `w`
    * lead() columns over one exchange+sort, NOT a self-join — each row
    * emits ≤ w candidates regardless of corpus size. The classic trade vs
    * LSH: guaranteed candidate count and locality, at the cost of recall
    * across block boundaries.
    */
  def sortedNeighborhoodPairs(documents: DataFrame, w: Int,
                              thr: Double): DataFrame = {
    val base = documents.select(col("doc_id"),
      substring(col("text"), 1, 40).as("t40"),
      split(col("text"), " ").getItem(0).as("blk"))
    val ord = Window.partitionBy(col("blk"))
      .orderBy(col("t40").asc, col("doc_id").asc)
    val withLeads = base.select(
      Seq(col("blk"), col("doc_id"), col("t40")) ++
        (1 to w).flatMap(o => Seq(
          lead(col("doc_id"), o).over(ord).as(s"d2_$o"),
          lead(col("t40"), o).over(ord).as(s"t2_$o"))): _*)
    val pairs = (1 to w).map { o =>
      withLeads.filter(col(s"d2_$o").isNotNull)
        .select(col("blk"), col("doc_id").as("d1"),
          col(s"d2_$o").as("d2"),
          graft.functions.GraftFunctions
            .jaroWinkler(col("t40"), col(s"t2_$o")).as("jw"))
    }.reduce(_ unionByName _)
    pairs.filter(col("jw") >= thr)
  }

  /** EXACT DUPLICATED-SUBSTRING SPANS (the Lee et al. 2022 "Deduplicating
    * Training Data" exact-substring primitive, re-expressed relationally):
    * every maximal character span of a document that also occurs verbatim
    * in at least one OTHER document, found as overlapping `k`-gram
    * collisions merged per doc with the interval-coalescing sweep
    * (ops/Relational.coalesceIntervals — the q116 operator, reused as a
    * library call). Two docs sharing a run of length L ≥ k produce L−k+1
    * colliding grams whose [pos, pos+k) intervals chain into ONE span —
    * exactly the maximal duplicated region.
    *
    * Scale shape: grams explode to ~n_chars rows per doc; the collision
    * test is one partial-aggregated exchange on the gram (count distinct
    * docs ≥ 2 via a two-level agg, no distinct-set buffering), then the
    * span merge is one exchange on doc_id. A suffix array is the
    * single-node formulation; gram-collision + coalesce is the shardable
    * one. Grams travel as `xxhash64` (8 B on the wire instead of k chars,
    * collisions vanishing at 2^-64); the oracle groups the raw text
    * because DuckDB lacks xxhash64 — semantics identical short of a
    * same-corpus 64-bit collision.
    */
  def dupSpans(documents: DataFrame, k: Int): DataFrame = {
    val grams = documents
      // guard: Spark's sequence(0, n) runs DESCENDING for n < 0 (it would
      // emit bogus negative positions for docs shorter than k; DuckDB's
      // range() is empty there)
      .filter(length(col("text")) >= k)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), length(col("text")) - k)).as("pos"))
      // gram text leaves the plan IMMEDIATELY as an 8 B xxhash64: every
      // exchange and aggregate below keys on the hash, not the k chars
      // (the 2^-64 collision would have to pair two grams inside the same
      // corpus to flip a span boundary). Materialized once because both
      // the collision census and the position pass consume it — uncut,
      // the explode+substring subtree plans twice. PERSIST since r13
      // (was localCheckpoint): the subtree is flat, and the lazy persist
      // lets a steady-state session reuse the gram table via the
      // CacheManager instead of re-exploding eagerly per call.
      .select(col("doc_id"), col("pos"),
        xxhash64(substring_index_safe(col("text"), col("pos"), k)).as("gh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // grams present in ≥ 2 DISTINCT docs: two-level aggregate (gh, doc)
    // → gh keeps the shuffle partial-aggregable — no collect_set
    val dupGrams = grams
      .groupBy(col("gh"), col("doc_id")).agg(count(lit(1)).as("__c"))
      .groupBy(col("gh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("gh"))
    val hits = grams.join(dupGrams, Seq("gh"), "left_semi")
      .select(col("doc_id"), col("pos").cast("long").as("span_start"),
        (col("pos") + k).cast("long").as("span_end"))
    graft.ops.Relational
      .coalesceIntervals(hits, "doc_id", "span_start", "span_end",
        "span_start")
      .withColumnRenamed("interval_start", "span_start")
      .withColumnRenamed("interval_end", "span_end")
      .withColumnRenamed("n_rows", "n_grams")
  }

  // substring() needs a column start in Spark via expr; 1-based
  private def substring_index_safe(text: Column, pos0: Column,
                                   k: Int): Column =
    text.substr(pos0 + 1, lit(k))

  /** DuckDB mirror of [[dupSpans]]. */
  def dupSpansSql(k: Int): String =
    s"""WITH grams AS (
       |  SELECT doc_id, i AS pos, substr(text, i + 1, $k) AS gram
       |  FROM documents, unnest(range(0, length(text) - $k + 1)) t(i)),
       |dup AS (
       |  SELECT gram FROM (
       |    SELECT gram, doc_id FROM grams GROUP BY 1, 2)
       |  GROUP BY gram HAVING count(*) >= 2),
       |hits AS (
       |  SELECT g.doc_id, CAST(g.pos AS BIGINT) AS s,
       |    CAST(g.pos + $k AS BIGINT) AS e
       |  FROM grams g JOIN dup USING (gram)),
       |marked AS (
       |  SELECT doc_id, s, e,
       |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      THEN 1 ELSE 0 END AS new_grp
       |  FROM hits),
       |grp AS (
       |  SELECT doc_id, s, e,
       |    sum(new_grp) OVER (PARTITION BY doc_id ORDER BY s, e
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |  FROM marked)
       |SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
       |  CAST(count(*) AS BIGINT) AS n_grams
       |FROM grp GROUP BY doc_id, g""".stripMargin

  /** WINNOWING fingerprint selection (Schleimer–Wilkerson–Aiken, the MOSS
    * algorithm): normalize to [a-z0-9], hash every character k-gram
    * (48-bit md5 prefix — the engine's cross-engine content id), then keep
    * the MINIMUM hash of each sliding w-window of consecutive gram
    * positions. Guarantees: any shared substring of length ≥ k+w−1
    * contributes at least one shared fingerprint, and the selected set is
    * a ~2/(w+1) density sample — the bounded-size sketch that makes
    * corpus-scale near-dup detection storable. Fingerprints are kept as a
    * VALUE set (position ties don't affect it), summarized per doc as
    * (n_grams, n_fingerprints, fp_min, fp_sum) for exact engine parity.
    *
    * Scale shape: everything is row-local array math inside one projection
    * (no explode, no shuffle) until the final per-doc summary, which is
    * already one row per doc. Fingerprint sums stay < 2^63 (48-bit values,
    * docs ≪ 2^15 grams).
    */
  def winnowingFingerprints(documents: DataFrame, k: Int = 8,
                            w: Int = 4): DataFrame =
    documents
      .withColumn("t", regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
      .filter(length(col("t")) >= k + w - 1)
      .withColumn("hs", expr(
        s"""transform(sequence(1, length(t) - ${k - 1}),
           |  i -> CAST(conv(substr(md5(substring(t, i, $k)), 1, 12), 16, 10)
           |       AS BIGINT))""".stripMargin))
      .withColumn("fps", expr(
        s"""array_distinct(transform(sequence(1, size(hs) - ${w - 1}),
           |  j -> array_min(slice(hs, j, $w))))""".stripMargin))
      .select(col("doc_id"),
        size(col("hs")).cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        array_min(col("fps")).as("fp_min"),
        expr("aggregate(fps, 0L, (acc, x) -> acc + x)").as("fp_sum"))
}
