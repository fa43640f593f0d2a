package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication — exact, n-gram Jaccard, MinHash+LSH, SimHash —
  * the LLM-training-data pipeline surface (BASELINE.json north-star).
  *
  * Determinism-by-construction: fuzzy dedup normally relies on random hash
  * families. Here every "random" hash is a fixed affine family
  * `h_j(x) = (A_j·x + B_j) mod P` over a *rank dictionary* id (dense_rank of
  * the sorted distinct shingle set) — pure integer arithmetic that any engine
  * reproduces bit-for-bit, so even the LSH candidate sets are oracle-checkable.
  * At 100 TB the rank dictionary (a global sort over distinct shingles) would
  * be replaced by a 64-bit content hash (xxhash64) — same pipeline shape, one
  * less shuffle — traded here for cross-engine verifiability.
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

  /** Exact n-gram Jaccard near-dup pairs: |A∩B| via self-join on shingle,
    * |A∪B| = |A|+|B|−|A∩B|. The shingle self-join is the scalable exact
    * formulation (shuffle on shingle value; ubiquitous shingles are the skew
    * axis — at 100 TB, drop top-frequency shingles like stop-ngrams first).
    * Jaccard = int/int → bit-identical across engines. */
  def ngramJaccardPairs(documents: DataFrame, k: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    val sh = shingles(documents, k).cache()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.withColumnRenamed("doc_id", "doc_id2").as("b"), Seq("sh"))
      .filter(col("doc_id") < col("doc_id2"))
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

  /** Deterministic global shingle-id dictionary: dense_rank over the sorted
    * distinct shingle set (1-based). */
  def shingleDict(sh: DataFrame): DataFrame =
    sh.select(col("sh")).distinct()
      .withColumn("sid", dense_rank().over(Window.orderBy(col("sh"))).cast("long"))

  private def minhashWideFromShingles(sh: DataFrame): DataFrame = {
    val withId = sh.join(shingleDict(sh), Seq("sh")).select(col("doc_id"), col("sid"))
    val hashes = (0 until NumHashes).map { j =>
      min((lit(hashA(j)) * col("sid") + lit(hashB(j))) % lit(P)).as(s"h$j")
    }
    withId.groupBy(col("doc_id")).agg(hashes.head, hashes.tail: _*)
  }

  /** MinHash signatures, LONG format: (doc_id, j, minh) for j in 0..15 with
    * minh_j = min over shingles of (A_j·sid + B_j) mod P. */
  def minhashLong(documents: DataFrame, k: Int = 3): DataFrame =
    minhashWideFromShingles(shingles(documents, k))
      .select(col("doc_id"),
        explode(map((0 until NumHashes).flatMap(j =>
          Seq(lit(j), col(s"h$j"))): _*)).as(Seq("j", "minh")))

  /** MinHash signatures, WIDE format (doc_id, h0..h15) — the materialized
    * signature table an incremental dedup service would maintain. */
  def minhashWide(documents: DataFrame, k: Int = 3): DataFrame =
    minhashWideFromShingles(shingles(documents, k))

  /** MinHash-LSH near-dup pairs: band signatures (4 bands × 4 hashes) →
    * bucket self-join per band → distinct candidates → exact-Jaccard verify.
    * Bucket join + verify is the 100 TB path: candidates ≪ all-pairs, and the
    * final filter makes the output exact w.r.t. the candidate set. */
  def minhashLshPairs(documents: DataFrame, k: Int = 3,
                      threshold: Double = 0.5): DataFrame = {
    // one cached shingle pass feeds signatures, counts AND the verify join
    val sh = shingles(documents, k).cache()
    val wide = minhashWideFromShingles(sh)
    def bandSig(b: Int): Column =
      concat_ws(",", (0 until BandSize).map(r => col(s"h${b * BandSize + r}")): _*)
    val bands = (0 until NumHashes / BandSize).map { b =>
      wide.select(col("doc_id"), lit(b).as("band"), bandSig(b).as("sig"))
    }.reduce(_ unionByName _)
    val cands = bands.as("x")
      .join(bands.withColumnRenamed("doc_id", "doc_id2").as("y"), Seq("band", "sig"))
      .filter(col("doc_id") < col("doc_id2"))
      .select(col("doc_id"), col("doc_id2")).distinct()
    // exact-verify ONLY candidate pairs: join candidates to their shingle
    // sets first — computing the full co-shingle self-join here would be the
    // same quadratic blowup LSH exists to avoid
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cands
      .join(sh, Seq("doc_id"))
      .join(sh.select(col("doc_id").as("doc_id2"), col("sh")),
        Seq("doc_id2", "sh"))
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
    var prev: Option[DataFrame] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("doc_id", "b2"),
          col("b") === col("b2"))
        .select(col("a").as("doc_id"), col("cluster_id"))
      val next = labels.unionByName(viaEdges)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("cluster_id"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("cluster_id", "old"),
        Seq("doc_id")).filter(col("cluster_id") =!= col("old")).count()
      prev.foreach(_.unpersist())   // release the superseded iteration
      prev = Some(labels)
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    prev.foreach(_.unpersist())
    // a silent cap would return WRONG cluster ids for components whose
    // diameter exceeds the iteration budget — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"nearDupClusters did not converge in $maxIters iterations " +
        "(similarity-chain diameter exceeds budget); raise maxIters")
    labels
  }

  /** 64-bit SimHash over the word multiset: bit_j = sign of
    * Σ_words count(word) · (2·((A_j·wid + B_j) mod P mod 2) − 1).
    * Deterministic via the word-rank dictionary. Bit 63 contributes −2^63
    * (two's complement) — the sum of distinct signed powers equals the
    * bitwise OR, in any engine with int64 semantics. */
  def simhash(documents: DataFrame): DataFrame = {
    val words = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("wcnt"))
    val dict = words.select(col("w")).distinct()
      .withColumn("wid", dense_rank().over(Window.orderBy(col("w"))).cast("long"))
    val withId = words.join(dict, Seq("w"))
    val bitSums = (0 until 64).map { j =>
      sum(col("wcnt") *
        (((lit(hashA(j)) * col("wid") + lit(hashB(j))) % lit(P) % 2) * 2 - 1))
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
    bands.as("x")
      .join(bands.select(col("doc_id").as("doc_id2"),
        col("simhash").as("simhash2"), col("band"), col("nib")).as("y"),
        Seq("band", "nib"))
      .filter(col("doc_id") < col("doc_id2"))
      .select(col("doc_id"), col("doc_id2"), col("simhash"), col("simhash2"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("simhash").bitwiseXOR(col("simhash2"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_id").as("d1"), col("doc_id2").as("d2"),
        col("hamming").cast("int").as("hamming"))
  }
}
