package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding merge training — the real iterative BPE
  * algorithm (Sennrich et al. 2016, arXiv:1508.07909), not the fixed
  * chars-per-token heuristic of TextAnalysis.tokenCountRegex.
  *
  * Classic BPE trains on WORD TYPES with corpus frequencies, so the state
  * is one row per (word, position, symbol) — ≪ corpus size (the type/token
  * ratio does the compression: a 100 TB corpus has a few million ascii word
  * types). Per merge round:
  *   1. adjacent-pair counts: lead() over (word, pos) + freq-weighted sum —
  *      one window + one map-side-combining aggregate;
  *   2. argmax pair (count desc, then lexicographic) — a driver-side
  *      `limit(1).collect`, the algorithm's inherent sync point (one scalar
  *      per round, like any Pregel superstep decision);
  *   3. greedy left-to-right merge application, relationally: a run of k
  *      consecutive matching positions merges at odd ranks only (runs >1
  *      exist only when left==right symbol), then surviving rows re-index
  *      by row_number. localCheckpoint cuts the per-round lineage.
  *
  * Everything is integer counts + binary string comparisons, so a SQL
  * engine replays the training bit-for-bit with one unrolled CTE block per
  * round (see Entries5's generated oracle).
  *
  * Returns the merge table: (step, left_sym, right_sym, merged, pair_freq).
  */
object BpeTrainer {

  /** One row per character of each ascii word type: (w, freq, pos, sym). */
  def initialSymbols(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        explode(expr("sequence(1, length(w))")).as("pos"))
      .withColumn("sym", expr("substr(w, pos, 1)"))

  def train(documents: DataFrame, iters: Int): DataFrame = {
    val spark = documents.sparkSession
    var seq = initialSymbols(documents).localCheckpoint()
    val wOrd = Window.partitionBy(col("w")).orderBy(col("pos"))
    val merges = scala.collection.mutable.ArrayBuffer[Row]()

    for (step <- 1 to iters) {
      val withNext = seq.withColumn("nxt", lead(col("sym"), 1).over(wOrd))
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym").asc, col("nxt").asc)
        .limit(1).collect()
      if (best.nonEmpty) {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Row(step.toLong, a, b, a + b, cnt)
        seq = applyMerge(seq, a, b)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("step", LongType, nullable = false),
        StructField("left_sym", StringType, nullable = false),
        StructField("right_sym", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_freq", LongType, nullable = false))))
  }

  /** Greedy left-to-right application of ONE merge (a, b) to the symbol
    * state, as PURE WINDOW arithmetic over one (w, pos) sort — zero joins
    * (the original chosen-positions formulation joined the candidate set
    * back twice per round; at 6 rounds that was 12 extra shuffles of
    * latency on a vocabulary-sized frame):
    * a position matches if (sym, next) = (a, b); within a RUN of
    * consecutive matches (possible only when a == b) greedy pairing keeps
    * the 0th, 2nd, … — i.e. chosen ⇔ the distance to the last non-match
    * position is odd ("aaaa"+(a,a) → pairs at pos 1 and 3). A row is
    * absorbed ⇔ its predecessor was chosen. Surviving rows re-index by
    * row_number on the SAME partitioning (no new exchange). */
  private def applyMerge(seq: DataFrame, a: String, b: String): DataFrame =
    applyMerge(seq, a, b, a + b)

  private def applyMerge(seq: DataFrame, a: String, b: String,
                         merged: String): DataFrame = {
    val wOrd = Window.partitionBy(col("w")).orderBy(col("pos"))
    val cum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    seq
      .withColumn("nxt", lead(col("sym"), 1).over(wOrd))
      .withColumn("mrk", col("sym") === lit(a) && col("nxt") === lit(b))
      // last non-matching position at-or-before this row (the run anchor)
      .withColumn("anchor",
        coalesce(max(when(!col("mrk"), col("pos"))).over(cum), lit(0)))
      .withColumn("chosen",
        col("mrk") && (col("pos") - col("anchor")) % 2 === 1)
      .withColumn("absorbed",
        coalesce(lag(col("chosen"), 1).over(wOrd), lit(false)))
      .filter(!col("absorbed"))
      .select(col("w"), col("freq"), col("pos"),
        when(col("chosen"), lit(merged)).otherwise(col("sym")).as("sym"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("w")).orderBy(col("pos"))))
      .localCheckpoint()
  }

  /** Tokenizer APPLY: encode the corpus's word types with an ordered merge
    * list (the output of [[train]]) — the other half of the BPE loop. Each
    * merge replays the same greedy application used during training, so
    * encoding the training corpus with its own merge table reproduces the
    * training end-state exactly (which is what the generated SQL oracle
    * replays). Output: one row per word type with its final segmentation.
    */
  def encode(documents: DataFrame,
             merges: Seq[(String, String)]): DataFrame = {
    var seq = initialSymbols(documents).localCheckpoint()
    merges.foreach { case (a, b) => seq = applyMerge(seq, a, b) }
    seq.groupBy(col("w"), col("freq"))
      .agg(count(lit(1)).as("n_syms"),
        array_join(transform(array_sort(collect_list(struct(col("pos"),
          col("sym")))), x => x.getField("sym")), "|").as("encoding"))
  }

  /** WordPiece initial state (Schuster & Nakajima 2012; the BERT
    * tokenizer): like [[initialSymbols]] but non-initial characters carry
    * the `##` continuation prefix, so a symbol encodes its word-internal
    * position class and merges never cross a word start. */
  def initialSymbolsWordPiece(documents: DataFrame): DataFrame =
    initialSymbols(documents)
      .withColumn("sym",
        when(col("pos") === 1, col("sym"))
          .otherwise(concat(lit("##"), col("sym"))))

  /** WordPiece merge training: the BPE loop with the selection criterion
    * changed from raw pair frequency to the LIKELIHOOD RATIO
    * score(a,b) = count(ab) / (count(a)·count(b)) over the CURRENT
    * segmentation (the pair whose merge most increases corpus likelihood
    * under a unigram model). Scores are compared exactly on a 1e-18
    * integer grid — ⌊cnt·10^18 / (ca·cb)⌋ in DECIMAL(38,0) — with
    * (cnt DESC, a ASC, b ASC) tie-breaks, so the argmax is a pure
    * function of the data and the DuckDB oracle replays it bit-for-bit
    * (HUGEINT). The merged symbol strips the right side's `##`.
    *
    * Scale shape identical to [[train]]: per-round state is the word-TYPE
    * symbol relation (vocabulary-sized, not corpus-sized); the argmax is
    * a bounded orderBy(1) collect per round — the adjudicated
    * scalar-per-round pattern, never per-row driver work.
    *
    * Returns (step, left_sym, right_sym, merged, pair_freq, left_freq,
    * right_freq, score_q). */
  def trainWordPiece(documents: DataFrame, iters: Int): DataFrame = {
    val spark = documents.sparkSession
    var seq = initialSymbolsWordPiece(documents).localCheckpoint()
    val wOrd = Window.partitionBy(col("w")).orderBy(col("pos"))
    val merges = scala.collection.mutable.ArrayBuffer[Row]()

    for (step <- 1 to iters) {
      val pairs = seq.withColumn("nxt", lead(col("sym"), 1).over(wOrd))
        .filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt"))
        .agg(sum(col("freq")).as("cnt"))
      val symCnt = seq.groupBy(col("sym")).agg(sum(col("freq")).as("c"))
      val best = pairs
        .join(symCnt.select(col("sym"), col("c").as("ca")), Seq("sym"))
        .join(symCnt.select(col("sym").as("nxt"), col("c").as("cb")),
          Seq("nxt"))
        .withColumn("score_q", expr("CAST(CAST(cnt AS DECIMAL(38,0)) * " +
          "1000000000000000000 DIV (CAST(ca AS DECIMAL(38,0)) * cb) " +
          "AS BIGINT)"))
        .orderBy(col("score_q").desc, col("cnt").desc,
          col("sym").asc, col("nxt").asc)
        .limit(1).collect()
      if (best.nonEmpty) {
        val r = best(0)
        val (a, b) = (r.getAs[String]("sym"), r.getAs[String]("nxt"))
        val merged = a + b.stripPrefix("##")
        merges += Row(step.toLong, a, b, merged, r.getAs[Long]("cnt"),
          r.getAs[Long]("ca"), r.getAs[Long]("cb"), r.getAs[Long]("score_q"))
        seq = applyMerge(seq, a, b, merged)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("step", LongType, nullable = false),
        StructField("left_sym", StringType, nullable = false),
        StructField("right_sym", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_freq", LongType, nullable = false),
        StructField("left_freq", LongType, nullable = false),
        StructField("right_freq", LongType, nullable = false),
        StructField("score_q", LongType, nullable = false))))
  }
}
