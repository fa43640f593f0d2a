package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the LLM-training-data
  * pipeline surface (BASELINE.json north-star; not present in the reference,
  * which has no text processing at all).
  *
  * All computations are pure integer/codepoint arithmetic over codegen'd
  * built-in functions (split/transform/aggregate) — no UDFs — so they stay
  * inside whole-stage codegen AND the DuckDB oracle can reproduce results
  * bit-for-bit.
  */
object TextAnalysis {

  /** Token statistics: whitespace tokenization (the BPE-ish regex variant is
    * `tokenCountRegex` below). Integer-derived ratios → engine-exact.
    * One compiled pass via the graft_word_stats expression — the equivalent
    * size/aggregate/array_distinct formulation runs 4 interpreted lambda
    * traversals (CodegenFallback) per row. */
  def tokenStats(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .withColumn("ws", graft.functions.GraftFunctions.wordStats(col("text"), Nil))
      .select(
        col("doc_id"),
        col("ws.n_tokens").as("n_tokens"),
        col("ws.n_unique").as("n_unique_tokens"),
        (col("ws.sum_token_len").cast("double") / col("ws.n_tokens"))
          .as("avg_token_len"))
  }

  /** BPE-ish sub-word token count: split on word boundaries, then count
    * ceil(len/4) sub-word units per word — a standard cheap token-count
    * heuristic (~4 chars/token) used to budget LLM training data. */
  def tokenCountRegex(documents: DataFrame): DataFrame =
    documents
      .withColumn("w", split(col("text"), "[^a-zA-Z0-9]+"))
      .select(
        col("doc_id"),
        aggregate(
          transform(col("w"), x => (length(x) + lit(3)) / lit(4)),
          lit(0L), (acc, x) => acc + x.cast("long")).as("n_subword_tokens"))

  private val Stopwords = Seq("the", "a", "of", "and", "to")

  /** Quality scoring: length, stopword ratio, mean token length, vocabulary
    * diversity — the standard pre-training quality-filter features. Single
    * compiled pass (graft_word_stats), same values as the declarative
    * size/filter/array_distinct formulation. */
  def qualityScore(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .withColumn("ws",
        graft.functions.GraftFunctions.wordStats(col("text"), Stopwords))
      .withColumn("n_tokens", col("ws.n_tokens"))
      .withColumn("n_stop", col("ws.n_stop"))
      .withColumn("n_unique", col("ws.n_unique"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_calc"),
        col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stopword_ratio"),
        (col("n_unique").cast("double") / col("n_tokens")).as("ttr"),
        // composite score: diversity minus stopword penalty, clipped to [0,1]
        least(greatest(
          (col("n_unique").cast("double") / col("n_tokens"))
            - lit(0.5) * (col("n_stop").cast("double") / col("n_tokens")),
          lit(0.0)), lit(1.0)).as("quality_score"))
  }

  /** Language identification via corpus-trained character-trigram majority
    * vote: (1) per trigram, the modal language over the corpus (count desc,
    * lang asc tie-break); (2) per document, majority vote of its distinct
    * trigrams' modal languages. Self-supervised n-gram LID — the dictionary
    * is a broadcast-sized dimension at any corpus scale.
    */
  def langId(documents: DataFrame): DataFrame = {
    // explode(sequence) + substr instead of transform(...)+array_distinct:
    // sequence/substr/explode are codegen'd, while transform lambdas are
    // CodegenFallback (interpreted, one materialized array per row). The
    // per-doc distinct moves into the (cached) aggregate below.
    // trigram encoded as an int (injective for ASCII: c1·2^16 + c2·2^8 + c3)
    // so every downstream shuffle moves longs, not 3-char strings
    val tri = documents
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
      .select(col("doc_id"), col("lang"),
        (ascii(col("text").substr(col("i"), lit(1))) * 65536 +
          ascii(col("text").substr(col("i") + 1, lit(1))) * 256 +
          ascii(col("text").substr(col("i") + 2, lit(1)))).cast("long").as("tg"))
      .distinct()
      // cached: tri (incl. its distinct SHUFFLE) feeds both the dictionary
      // build and the vote join — uncached, the distinct runs twice and
      // doubles the query time (measured 8.3s → 17.9s at sf0.1)
      .cache()
    val dictW = Window.partitionBy(col("tg"))
      .orderBy(col("cnt").desc, col("lang").asc)
    val dict = tri.groupBy(col("tg"), col("lang")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(dictW)).filter(col("rn") === 1)
      .select(col("tg"), col("lang").as("tg_lang"))
    val voteW = Window.partitionBy(col("doc_id"))
      .orderBy(col("votes").desc, col("tg_lang").asc)
    tri.select(col("doc_id"), col("lang"), col("tg"))
      .join(broadcast(dict), Seq("tg"))
      .groupBy(col("doc_id"), col("lang"), col("tg_lang"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(voteW)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("tg_lang").as("guess"),
        when(col("tg_lang") === col("lang"), lit(1)).otherwise(lit(0))
          .cast("int").as("correct"))
  }

  /** Position-weighted modular document fingerprint:
    * fp = Σ_i code(c_i) · ((A·i + B) mod P) mod P — pure int64 arithmetic
    * (bounded: 127 · P · len < 2^63), identical in any engine; the cheap
    * deterministic stand-in for a rolling content hash.
    */
  val FpP = 1000003L
  val FpA = 8191L
  val FpB = 524287L

  /** Declarative formulation (higher-order built-ins). Spark evaluates
    * transform/aggregate lambdas INTERPRETED (CodegenFallback) with one
    * materialized array per row — measured 16× slower than the native
    * expression at sf0.1 — so `fingerprint` routes through the codegen'd
    * AsciiFingerprint; this form is kept (and parity-tested in
    * FunctionsSpec) as the executable spec of the semantics. */
  def fingerprintDeclarative(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      (aggregate(
        transform(sequence(lit(1), length(col("text"))),
          i => ascii(col("text").substr(i, lit(1)))
            * ((lit(FpA) * i + lit(FpB)) % lit(FpP))),
        lit(0L), (acc, x) => acc + x.cast("long")) % lit(FpP)).as("fp"))

  def fingerprint(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents.select(
      col("doc_id"),
      graft.functions.GraftFunctions.asciiFingerprint(col("text")).as("fp"))
  }

  /** One row per (term, doc) of a positional inverted index with posting
    * positions. */
  def termPositions(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "term").withColumnRenamed("pos", "p")

  /** Positional inverted index, flattened one row per (term, doc): the
    * occurrence count, the 0-based positions as a canonical comma-joined
    * string (sorted — deterministic, hashable by any engine), and the
    * term's document frequency.
    *
    * ONE exchange on (term, doc_id) builds the postings;
    * `HashPartitioning(term, doc_id)` satisfies the df window's
    * `ClusteredDistribution(term)`... it does NOT — the df count rides a
    * second term-keyed window exchange, which at index-build scale is the
    * standard second pass (df is also derivable map-side from the posting
    * rows at ~1 row per (term, doc)).
    */
  def postingLists(documents: DataFrame): DataFrame = {
    val perDoc = termPositions(documents)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"),
        array_join(transform(array_sort(collect_list(col("p"))),
          _.cast("string")), ",").as("positions"))
    perDoc.withColumn("n_docs",
      count(lit(1)).over(Window.partitionBy(col("term"))))
  }

  /** Phrase search over the positional index: finds every occurrence of the
    * corpus's single most frequent bigram (count desc, text asc tie-break)
    * by joining the term-position index with itself at distance exactly 1 —
    * the classic positional-index phrase query, fully data-driven (no
    * hard-coded phrase).
    *
    * The 1-row argmax phrase broadcasts to both sides, so the positional
    * self-join degenerates to two pre-filtered (tiny) position lists
    * equi-joined on (doc, pos+1) — never a full index self-join.
    */
  def phraseSearch(documents: DataFrame): DataFrame = {
    // persisted (plan census r9): the positional explode feeds the
    // phrase-frequency rollup AND both sides of the positional self-join
    // — uncached it replans the corpus tokenization 3×
    val toks = termPositions(documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val phrase = toks
      .withColumn("nxt",
        lead(col("term"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("p"))))
      .filter(col("nxt").isNotNull)
      .groupBy(col("term"), col("nxt")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc, col("nxt").asc)
      .limit(1)
      .select(col("term").as("w1"), col("nxt").as("w2"))
    toks.join(broadcast(phrase), col("term") === col("w1"))
      .select(col("doc_id"), col("p"), col("w1"), col("w2"))
      .join(toks.select(col("doc_id"), (col("p") - 1).as("p"),
        col("term").as("t2")), Seq("doc_id", "p"))
      .filter(col("t2") === col("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_matches"), min(col("p")).as("first_pos"))
  }

  /** TOKENIZER FERTILITY profile per language: docs, words (non-empty
    * [a-zA-Z0-9]+ runs), sub-word tokens (the ⌈len/4⌉ budget heuristic of
    * [[tokenCountRegex]]) and chars — the integer numerators/denominators
    * of tokens-per-word (fertility) and chars-per-token, the per-language
    * tokenizer-efficiency report that decides which languages pay a token
    * tax under a given vocabulary. Ratios stay with the consumer (integer
    * discipline).
    *
    * Scale shape: row-local array math in one projection, then a
    * partial-aggregable groupBy on ≤|languages| keys.
    */
  def tokenizerFertility(documents: DataFrame): DataFrame =
    documents
      .withColumn("w", expr(
        """filter(split(text, '[^a-zA-Z0-9]+'), x -> x <> '')"""))
      .select(col("lang"),
        size(col("w")).cast("long").as("nw"),
        expr("aggregate(w, 0L, (acc, x) -> acc + (length(x) + 3) DIV 4)")
          .as("nt"),
        col("n_chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words"),
        sum(col("nt")).as("n_subword_tokens"),
        sum(col("n_chars")).as("n_chars"))

  /** BM25 scored postings for the top-`nTerms` document-frequency terms
    * (Okapi; k1 = 6/5, b = 3/4 — dyadic by choice so the tf-saturation
    * and length-normalization parts clear denominators exactly; see the
    * q443 scaladoc in Entries77 for the derivation). The idf is the
    * always-positive Lucene form ln((2N+2)/(2df+1)) on the established
    * floor(ln·1e4) grid (knife-edge-audited in KnifeEdgeSpec).
    * Returns (term, doc_id, tf, dl, df, idf_q, score_milli) — the
    * rank-ready postings relation q443 and the graft_bm25_postings SQL
    * view both consume. ONE persisted token explode feeds dl, df and tf.
    */
  def bm25Postings(documents: DataFrame, nTerms: Int = 10): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("l_tot"))
    val dfT = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = dfT.crossJoin(broadcast(stats))
      .orderBy(col("df").desc, col("term").asc)
      .limit(nTerms)
      .withColumn("idf_q",
        floor(log((col("n_docs") * 2 + 2).cast("double") /
          (col("df") * 2 + 1).cast("double")) * 1e4).cast("long"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(qterms), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("score_milli", expr(
        "CAST(CAST(idf_q AS DECIMAL(38,0)) * 44 * tf * l_tot * 1000 " +
          "DIV ((CAST(20 AS DECIMAL(38,0)) * tf * l_tot + 6 * l_tot + " +
          "18 * dl * n_docs) * 10000) AS BIGINT)"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"),
        col("idf_q"), col("score_milli"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999 eq. 4.27) with absolute discount D = 3/4, kept EXACT by
    * clearing denominators — every probability is an integer ppm:
    *
    *   P(w2|w1) = (max(c12 − D, 0) + D·N1+(w1·)·Pcont(w2)) / c1
    *   Pcont(w2) = N1+(·w2) / N1+(··)
    *
    * With D = 3/4 the common denominator is 4·c1·N1+(··), so
    *   p_ppm = ⌊10^6 · (max(4·c12 − 3, 0)·Nbb + 3·N1f(w1)·N1r(w2))
    *                 / (4·c1·Nbb)⌋
    * in DECIMAL(38,0) (HUGEINT in the oracle) — no transcendental, no
    * float, no grid-tie risk. An unseen-history bigram (c1 absent) backs
    * off to the continuation distribution alone: p_ppm = ⌊10^6·N1r/Nbb⌋,
    * zero when w2 was never seen as a continuation.
    *
    * Inputs: `trainBigrams` (w1, w2) one row per TOKEN bigram instance;
    * `testBigrams` (grp, w1, w2). Output per grp: n_bigrams, n_oov_w1
    * (unseen history), n_hit (c12 > 0), n_zero_p, sum_p_ppm, avg_p_ppm.
    *
    * Scale shape: the model is three count tables hash-joined against the
    * test bigrams plus a 1-row broadcast for Nbb — no driver state, all
    * joins on (w1[,w2]) keys, partial-aggregable final rollup.
    */
  def kneserNeyScore(trainBigrams: DataFrame,
                     testBigrams: DataFrame): DataFrame = {
    val c2 = trainBigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = c2.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
    val cont = c2.groupBy(col("w2")).agg(count(lit(1)).as("n1r"))
    val nbb = c2.agg(count(lit(1)).as("nbb"))
    testBigrams
      .join(c2, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(nbb))
      .selectExpr("grp", "c1",
        "coalesce(c12, 0L) AS c12x", "coalesce(n1r, 0L) AS n1rx",
        "n1f", "nbb")
      .selectExpr("grp", "c1", "c12x",
        "CASE WHEN c1 IS NOT NULL THEN CAST((" +
          "  CAST(greatest(4 * c12x - 3, 0) AS DECIMAL(38,0)) * nbb +" +
          "  CAST(3 AS DECIMAL(38,0)) * n1f * n1rx) * 1000000 DIV" +
          " (CAST(4 AS DECIMAL(38,0)) * c1 * nbb) AS BIGINT)" +
          " ELSE CAST(CAST(n1rx AS DECIMAL(38,0)) * 1000000 DIV nbb" +
          " AS BIGINT) END AS p_ppm")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c1").isNull, 1L).otherwise(0L)).as("n_oov_w1"),
        sum(when(col("c12x") > 0L, 1L).otherwise(0L)).as("n_hit"),
        sum(when(col("p_ppm") === 0L, 1L).otherwise(0L)).as("n_zero_p"),
        sum(col("p_ppm")).as("sum_p_ppm"))
      .withColumn("avg_p_ppm", expr("sum_p_ppm DIV n_bigrams"))
  }
}
