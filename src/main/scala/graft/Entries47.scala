package graft

import graft.ExtEntries.Q
import graft.ext.{Curation, Dedup, Similarity, TextAnalysis}

/** Round-7 batch 26: winnowing fingerprints, graded contamination census,
  * sign-signature embedding drift, tokenizer fertility.
  */
object Entries47 {

  val all: Seq[Q] = Seq(

    // WINNOWING (MOSS) fingerprint selection: per-doc minimum-hash-per-
    // window k-gram sampling with the ≥(k+w−1) shared-substring guarantee;
    // value-set summary (count/min/sum) is ORDER-FREE so the oracle
    // replays the identical integer pipeline. k=8 chars, w=4.
    Q("q281_winnowing",
      (s, d) => Dedup.winnowingFingerprints(Tables.documents(s, d), 8, 4),
      Some("""WITH n AS (
             |  SELECT doc_id,
             |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS t
             |  FROM documents),
             |h AS (
             |  SELECT doc_id,
             |    list_transform(range(1, len(t) - 6),
             |      i -> ('0x' || substr(md5(substr(t, i, 8)), 1, 12))::BIGINT)
             |      AS hs
             |  FROM n WHERE len(t) >= 11),
             |f AS (
             |  SELECT doc_id, hs,
             |    list_distinct(list_transform(range(1, len(hs) - 2),
             |      j -> list_min(hs[j:j+3]))) AS fps
             |  FROM h)
             |SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
             |  CAST(len(fps) AS BIGINT) AS n_fingerprints,
             |  CAST(list_min(fps) AS BIGINT) AS fp_min,
             |  CAST(list_sum(fps) AS BIGINT) AS fp_sum
             |FROM f""".stripMargin)),

    // GRADED contamination census: every corpus doc with its distinct
    // 3-shingle count, eval-overlap hits, and integer overlap decile —
    // the release-report complement of q101's binary gate (same eval
    // slice: doc_id % 97 == 0).
    Q("q282_contamination_census",
      (s, d) => Curation.contaminationGraded(Tables.documents(s, d), 3, 97),
      Some("""WITH shd AS (
             |  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w
             |        FROM documents) d,
             |       (SELECT unnest(range(1, 1000)) AS i) t
             |  WHERE len(w) >= 3 AND i <= len(w) - 2),
             |shid AS (
             |  SELECT doc_id, ('0x' || substr(md5(sh), 1, 12))::BIGINT AS sid
             |  FROM shd),
             |evalg AS (SELECT DISTINCT sid FROM shid WHERE doc_id % 97 = 0)
             |SELECT s.doc_id, count(*) AS n_shingles,
             |  CAST(sum(CASE WHEN e.sid IS NULL THEN 0 ELSE 1 END)
             |    AS BIGINT) AS n_eval_hits,
             |  CAST(sum(CASE WHEN e.sid IS NULL THEN 0 ELSE 1 END)
             |    AS BIGINT) * 10 // count(*) AS overlap_decile
             |FROM shid s LEFT JOIN evalg e ON s.sid = e.sid
             |WHERE s.doc_id % 97 <> 0
             |GROUP BY s.doc_id""".stripMargin)),

    // SIGN-SIGNATURE embedding drift census: 6-bit axis-sign buckets,
    // even/odd vec_id halves as corpus v1/v2, exact cross-multiplied
    // per-bucket imbalance |n1·T2 − n2·T1| (zero division).
    Q("q283_sign_drift",
      (s, d) => Similarity.signDriftCensus(Tables.embeddings(s, d), 6),
      Some("""WITH b AS (
             |  SELECT vec_id % 2 AS half,
             |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
             |    + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
             |    + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
             |    + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
             |    + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
             |    + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS bucket
             |  FROM embeddings),
             |c AS (
             |  SELECT bucket,
             |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_v1,
             |    CAST(sum(CASE WHEN half <> 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_v2
             |  FROM b GROUP BY 1),
             |t AS (SELECT CAST(sum(n_v1) AS BIGINT) AS t1,
             |             CAST(sum(n_v2) AS BIGINT) AS t2 FROM c)
             |SELECT CAST(bucket AS BIGINT) AS bucket, n_v1, n_v2,
             |  CAST(abs(n_v1 * t2 - n_v2 * t1) AS BIGINT) AS imbalance
             |FROM c, t""".stripMargin)),

    // TOKENIZER FERTILITY per language: integer numerators/denominators of
    // tokens-per-word and chars-per-token under the ⌈len/4⌉ sub-word
    // budget heuristic — the language-tax report for a vocab decision.
    Q("q284_tokenizer_fertility",
      (s, d) => TextAnalysis.tokenizerFertility(Tables.documents(s, d)),
      Some("""WITH d AS (
             |  SELECT lang, n_chars,
             |    list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'),
             |      x -> x <> '') AS w
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(len(w)) AS BIGINT) AS n_words,
             |  CAST(sum(coalesce(list_sum(
             |    list_transform(w, x -> (length(x) + 3) // 4)), 0))
             |    AS BIGINT) AS n_subword_tokens,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars
             |FROM d GROUP BY 1""".stripMargin)))
}
