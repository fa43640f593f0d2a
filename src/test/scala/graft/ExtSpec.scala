package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Dedup / similarity / text / multimodal semantics on hand-built corpora
  * with known answers. */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))

  test("exact dedup groups identical texts and keeps the min doc_id") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val got = Dedup.exact(d).orderBy($"keep_id")
      .select($"keep_id", $"n_copies").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("ngram Jaccard finds a one-word-changed near-dup, not unrelated docs") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w15", "CHANGED")
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val d = docs((1L, base), (2L, nearDup), (3L, other))
    val pairs = Dedup.ngramJaccardPairs(d, 3, 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("minhash LSH recovers the same near-dup pair as exact Jaccard") {
    // trailing-append near-dup (j ≈ 0.98): high enough that 4×4 banding
    // recall is ~1 for any reasonable hash family (LSH is probabilistic in
    // the family; deterministic for our fixed one)
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = base + " APPENDED"
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val d = docs((1L, base), (2L, nearDup), (3L, other))
    val pairs = Dedup.minhashLshPairs(d, 3, 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("identical docs have identical simhash; hamming 0 pair found") {
    val d = docs((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
    val sigs = Dedup.simhash(d).orderBy($"doc_id")
      .select($"simhash").as[Long].collect()
    assert(sigs(0) == sigs(1))
    val pairs = Dedup.simhashPairs(d, 3)
      .select($"d1", $"d2", $"hamming").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq.contains((1L, 2L, 0)))
  }

  test("brute-force top-k: identical vector ranks first with cos ~ 1") {
    graft.functions.GraftFunctions.register(spark)
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1), (3L, Array(-1.0f, 0.1f), 1))
      .toDF("vec_id", "embedding", "label")
    // patch dot-product width: these are 2-dim, so use cosine directly
    val got = Similarity.bruteForceTopK(e, 1, 2).orderBy($"rank")
      .select($"n_id", $"cos").as[(Long, Double)].collect()
    assert(got(0)._1 == 1L && math.abs(got(0)._2 - 1.0) < 1e-12)
    assert(got(1)._1 == 2L) // orthogonal ranks above opposite-direction vec 3
  }

  test("IVF with full probing equals brute force (recall sanity)") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(200).cache()
    val bf = Similarity.bruteForceTopK(emb, 5, 3)
      .select($"q_id", $"rank", $"n_id")
    // centroidEvery=1 → every vector is a centroid; nprobe huge → scan all
    val ivf = Similarity.ivfTopK(emb, 5, 3, 1, 1000)
      .select($"q_id", $"rank", $"n_id".as("n_id2"))
    assert(bf.join(ivf, Seq("q_id", "rank"))
      .filter($"n_id" =!= $"n_id2").count() == 0)
  }

  test("text fingerprint is order-sensitive (permutation changes fp)") {
    val d = docs((1L, "a b"), (2L, "b a"))
    val fps = TextAnalysis.fingerprint(d).select($"fp").as[Long].collect()
    assert(fps(0) != fps(1))
  }

  test("langId learns the planted trigram-language association") {
    // lang distinguishable by characteristic trigrams
    val d = Seq(
      (1L, "aaa aaa aaa", "xx"), (2L, "aaa aaa aab", "xx"),
      (3L, "zzz zzz zzz", "yy"), (4L, "zzz zzz zzy", "yy"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t")).withColumn("n_chars", length($"text").cast("long"))
    val got = TextAnalysis.langId(d).orderBy($"doc_id")
      .select($"correct").as[Int].collect()
    assert(got.toSeq == Seq(1, 1, 1, 1))
  }

  test("multimodal decode stub: checksum matches the text fingerprint family") {
    val d = docs((7L, "hello world"))
    val m = Multimodal.decodeFeatures(spark, d).collect()(0)
    assert(m.n_bytes == 11L)
    assert(m.width == 11 && m.height == 77 && m.channels == 3)
    // ascii text → byte checksum equals the char-fingerprint value
    val fp = TextAnalysis.fingerprint(d).select($"fp").as[Long].collect()(0)
    assert(m.checksum == fp)
  }

  test("quality score bounds and stopword sensitivity") {
    val d = docs((1L, "the the the the"), (2L, "alpha beta gamma delta"))
    val got = TextAnalysis.qualityScore(d).orderBy($"doc_id")
      .select($"stopword_ratio", $"quality_score").as[(Double, Double)].collect()
    assert(got(0)._1 == 1.0 && got(0)._2 == 0.0)  // all-stopword doc floors at 0
    assert(got(1)._1 == 0.0 && got(1)._2 == 1.0)  // diverse doc caps at 1
  }
}
