package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Features, Labels, Snapshots}

/** Property tests (SURVEY.md §5.3): the distributed operators against
  * brute-force O(n²) reimplementations of the reference semantics on random
  * event sets. Generators driven manually (no scalatestplus bridge in the
  * offline cache) with fixed seeds → deterministic. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    samples(gen, 8).foreach(body)

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    samples(g1.flatMap(a => g2.map(b => (a, b))), 8)
      .foreach { case (a, b) => body(a, b) }

  private val eventsGen: Gen[List[(Long, Long, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 4L)
      ts <- Gen.choose(0L, 3L * Features.DayUs)
      cents <- Gen.choose(0L, 10000L)
    } yield (user, ts, cents))
  } yield rows.zipWithIndex.map { case ((u, t, c), i) => (u, i.toLong, t, c) }

  test("windowed sum over [t-w, t] equals brute-force recompute") {
    forAll(eventsGen) { rows =>
      val w = Features.DayUs
      val df = rows.toDF("user_id", "event_id", "ts_us", "cents")
      val got = df.withColumn("s",
        sum($"cents").over(org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts_us").rangeBetween(-w, 0)))
        .select($"event_id", $"s").as[(Long, Long)].collect().toMap
      rows.foreach { case (u, id, t, _) =>
        val expect = rows.filter { case (u2, _, t2, _) =>
          u2 == u && t2 >= t - w && t2 <= t
        }.map(_._4).sum
        assert(got(id) == expect, s"event $id")
      }
    }
  }

  test("churn label equals naive interval scan (strict lower, incl. upper)") {
    forAll(eventsGen) { rows =>
      val h = Features.DayUs
      val df = rows.toDF("user_id", "event_id", "ts_us", "cents")
      val got = Labels.churnLabelsWindow(df, h)
        .select($"event_id", $"churn").as[(Long, Int)].collect().toMap
      rows.foreach { case (u, id, t, _) =>
        val rescued = rows.exists { case (u2, _, t2, _) =>
          u2 == u && t2 > t && t2 <= t + h
        }
        assert(got(id) == (if (rescued) 0 else 1), s"event $id")
      }
    }
  }

  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 25)
    vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "a")
    rows <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 30)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("simhash pairs (banded) equal brute-force hamming filter") {
    forAll(docsGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val sigs = graft.ext.Dedup.simhash(df)
        .as[(Long, Long)].collect().toMap
      val gotSeq = graft.ext.Dedup.simhashPairs(df, 3)
        .select($"d1", $"d2").as[(Long, Long)].collect()
      val got = gotSeq.toSet
      // no duplicate emission: the first-matching-band dedup must yield
      // each pair exactly once (a .toSet-only compare would hide this)
      assert(gotSeq.length == got.size)
      val expect = (for {
        (a, sa) <- sigs; (b, sb) <- sigs
        if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
      } yield (a, b)).toSet
      assert(got == expect)
    }
  }

  test("minhash LSH pairs are a subset of exact Jaccard pairs, same jaccard") {
    forAll(docsGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val exact = graft.ext.Dedup.ngramJaccardPairs(df, 3, 0.5)
        .select($"d1", $"d2", $"jaccard")
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      val lsh = graft.ext.Dedup.minhashLshPairs(df, 3, 0.5)
        .select($"d1", $"d2", $"jaccard")
        .as[(Long, Long, Double)].collect()
      lsh.foreach { case (a, b, j) =>
        assert(exact.get((a, b)).contains(j),
          s"LSH pair ($a,$b) must appear in exact pairs with equal jaccard")
      }
    }
  }

  test("hashSplit bucket is the md5 prefix mod 10 (engine-independent spec)") {
    forAll(docsGen) { rows =>
      val keys = rows.map(_._1)
      val got = graft.ext.TrainPrep.hashSplit(
        rows.toDF("doc_id", "text"), "doc_id")
        .select($"doc_id", $"bucket").as[(Long, Long)].collect().toMap
      keys.foreach { k =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(k.toString.getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.take(12)
        val expect = java.lang.Long.parseLong(hex, 16) % 10
        assert(got(k) == expect, s"key $k")
      }
    }
  }

  test("packSequences: bin = exclusive per-shard running sum div budget, in doc order") {
    forAll(docsGen) { rows =>
      val out = graft.ext.TrainPrep.packSequences(
        rows.toDF("doc_id", "text"), 64L, 4)
        .orderBy($"shard", $"doc_id")
        .select($"shard", $"doc_id", $"n_subword_tokens", $"bin")
        .as[(Long, Long, Long, Long)].collect()
      out.groupBy(_._1).foreach { case (_, rws) =>
        var cum = 0L
        rws.foreach { case (_, _, n, bin) =>
          assert(bin == cum / 64L)
          cum += n
        }
      }
    }
  }

  test("asOf snapshot equals naive filtered max") {
    forAll(eventsGen, Gen.choose(0L, 3L * Features.DayUs)) { (rows, asOf) =>
      val df = rows.toDF("user_id", "event_id", "ts_us", "cents")
      val got = Snapshots.asOf(df, "user_id", "ts_us", "event_id", asOf)
        .select($"user_id", $"event_id").as[(Long, Long)].collect().toMap
      val byUser = rows.filter(_._3 <= asOf).groupBy(_._1)
      assert(got.keySet == byUser.keySet)
      byUser.foreach { case (u, rs) =>
        val expect = rs.maxBy(r => (r._3, r._2))._2 // ts desc, event_id desc
        assert(got(u) == expect, s"user $u")
      }
    }
  }

  private val namesGen: Gen[List[String]] = for {
    n <- Gen.choose(2, 25)
    names <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 8)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)
  } yield names.distinct

  test("fuzzyJoinEd1 equals brute-force levenshtein<=1 on random strings") {
    // the 3-letter alphabet forces dense distance-1 neighborhoods,
    // exercising insert/delete/substitute and shared-variant dedup
    forAll(namesGen) { names =>
      val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "name")
      val got = graft.ext.Curation.fuzzyJoinEd1(df, "id", "name")
        .select($"k1", $"k2").as[(Long, Long)].collect().toSet
      val arr = names.toArray
      val expect = (for {
        i <- arr.indices; j <- arr.indices if i < j
        if levDist(arr(i), arr(j)) <= 1
      } yield (i.toLong, j.toLong)).toSet
      assert(got == expect, s"names=$names")
    }
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("chunking with stride == chunk size partitions the words exactly") {
    val textGen = for {
      n <- Gen.choose(1, 40)
      ws <- Gen.listOfN(n, Gen.oneOf("x", "yy", "zzz"))
    } yield ws.mkString(" ")
    forAll(Gen.listOfN(5, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rebuilt = graft.ext.Curation.chunkDocuments(df, 8, 8)
        .orderBy($"doc_id", $"chunk_idx")
        .groupBy($"doc_id")
        .agg(concat_ws(" ", collect_list($"chunk_text")).as("t"),
          sum($"n_chunk_words").as("nw"))
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(rebuilt(i.toLong) ==
          ((t, t.split(" ").length.toLong)), s"doc $i")
      }
    }
  }

  test("triangle count on a random graph equals brute force") {
    val edgeGen = for {
      n <- Gen.choose(3, 12)
      dens <- Gen.choose(1, 3)
      pairs = for (i <- 0 until n; j <- i + 1 until n) yield (i.toLong, j.toLong)
      kept <- Gen.sequence[List[Option[(Long, Long)]], Option[(Long, Long)]](
        pairs.map(p => Gen.choose(0, 3).map(k => if (k < dens) Some(p) else None)).toList)
    } yield kept.flatten
    forAll(edgeGen) { edges =>
      if (edges.nonEmpty) {
        val df = edges.toDF("d1", "d2")
        val got = graft.ext.Curation.triangles(df)
          .as[(Long, Long, Long)].collect().toSet
        val es = edges.toSet
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val expect = (for {
          a <- nodes; b <- nodes if a < b; c <- nodes if b < c
          if es((a, b)) && es((b, c)) && es((a, c))
        } yield (a, b, c)).toSet
        assert(got == expect)
      }
    }
  }

  test("bitmap codec: serialize/probe/AND/OR agree with Set semantics on " +
    "random id sets") {
    import graft.functions.BitmapCodec
    val idsGen = for {
      n <- Gen.choose(0, 300)
      ids <- Gen.listOfN(n, Gen.choose(0L, 1L << 24))
    } yield ids
    forAll(idsGen, idsGen) { (a, b) =>
      def st(xs: Seq[Long]) = {
        val s: BitmapCodec.State = scala.collection.mutable.LongMap.empty
        xs.foreach(BitmapCodec.set(s, _)); s
      }
      val (sa, sb) = (st(a), st(b))
      val (setA, setB) = (a.toSet, b.toSet)
      assert(BitmapCodec.cardinality(sa) === setA.size.toLong)
      assert(BitmapCodec.andCardinality(sa, sb) ===
        setA.intersect(setB).size.toLong)
      assert(BitmapCodec.cardinality(BitmapCodec.or(st(a), sb)) ===
        setA.union(setB).size.toLong)
      // AND result re-serializes canonically (== direct build of a ∩ b)
      assert(BitmapCodec.serialize(BitmapCodec.and(sa, sb)).sameElements(
        BitmapCodec.serialize(st(setA.intersect(setB).toSeq))))
      val bytes = BitmapCodec.serialize(sa)
      (setA.take(50) ++ b.take(50)).foreach { v =>
        assert(BitmapCodec.containsSerialized(bytes, v) === setA.contains(v))
      }
    }
  }

  test("rendezvous hashing: adding a shard only ever moves keys TO the " +
    "new shard") {
    val keysGen = for {
      n <- Gen.choose(1, 200)
      keys <- Gen.listOfN(n, Gen.choose(0L, 1000000L))
    } yield keys.distinct
    forAll(keysGen) { keys =>
      def score(k: Long, shard: Int): Long = {
        val h = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"$k|$shard".getBytes("UTF-8"))
            .take(6).map("%02x".format(_)).mkString, 16)
        h * 16 + shard
      }
      def assign(k: Long, n: Int): Long = (0 until n).map(score(k, _)).max % 16
      keys.foreach { k =>
        val s8 = assign(k, 8)
        val s9 = assign(k, 9)
        assert(s9 == s8 || s9 == 8L, s"key $k moved $s8 -> $s9 (not new shard)")
      }
    }
  }

  test("withGlobalRank equals a global row_number window for any monotone " +
    "bucketing (r12: the r11 rank-rewrite exactness claim on random data)") {
    import org.apache.spark.sql.functions.{col, expr}
    val gen = for {
      n <- Gen.choose(1, 80)
      bw <- Gen.choose(1L, 20L) // bucket width — ANY monotone bucketing
      vals <- Gen.listOfN(n, Gen.choose(0L, 100L)) // duplicates likely
    } yield (bw, vals.zipWithIndex.map { case (v, i) => (v, i.toLong) })
    forAll(gen) { case (bw, rows) =>
      val df = rows.toDF("v", "id")
      val got = graft.ops.Ranks.withGlobalRank(df,
          expr(s"v DIV $bw"), Seq(col("v"), col("id")), "rn", "n")
        .select($"id", $"rn", $"n").as[(Long, Long, Long)].collect()
      val expect = rows.sortBy(r => (r._1, r._2)).zipWithIndex
        .map { case ((_, id), i) => id -> (i + 1L) }.toMap
      assert(got.length == rows.size)
      got.foreach { case (id, rn, n) =>
        assert(n == rows.size.toLong)
        assert(rn == expect(id), s"id $id: rank $rn, want ${expect(id)}")
      }
    }
  }

  test("ntileFromRank equals the SQL ntile(k) window for random (n, k) — " +
    "including the n < k degenerate tiles") {
    import org.apache.spark.sql.functions.{col, lit, ntile}
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.choose(1, 60)
      k <- Gen.choose(1, 12)
    } yield (n, k)
    forAll(gen) { case (n, k) =>
      val df = (1 to n).map(_.toLong).toDF("rn")
      val got = df.withColumn("t",
          graft.ops.Ranks.ntileFromRank(col("rn"), lit(n.toLong), k))
        .select($"rn", $"t").as[(Long, Long)].collect().toMap
      val win = df.withColumn("t", ntile(k).over(Window.orderBy($"rn")))
        .select($"rn", $"t").as[(Long, Int)].collect().toMap
      (1 to n).foreach { r =>
        assert(got(r.toLong) == win(r.toLong).toLong,
          s"n=$n k=$k rn=$r: formula ${got(r.toLong)} vs window ${win(r.toLong)}")
      }
    }
  }

  test("prefix-doubling suffix ranks equal brute-force suffix sort on " +
    "random low-alphabet strings (worst case for rank ties)") {
    // alphabet {a, b} maximizes seed-rank collisions — every doubling
    // round has real work to do; lengths cross the 8-char seed boundary
    // and several doubling thresholds
    val gen: Gen[List[String]] = Gen.listOfN(6, for {
      len <- Gen.choose(1, 120)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString)
    forAll(gen) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Entries76.suffixRanks(docs).collect()
        .groupBy(_.getAs[Long]("doc_id"))
        .map { case (id, rows) =>
          id -> rows.sortBy(_.getAs[Long]("pos"))
            .map(_.getAs[Long]("r")).toSeq }
      texts.zipWithIndex.foreach { case (t, i) =>
        val rank = t.indices.map(p => t.substring(p) -> p).sorted
          .zipWithIndex.map { case ((_, p), j) => p -> (j + 1L) }.toMap
        assert(got(i.toLong) === t.indices.map(rank),
          s"doc $i ('$t')")
      }
    }
  }
}
