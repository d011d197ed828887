package graft

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (3L, "completely different content with unique words here"),
    (4L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
    (5L, "spark engines process distributed data at scale")
  ).toDF("id", "text")

  test("exact duplicates via content hash") {
    val dups = Dedup.exactDuplicates(docs, "id", "text").collect()
    assert(dups.length === 1)
    assert(dups(0).getAs[Seq[Long]]("ids") === Seq(1L, 4L))
  }

  test("shingles produce n-grams, short texts collapse to one") {
    val r = docs.select(Dedup.shingles(col("text"), 3).as("sh")).where(col("text").contains("cat"))
      .head().getSeq[String](0)
    assert(r.head === "the quick brown")
    assert(r.length === 7) // 9 words -> 7 trigrams
    val short = Seq((1L, "one two")).toDF("id", "text")
      .select(Dedup.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(short === Seq("one two"))
  }

  test("minhash LSH finds the near-duplicate pair and the exact pair") {
    val pairs = Dedup.nearDuplicates(docs, "id", "text", numShingles = 2,
      bands = 8, rowsPerBand = 2, threshold = 0.5).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((1L, 4L))) // exact dup always collides
    assert(keys.contains((1L, 2L)) || keys.contains((2L, 4L))) // near-dup
    assert(!keys.exists { case (a, b) => a == 3L || b == 3L }) // unrelated doc never paired
    pairs.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
  }

  test("maxBucket drops degenerate LSH buckets but keeps ordinary near-dups") {
    // 30 copies of the same boilerplate + one ordinary near-dup pair: with a
    // bucket cap below 30 the boilerplate mass produces NO candidate pairs
    // while the ordinary pair survives
    val boiler = (100L until 130L).map(i => (i, "exactly the same boilerplate text repeated across documents"))
    val docs2 = (boiler ++ Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"))).toDF("id", "text")
    val capped = Dedup.nearDuplicates(docs2, "id", "text", numShingles = 2,
      bands = 8, rowsPerBand = 2, threshold = 0.5, maxBucket = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)))
    assert(!capped.exists { case (a, b) => a >= 100L || b >= 100L })
    // uncapped finds the full quadratic boilerplate cluster
    val uncapped = Dedup.nearDuplicates(docs2, "id", "text", numShingles = 2,
      bands = 8, rowsPerBand = 2, threshold = 0.5).count()
    assert(uncapped >= 30L * 29 / 2)
  }

  test("expressible family: executor expressions == driver reference pipelines") {
    import graft.functions.ExpressibleHash
    val rows = docs.select(col("id"),
        split(lower(col("text")), "\\s+").as("ws"),
        Dedup.minhashBands(col("text"), 2, 2, 8).as("bh"),
        Dedup.minhashSignatureX(col("text"), 2, 4).as("sig"),
        Dedup.simhash32(col("text")).as("sh")).collect()
    rows.foreach { r =>
      val ws = r.getSeq[String](1)
      assert(r.getSeq[Long](2) === ExpressibleHash.bandHashes(ws, 2, 2, 8).toSeq)
      assert(r.getSeq[Long](3) === ExpressibleHash.signature(ws, 2, 4).toSeq)
      assert(r.getLong(4) === ExpressibleHash.simhash32(ws))
    }
    // family sanity: identical texts agree on every band, near-dups on some
    val bh = rows.map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(bh(1L) === bh(4L))
    assert(bh(1L).zip(bh(2L)).exists { case (a, b) => a == b })
    assert(!bh(1L).zip(bh(3L)).exists { case (a, b) => a == b })
  }

  test("legacy xxhash64 minhash signature: deterministic, k members, dup-equal") {
    val sigs = docs.select(col("id"), Dedup.minhashSignature(col("text"), 2, 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.values.forall(_.length === 16))
    assert(sigs(1L) === sigs(4L)) // exact dup -> identical signature
    assert(sigs(1L) !== sigs(3L))
  }

  test("simhash: identical texts equal, near-dups close in hamming, distinct far") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val m = docs.select(col("id"), Dedup.simhash(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(4L))
    assert(hamming(m(1L), m(2L)) < hamming(m(1L), m(3L)))
  }

  test("embedding near-duplicates via LSH sign buckets") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.1)),
      (2L, Seq(0.99, 0.01, 0.0, 0.1)),   // near-dup of 1
      (3L, Seq(-1.0, 0.5, 0.2, -0.3))
    ).toDF("id", "vec")
    val pairs = Dedup.embeddingNearDuplicates(vecs, "id", "vec", planes = 4, minCosine = 0.99)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.ops.Relational

  private def quotes = Seq( // (key, ts, px)
    ("A", 10L, 100L), ("A", 20L, 110L), ("A", 30L, 120L),
    ("B", 15L, 500L)
  ).toDF("sym", "qts", "px")
  private def trades = Seq( // (key, ts, qty)
    ("A", 5L, 1L),   // before any quote -> NULL
    ("A", 20L, 2L),  // same-instant quote IS visible (inclusive <=)
    ("A", 25L, 3L),  // latest quote at 20
    ("A", 99L, 4L),  // latest quote at 30
    ("B", 14L, 5L),  // before B's only quote -> NULL
    ("C", 50L, 6L)   // key with no quotes at all -> NULL
  ).toDF("sym", "tts", "qty")

  test("asofJoin carries the latest right value at-or-before each left row") {
    val out = Relational.asofJoin(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
    val got = out.select("sym", "tts", "qty", "asof_px").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got === Set(
      ("A", 5L, 1L, -1L), ("A", 20L, 2L, 110L), ("A", 25L, 3L, 110L),
      ("A", 99L, 4L, 120L), ("B", 14L, 5L, -1L), ("C", 50L, 6L, -1L)))
    // every left row survives exactly once (left-outer semantics)
    assert(out.count() === 6)
  }

  test("asofJoin plan is union + ONE window shuffle — no nested-loop join") {
    val out = Relational.asofJoin(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("asofJoin rejects a left input that already has the output column") {
    val clashing = trades.withColumn("asof_px", lit(0L))
    val e = intercept[IllegalArgumentException] {
      Relational.asofJoin(clashing, quotes, Seq("sym"), "tts", "qts", Seq("px"))
    }
    assert(e.getMessage.contains("asof_px"))
  }

  test("asofJoin rejects mismatched timestamp types instead of silently coercing") {
    // ADVICE r05: a long-vs-timestamp mismatch used to coerce (long -> epoch
    // seconds) and change the output column's type; it must fail loudly
    val tsQuotes = quotes.withColumn("qts", timestamp_seconds(col("qts")))
    val e = intercept[IllegalArgumentException] {
      Relational.asofJoin(trades, tsQuotes, Seq("sym"), "tts", "qts", Seq("px"))
    }
    assert(e.getMessage.contains("type mismatch"))
  }

  private def intervals = Seq( // (key, start, end, tag) — end exclusive
    ("A", 10L, 30L, "i1"),   // spans buckets 1..2 at width 10
    ("A", 25L, 26L, "i2"),   // 1-unit interval inside one bucket
    ("A", 40L, 40L, "i0"),   // empty interval — matches nothing
    ("B", 0L, 100L, "i3")    // long interval, many buckets
  ).toDF("k", "s", "e", "tag")
  private def points = Seq(
    ("A", 10L, "p1"),  // == start: inclusive
    ("A", 25L, "p2"),  // inside i1 AND i2 -> two rows
    ("A", 30L, "p3"),  // == end: exclusive, no match
    ("A", 40L, "p4"),  // empty interval matches nothing
    ("B", 99L, "p5"),  // last instant of i3
    ("C", 50L, "p6")   // no intervals for key
  ).toDF("k", "pt", "pid")

  test("rangeJoin rejects a points input that carries the interval-bound names") {
    // ADVICE r05: the old guard carved out startCol/endCol, so this input
    // passed the require and failed later with an ambiguous-reference
    // AnalysisException; it must fail fast with the alias message
    val clashing = points.withColumn("s", lit(0L))
    val e = intercept[IllegalArgumentException] {
      Relational.rangeJoin(clashing, intervals, Seq("k"), "pt", "s", "e", 10L)
    }
    assert(e.getMessage.contains("alias before joining"))
  }

  test("rangeJoin matches start-inclusive end-exclusive, once per pair") {
    val out = Relational.rangeJoin(points, intervals, Seq("k"), "pt", "s", "e", bucketWidth = 10L)
    val got = out.select("pid", "tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("p1", "i1"), ("p2", "i1"), ("p2", "i2"), ("p5", "i3")))
    assert(out.count() === 4) // each qualifying pair exactly once (single-bucket match)
  }

  test("rangeJoin result is bucket-width-invariant and never a nested loop") {
    val w10 = Relational.rangeJoin(points, intervals, Seq("k"), "pt", "s", "e", 10L)
    val w3  = Relational.rangeJoin(points, intervals, Seq("k"), "pt", "s", "e", 3L)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("pid", "tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(key(w10) === key(w3))
    w10.collect()
    val plan = w10.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.ops.Packing

  private def docs = Seq( // (source, doc_id, n_chars)
    ("s1", 1L, 400L), ("s1", 2L, 500L), ("s1", 3L, 200L),  // 400+500 fits 1000; +200 overflows
    ("s1", 4L, 1500L),                                      // oversize: alone, chunk overflows
    ("s1", 5L, 10L),
    ("s2", 9L, 1000L), ("s2", 10L, 1L)                      // exact fit closes the chunk
  ).toDF("source", "doc_id", "n_chars")

  test("packSequences assigns greedy chunks and offsets in doc_id order") {
    val got = Packing.packSequences(docs, capacity = 1000L)
      .collect().map(p => (p.source, p.doc_id, p.chunk_id, p.offset_chars)).toSet
    assert(got === Set(
      ("s1", 1L, 0L, 0L), ("s1", 2L, 0L, 400L), ("s1", 3L, 1L, 0L),
      ("s1", 4L, 2L, 0L), ("s1", 5L, 3L, 0L),
      ("s2", 9L, 0L, 0L), ("s2", 10L, 1L, 0L)))
  }

  test("packSequences is partitioning-invariant") {
    val base = Packing.packSequences(docs, 1000L).collect().toSet
    val shuffled = Packing.packSequences(docs.repartition(7, $"doc_id"), 1000L).collect().toSet
    assert(shuffled === base)
  }

  test("packChunks assembles text with the same boundaries as packSequences") {
    val withText = docs.withColumn("text", concat(lit("d"), $"doc_id"))
    val chunks = Packing.packChunks(withText, 1000L, sep = "|")
      .collect().map(c => ((c.source, c.chunk_id), (c.n_docs, c.n_chars, c.text))).toMap
    assert(chunks(("s1", 0L)) === ((2L, 900L, "d1|d2")))
    assert(chunks(("s1", 1L)) === ((1L, 200L, "d3")))
    assert(chunks(("s1", 2L)) === ((1L, 1500L, "d4"))) // oversize doc alone
    assert(chunks(("s1", 3L)) === ((1L, 10L, "d5")))
    assert(chunks(("s2", 0L)) === ((1L, 1000L, "d9")))
    assert(chunks(("s2", 1L)) === ((1L, 1L, "d10")))
    // boundary agreement with packSequences on the same input
    val seqChunks = Packing.packSequences(docs, 1000L).collect()
      .groupBy(p => (p.source, p.chunk_id)).view.mapValues(_.length.toLong).toMap
    assert(chunks.view.mapValues(_._1).toMap === seqChunks)
  }
}

/** Randomized agreement with brute-force references: the operators'
  * single-shuffle plans must equal the O(n^2) definition on seeded random
  * data — guards the bucket/carry-forward algebra beyond the fixed fixtures. */
class RelationalRandomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.ops.{Packing, Relational}

  for (seed <- Seq(1, 2, 3)) {
    test(s"asofJoin agrees with the brute-force definition (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      // right rows unique per (key, ts) — the operator's documented contract
      val right = rnd.shuffle((0 to 5).flatMap(k => (0 to 100).map(t => (k, t)))).take(60)
        .map { case (k, t) => (k.toLong, t.toLong, rnd.nextInt(1000).toLong) }
      val left = Seq.fill(120)((rnd.nextInt(6).toLong, rnd.nextInt(110).toLong, rnd.nextLong(1L << 40)))
      val want = left.map { case (k, t, id) =>
        val m = right.filter(r => r._1 == k && r._2 <= t)
        (id, if (m.isEmpty) -1L else m.maxBy(_._2)._3)
      }.toSet
      val got = Relational.asofJoin(
          left.toDF("k", "lts", "lid"), right.toDF("k", "rts", "v"),
          Seq("k"), "lts", "rts", Seq("v"))
        .select(col("lid"), coalesce(col("asof_v"), lit(-1L)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want)
    }

    test(s"rangeJoin agrees with the brute-force definition (seed $seed)") {
      val rnd = new scala.util.Random(seed + 100)
      val ivs = Seq.tabulate(50) { i =>
        val s = rnd.nextInt(100).toLong
        (rnd.nextInt(6).toLong, s, s + rnd.nextInt(30) - 2, i.toLong) // some empty/negative
      }
      val pts = Seq.tabulate(120)(i => (rnd.nextInt(6).toLong, rnd.nextInt(110).toLong, i.toLong))
      val want = (for {
        (pk, p, pid) <- pts; (ik, s, e, iid) <- ivs
        if pk == ik && p >= s && p < e
      } yield (pid, iid)).toSet
      val got = Relational.rangeJoin(
          pts.toDF("k", "pt", "pid"), ivs.toDF("k", "s", "e", "iid"),
          Seq("k"), "pt", "s", "e", bucketWidth = 7L)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want)
    }

    test(s"packSequences invariants hold on random docs (seed $seed)") {
      val rnd = new scala.util.Random(seed + 200)
      val cap = 500L
      val docs = Seq.tabulate(200)(i =>
        (s"s${rnd.nextInt(4)}", i.toLong, (rnd.nextInt(700) + 1).toLong))
      val byId = docs.map(d => d._2 -> d._3).toMap
      val packed = Packing.packSequences(docs.toDF("source", "doc_id", "n_chars"), cap)
        .collect().groupBy(_.source)
      assert(packed.values.map(_.length).sum === docs.size)
      packed.foreach { case (_, ds) =>
        val inOrder = ds.sortBy(_.doc_id)
        // chunk ids dense and nondecreasing in doc order, starting at 0
        assert(inOrder.head.chunk_id === 0L && inOrder.head.offset_chars === 0L)
        inOrder.sliding(2).foreach { case Array(a, b) =>
          val lenA = byId(a.doc_id)
          if (b.chunk_id == a.chunk_id) {
            assert(b.offset_chars === a.offset_chars + lenA) // contiguous
            assert(b.offset_chars + byId(b.doc_id) <= cap)   // fits
          } else {
            assert(b.chunk_id === a.chunk_id + 1 && b.offset_chars === 0L)
            assert(a.offset_chars + lenA + byId(b.doc_id) > cap) // overflow was forced
          }
        case _ => ()
        }
      }
    }
  }
}

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingle hashes: distinct window folds match the driver-side reference") {
    import graft.functions.ExpressibleHash
    val text = "the quick brown fox jumps over the lazy dog"
    val got = Seq((1L, text)).toDF("id", "text")
      .select(Dedup.shingleHashes(col("text"), 3)).head().getSeq[Long](0)
    val want = ExpressibleHash.shingleHashes(text.split("\\s+").toSeq, 3)
    assert(got === want)
    // short doc collapses to ONE whole-doc fold (ShingleSetX parity)
    val short = Seq((1L, "one two")).toDF("id", "text")
      .select(Dedup.shingleHashes(col("text"), 3)).head().getSeq[Long](0)
    assert(short === ExpressibleHash.shingleHashes(Seq("one", "two"), 3))
    assert(short.length === 1)
  }

  test("decontaminate flags exactly the overlapping train docs; bench side broadcast") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    val train = Seq(
      (1L, "alpha beta gamma something else entirely"), // shares "alpha beta gamma"
      (2L, "no overlap with held out content here"),
      (3L, "x y beta gamma delta z")                    // shares "beta gamma delta"
    ).toDF("id", "text")
    val res = Dedup.decontaminate(train, bench, "id", "text", 3)
    val rows = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set((1L, 1L, 1L), (3L, 1L, 1L)))
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("lambdafunction"), plan.take(2000))
  }

  test("boilerplateGrams finds the shared trigrams with their document frequency") {
    val docs2 = (1L to 6L).map(i => (i, s"unsubscribe from this newsletter now item$i"))
      .toDF("id", "text")
    // the 4-word shared prefix contributes 3 trigrams present in all 6 docs;
    // the itemN trigram is unique per doc and must fall below minDf
    val r = Dedup.boilerplateGrams(docs2, "id", "text", n = 3, minDf = 6L).collect()
    assert(r.length === 3)
    r.foreach { row => assert(row.getLong(1) === 6L && row.getLong(2) === 1L) }
  }
}

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keepSample: deterministic mix32 coin, partitioning-invariant") {
    import graft.functions.ExpressibleHash
    val n = 2000L
    val df = spark.range(n).select(col("id"))
    val kept = df.where(TextOps.keepSample(col("id"), lit(250L)))
      .collect().map(_.getLong(0)).toSet
    val want = (0L until n).filter(i => ExpressibleHash.mix32(i) % 1000L < 250L).toSet
    assert(kept === want)
    // the kept SET is invariant under repartitioning (no seed, no rand())
    val kept2 = df.repartition(7).where(TextOps.keepSample(col("id"), lit(250L)))
      .collect().map(_.getLong(0)).toSet
    assert(kept2 === kept)
    // the mix decorrelates id from coin: the realized rate lands near 25%
    assert(math.abs(kept.size.toDouble / n - 0.25) < 0.05, kept.size)
  }

  test("repetitionStats counts trigram windows with multiplicity") {
    val rows = Seq(
      (1L, "spam spam spam spam spam"),          // 3 windows, all the SAME gram
      (2L, "one two three four five"),           // 3 windows, all distinct
      (3L, "a b")                                // short doc: single whole-doc fold
    ).toDF("id", "text")
      .select(col("id"), TextOps.repetitionStats(col("text"), 3).as("rs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) === Seq(3L, 1L, 3L))
    assert(rows(2L) === Seq(3L, 3L, 1L))
    assert(rows(3L) === Seq(1L, 1L, 1L))
  }

  test("token/subword/punct counting") {
    val df = Seq(("hello world, 42 times!", 1)).toDF("text", "id")
    val r = df.select(
      TextOps.tokenCount($"text").as("t"),
      TextOps.subwordCount($"text").as("s"),
      TextOps.punctCount($"text").as("p")).head()
    assert(r.getInt(0) === 4)
    assert(r.getInt(1) === 6) // hello, world, ',', 42, times, '!'
    assert(r.getInt(2) === 2)
  }

  test("quality score rewards natural text over garbage") {
    val df = Seq(
      ("the cat sat on the mat and it was a good day for all of them", "nat"),
      ("x$$@ ###!!! ??? ;;; @@@@ %%%%% ^^^^^ &&&&", "garbage")).toDF("text", "kind")
    val scores = df.select($"kind", TextOps.qualityScore($"text")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("nat") > 0.7)
    assert(scores("garbage") < 0.4)
  }

  test("langId picks the marker language, und when no evidence") {
    val df = Seq(
      ("the cat and the dog of the house", "en"),
      ("der hund und die katze ist nicht hier", "de"),
      ("el perro es que la casa", "es"),
      ("xyzzy qwerty plugh", "und")).toDF("text", "expected")
    df.collect() // materialize
    val got = df.select($"expected", TextOps.langId($"text")).collect()
    got.foreach(r => assert(r.getString(1) === r.getString(0), r.getString(0)))
  }

  test("fingerprint is order-sensitive") {
    val df = Seq(("alpha beta gamma", 1), ("gamma beta alpha", 2)).toDF("text", "id")
    val fps = df.select(TextOps.fingerprint($"text")).collect().map(_.getLong(0))
    assert(fps(0) !== fps(1))
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(-1.0f, 0.0f, 0.0f)),
    (4L, Seq(0.8f, 0.2f, 0.1f))).toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks by true cosine") {
    val got = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Seq(1.0f, 0.0f, 0.0f), 3).collect().map(_.getLong(0))
    assert(got === Array(0L, 1L, 4L))
  }

  test("ANN LSH bucket search returns the query's own bucket neighbors first") {
    val got = Similarity.annTopK(vecs, "vec_id", "embedding",
      Seq(1.0f, 0.0f, 0.0f), 3, planes = 2).collect().map(_.getLong(0))
    assert(got.nonEmpty)
    assert(got.head === 0L) // exact match always shares its own bucket
    assert(!got.contains(3L)) // antipode never lands in the same sign bucket
  }

  test("SignBucket codegen expression == built-ins HOF formulation, and == driver compute") {
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(7)
    val data = (0L until 200L).map(i =>
      (i, Seq.fill(32)((rnd.nextDouble() - 0.5).toFloat))).toDF("vec_id", "embedding")
    val casted = col("embedding").cast(ArrayType(DoubleType))
    val rows = data.select(col("vec_id"),
        Similarity.signBucket(casted, 8).as("expr"),
        Similarity.signBucketHof(casted, 8).as("hof"),
        casted.as("v")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"expr vs hof @ ${r.getLong(0)}")
      val drv = graft.functions.SignBucket.compute(
        r.getSeq[Double](3).toArray, 8)
      assert(drv === r.getLong(1), s"driver vs executor @ ${r.getLong(0)}")
    }
  }

  test("indexed ANN: partition-pruned lookup matches unindexed bucket filter; plan prunes") {
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(11)
    val data = (0L until 300L).map(i =>
      (i, Seq.fill(16)((rnd.nextDouble() - 0.5).toFloat))).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-spec").toString
    Similarity.buildIndex(data, "vec_id", "embedding", planes = 4, idx)
    val q = data.where(col("vec_id") === 5L)
      .select(col("embedding").cast(ArrayType(DoubleType))).head().getSeq[Double](0)
    val got = Similarity.annTopKIndexed(spark, idx, q, k = 5, planes = 4, probeBits = 1)
    // pruning proof: the parquet scan keeps only the probed bucket partitions
    val plan = got.queryExecution.executedPlan.toString
    // non-empty filter list naming the partition column — bare
    // "PartitionFilters: []" prints even when nothing is pruned
    assert("""PartitionFilters: \[[^\]]*bucket""".r.findFirstIn(plan).isDefined, plan)
    val gotIds = got.collect().map(_.getLong(0))
    // same candidates as the unindexed formulation restricted to those buckets
    val qb = graft.functions.SignBucket.compute(q.toArray, 4)
    val buckets = graft.functions.SignBucket.probeBuckets(qb, 4, 1)
    val want = data
      .withColumn("b", Similarity.signBucket(col("embedding").cast(ArrayType(DoubleType)), 4))
      .where(col("b").isin(buckets: _*))
      .select(col("vec_id"),
        Similarity.cosine(col("embedding").cast(ArrayType(DoubleType)),
          array(q.map(lit(_)): _*)).as("cosine"))
      .orderBy(desc("cosine"), col("vec_id")).limit(5)
      .collect().map(_.getLong(0))
    assert(gotIds === want)
    // recall sanity: the query vector itself is always in its own bucket
    assert(gotIds.contains(5L))
  }

  test("ScaleVec == transform/round HOF it replaces; ScaledIntDot nulls on length mismatch") {
    import org.apache.spark.sql.types._
    import graft.functions.{ScaledIntDot, ScaleVec}
    val rnd = new scala.util.Random(13)
    val data = (0L until 200L).map(i =>
      (i, Seq.fill(16)(rnd.nextDouble() * 2 - 1))).toDF("id", "v")
    val rows = data.select(
      ScaleVec(col("v")).as("sv"),
      transform(col("v"), x => round(x * 1e7).cast(LongType)).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // length mismatch -> NULL (zip_with null-pad parity), never a silent
    // shorter-side sum
    val m = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
      .select(ScaledIntDot(col("a"), col("b"))).head()
    assert(m.isNullAt(0))
    // equal-dim sanity
    val d = Seq((Seq(2L, 3L), Seq(5L, 7L))).toDF("a", "b")
      .select(ScaledIntDot(col("a"), col("b"))).head().getLong(0)
    assert(d === 31L)
    // float-array input path (array<float> without a prior cast)
    val f = Seq((1L, Seq(0.5f, -0.25f))).toDF("id", "v")
      .select(ScaleVec(col("v"))).head().getSeq[Long](0)
    assert(f === Seq(5000000L, -2500000L))
    // null ELEMENTS pass through as null elements (HOF transform parity),
    // and a null element then poisons ScaledIntDot to null
    val withNull = Seq((1L, Seq[java.lang.Double](1.0, null, 2.0))).toDF("id", "v")
    val sv = withNull.select(ScaleVec(col("v"))).head().getSeq[java.lang.Long](0)
    assert(sv(0) === 10000000L && sv(1) == null && sv(2) === 20000000L)
    val poisoned = withNull
      .select(ScaledIntDot(ScaleVec(col("v")), ScaleVec(col("v")))).head()
    assert(poisoned.isNullAt(0))
  }

  test("prefixBits == planes edge: every bucket is its own partition (shift 0)") {
    import org.apache.spark.sql.types._
    val data = (0L until 100L).map(i =>
      (i, (0 until 8).map(d => ((i * 37 + d * 13 + 11) % 19).toDouble / 19 - 0.5)))
      .toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft-annpfx-edge").toString
    Similarity.buildIndexPrefixed(data, "vec_id", "embedding",
      planes = 6, prefixBits = 6, idx)
    val q = data.where(col("vec_id") === 2L).select(col("embedding")).head().getSeq[Double](0)
    val got = Similarity.annTopKIndexedPrefixed(spark, idx, q, k = 3,
      planes = 6, prefixBits = 6, probeBits = 1).collect()
    assert(got.nonEmpty && got.head.getLong(0) === 2L)
  }

  test("indexes are self-describing: geometry mismatches throw, never probe wrong") {
    import org.apache.spark.sql.types._
    val data = (0L until 200L).map(i =>
      (i, (0 until 8).map(d => ((i * 41 + d * 17 + 5) % 23).toDouble / 23 - 0.5)))
      .toDF("vec_id", "embedding")
    val q = data.where(col("vec_id") === 3L).select(col("embedding")).head().getSeq[Double](0)

    // prefixed LSH: planes and prefixBits are validated against the build
    val pfx = java.nio.file.Files.createTempDirectory("graft-meta-pfx").toString
    Similarity.buildIndexPrefixed(data, "vec_id", "embedding", planes = 8, prefixBits = 4, pfx)
    assert(Similarity.annTopKIndexedPrefixed(spark, pfx, q, 3, planes = 8,
      prefixBits = 4, probeBits = 1).collect().nonEmpty)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.annTopKIndexedPrefixed(spark, pfx, q, 3, planes = 7,
        prefixBits = 4, probeBits = 1)
    }
    assert(e1.getMessage.contains("planes"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.annTopKIndexedPrefixed(spark, pfx, q, 3, planes = 8,
        prefixBits = 3, probeBits = 1)
    }
    assert(e2.getMessage.contains("prefix_bits"))
    // family mismatch: the flat-index entry point refuses a prefixed index
    val e3 = intercept[IllegalArgumentException] { Similarity.openIndex(spark, pfx, 8) }
    assert(e3.getMessage.contains("family"))

    // flat LSH: planes validated
    val flat = java.nio.file.Files.createTempDirectory("graft-meta-flat").toString
    Similarity.buildIndex(data, "vec_id", "embedding", planes = 6, flat)
    assert(Similarity.annTopKIndexed(spark, flat, q, 3, planes = 6).collect().nonEmpty)
    intercept[IllegalArgumentException] {
      Similarity.annTopKIndexed(spark, flat, q, 3, planes = 5)
    }

    // IVF: the caller's centroid matrix must digest-match the build's
    val ivf = java.nio.file.Files.createTempDirectory("graft-meta-ivf").toString
    val cents = Similarity.trainIvfCentroids(data, "vec_id", "embedding", k = 4, iters = 1)
    Similarity.buildIndexIvf(data, "vec_id", "embedding", cents, ivf)
    assert(Similarity.annTopKIvf(spark, ivf, cents, q, 3, nprobe = 2).collect().nonEmpty)
    val other = cents.map(_.clone()); other(0)(0) += 1L
    val e4 = intercept[IllegalArgumentException] {
      Similarity.annTopKIvf(spark, ivf, other, q, 3, nprobe = 2)
    }
    assert(e4.getMessage.contains("centroids_digest"))

    // an index without metadata is refused outright
    val hp = new org.apache.hadoop.fs.Path(flat, "_graft_index_meta.json")
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, false)
    val e5 = intercept[IllegalArgumentException] {
      Similarity.annTopKIndexed(spark, flat, q, 3, planes = 6)
    }
    assert(e5.getMessage.contains("no _graft_index_meta.json"))
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("synthetic media schema + metadata pass + feature extraction plumbing") {
    val media = Multimodal.syntheticMedia(spark, 100)
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "payload", "width", "height", "sample_rate"))

    val meta = Multimodal.metadata(media).collect()
    assert(meta.length === 100)
    assert(meta.forall(_.getAs[Boolean]("geometry_ok")))
    assert(meta.forall(_.getAs[Int]("n_bytes") === 64)) // 8 x 8-byte hex-decoded blocks

    val feats = Multimodal.extractFeatures(media.as[Multimodal.MediaRow], dims = 8).collect()
    assert(feats.length === 100)
    assert(feats.forall(_.features.length === 8))
    // determinism: same payload -> same features
    val again = Multimodal.extractFeatures(media.as[Multimodal.MediaRow], dims = 8).collect()
    assert(feats.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("frame sampling indices for video rows only") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val sampled = Multimodal.frameSampleIndices(media, fps = 30, everySec = 2).collect()
    assert(sampled.nonEmpty)
    sampled.foreach { r =>
      assert(r.getAs[String]("kind") === "video")
      val idx = r.getAs[scala.collection.Seq[Long]]("frame_indices")
      assert(idx.take(3) === Seq(0L, 60L, 120L))
    }
  }
}

class DedupClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("duplicate clusters: connected components over candidate pairs") {
    // components: {1,2,3,4} (chain), {7,8}, singletons absent from edges
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("pointer jumping: a diameter-8 chain converges in <= 5 rounds") {
    // plain min-label propagation needs O(diameter) = 8 rounds on this
    // chain; the per-round pointer jump (path halving) gets it done in 4
    val pairs = (1L to 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.duplicateClustersWithRounds(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 9L).map(_ -> 1L).toMap)
    assert(rounds <= 5, s"took $rounds rounds")
  }

  test("pointer jumping on a DEEP component: diameter-64 chain in O(log d) rounds") {
    // the evidence gate for large-star/small-star (round-3 verdict item 10):
    // plain min-label propagation needs 64 rounds here; path halving is
    // O(log2 d) ~ 6-7 plus the convergence-probe round. If this ever climbs
    // toward 2x log2(d), revisit star alternation; measured: well under.
    val pairs = (1L to 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.duplicateClustersWithRounds(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 65L).map(_ -> 1L).toMap)
    assert(rounds <= 9, s"took $rounds rounds — pointer jumping regressed")
  }

  test("a CC round costs at most 1 driver action (jump checkpoint fused into next probe)") {
    // round-4 verdict #3 brought eager-checkpoint + separate count from 3
    // driver round-trips per round to 2; round 6 makes the jump checkpoint
    // lazy as well, so each round is exactly ONE job (the convergence count,
    // which materializes both lazy checkpoints transitively). AQE is
    // disabled here so one action == one job and the count is deterministic;
    // broadcast sides never appear (checkpointed LogicalRDDs have unknown,
    // i.e. huge, stats).
    val sc = spark.sparkContext
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // at TEST scale the join sides are tiny, so Spark adds an async
    // broadcast-exchange job per round; disable broadcast so one action ==
    // one job and the assertion counts exactly the synchronous round-trips
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    try {
      val pairs = (1L to 16L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      org.apache.spark.sql.graftshim.Bridge.drainListenerBus(sc, 30000L)
      sc.addSparkListener(listener)
      val (labels, rounds) = Dedup.duplicateClustersWithRounds(pairs)
      org.apache.spark.sql.graftshim.Bridge.drainListenerBus(sc, 30000L)
      sc.removeSparkListener(listener)
      val n = jobs.get()
      // 1 job for the edges checkpoint + 1 per round; +1 slack for engine
      // internals — 2 per round must FAIL (that was the round-5 shape)
      assert(n <= rounds + 2, s"$n jobs for $rounds rounds — jump checkpoint not fused")
      assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
        (1L to 17L).map(_ -> 1L).toMap)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("end-to-end: near-dup pairs -> clusters -> keep one doc per cluster") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy cat"),
      (12L, "the quick brown fox jumps over the lazy dog"),
      (20L, "entirely different text about spark and data processing")
    ).toDF("id", "text")
    val pairs = Dedup.nearDuplicates(docs, "id", "text", numShingles = 2,
      bands = 8, rowsPerBand = 2, threshold = 0.5)
    val clusters = Dedup.duplicateClusters(pairs)
    // dedupe: keep min id per cluster, plus docs in no cluster
    val keep = docs.join(clusters, docs("id") === clusters("id"), "left")
      .where(clusters("cluster").isNull || docs("id") === clusters("cluster"))
      .select(docs("id"))
      .collect().map(_.getLong(0)).sorted
    assert(keep.toSeq === Seq(10L, 20L))
  }
}
