package graft

import org.apache.spark.sql.functions._

import graft.functions.SimHash64
import graft.operators.{Dedup, Multimodal, Similarity}

/** Hash-based dedup + similarity operators: validated with planted
  * near-duplicates (no cross-engine oracle exists for murmur/FNV
  * signatures — determinism and recall are the contracts). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with planted near-duplicate pairs: (1000,1001) and (2000,2001)
  // differ by one word; everything else is distinct noise.
  lazy val corpus = {
    val noise = (0 until 200).map { i =>
      val words = (0 until 30).map(j => s"w${i}_$j") // disjoint vocab per doc
      (i.toLong, words.mkString(" "))
    }
    val planted = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (1001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (2000L, "one two three four five six seven eight nine ten eleven twelve"),
      (2001L, "one two three four five six seven eight nine ten eleven thirteen"))
    (noise ++ planted).toDF("id", "text")
  }

  test("exact dedup keeps the lowest-id survivor per duplicate text") {
    val withDups = corpus.union(Seq((9999L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("id", "text"))
    val out = Dedup.exact(withDups, col("text"), col("id"))
    assert(out.count() === withDups.count() - 1)
    assert(out.filter(col("id") === 9999L).count() === 0)
    assert(out.filter(col("id") === 1000L).count() === 1)
  }

  test("minhash LSH finds planted near-dup pairs and no noise pairs") {
    val pairs = Dedup.minhashLsh(corpus, col("id"), col("text"),
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1000L, 1001L)))
    assert(pairs.contains((2000L, 2001L)))
    assert(pairs.forall { case (a, b) => (a >= 1000 && b >= 1000) },
      s"noise pair leaked: $pairs")
  }

  test("simhash: signatures distinct on noise; planted near-dups found (relaxed radius)") {
    val sig = corpus.select(SimHash64(split(col("text"), "\\s+")).as("s"))
    assert(sig.distinct().count() > 200 - 5) // signatures mostly unique on noise
    // 12-token docs give noisy signatures, so the planted pairs sit past
    // the hamming<=3 envelope where chunk blocking GUARANTEES recall;
    // at 16 the operator is best-effort (pairs must share some 16-bit
    // chunk) — deterministic here, and these planted pairs do.
    val pairs = Dedup.simhashPairs(corpus, col("id"), col("text"), maxHamming = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1000L, 1001L)), s"got $pairs")
    assert(pairs.contains((2000L, 2001L)), s"got $pairs")
  }

  test("simhash blocking is EXACT within the guaranteed hamming<=3 envelope") {
    // pigeonhole contract: 64-bit sig in 4 chunks, hamming<=3 implies
    // >=1 identical chunk — so blocked pairs == brute-force pairs.
    val sigs = corpus.select(col("id"), SimHash64(split(col("text"), "\\s+")).as("sig"))
    val l = sigs.as("l"); val r = sigs.as("r")
    val brute = l.crossJoin(r).filter(col("l.id") < col("r.id"))
      .withColumn("h", SimHash64.hamming(col("l.sig"), col("r.sig")))
      .filter(col("h") <= 3)
      .select(col("l.id"), col("r.id")).as[(Long, Long)].collect().toSet
    val blocked = Dedup.simhashPairs(corpus, col("id"), col("text"), maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked === brute)
  }

  test("simhash expression is deterministic and codegen path matches eval path") {
    val df = Seq("hello world foo bar", "hello world foo baz").toDF("t")
      .select(SimHash64(split(col("t"), " ")).as("s"))
    val a = df.collect().map(_.getLong(0))
    val b = df.collect().map(_.getLong(0))
    assert(a.toSeq === b.toSeq)
    assert(a(0) !== a(1))
    // hamming of near-identical word sets is small
    val h = java.lang.Long.bitCount(a(0) ^ a(1))
    assert(h <= 24, s"hamming $h unexpectedly large")
  }

  test("MinHashSignature is bit-identical to the HOF formulation it replaced") {
    val sh = corpus.select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val numHashes = 32
    val hof = array((0 until numHashes).map(seed =>
      array_min(transform(col("sh"), s => hash(s, lit(seed))))): _*)
    val both = sh.select(col("id"),
      Dedup.minhashSignature(col("sh"), numHashes).as("fast"), hof.as("slow"))
    assert(both.filter(not(col("fast") <=> col("slow"))).count() === 0)
    // codegen path matches interpreted eval (determinism across runs)
    val a = both.select("fast").collect().map(_.getSeq[Int](0))
    val b = both.select("fast").collect().map(_.getSeq[Int](0))
    assert(a.map(_.toList).toSeq === b.map(_.toList).toSeq)
  }

  test("cosine is NULL on length mismatch (zip_with null-pad parity) and zero norm") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(Dedup.cosine(col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0), "mismatched lengths must yield NULL, not a prefix dot")
    assert(rows(2).isNullAt(0), "zero-norm side must yield NULL, not NaN")
  }

  test("ngram jaccard within blocks finds planted pairs with exact scores") {
    val blocked = corpus.withColumn("blk", when(col("id") >= 1000, 1).otherwise(col("id") % 5))
    val pairs = Dedup.ngramJaccard(blocked, col("id"), col("text"), col("blk"),
        shingleN = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    // 12-word docs, word trigrams: 10 shingles each, 9 shared
    // jaccard = 9 / 11
    assert(m.contains((1000L, 1001L)))
    assert(math.abs(m((1000L, 1001L)) - 9.0 / 11.0) < 1e-12)
  }

  test("degenerate bucket (identical boilerplate) is capped, not quadratized") {
    // 5000 identical docs would form ONE bucket with 12.5M candidate
    // pairs; the maxBucket guard drops the bucket wholesale while the
    // planted pair in a healthy bucket still surfaces.
    val boiler = (10000 until 15000).map(i => (i.toLong, "lorem ipsum dolor sit amet " * 3))
    val df = corpus.union(boiler.toDF("id", "text"))
    val pairs = Dedup.minhashLsh(df, col("id"), col("text"),
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1000L, 1001L)))
    assert(!pairs.exists { case (a, b) => a >= 10000 || b >= 10000 },
      "boilerplate bucket leaked candidate pairs")
  }

  test("embeddingNearDup: degenerate block is capped, healthy blocks unaffected") {
    // one dominant label would otherwise re-quadratize its block (500
    // identical vectors = 124,750 pairs); the planted pair in a healthy
    // block must still surface with its exact cosine.
    val healthy = Seq(
      (1L, "a", Array(1.0f, 0.0f, 0.1f)),
      (2L, "a", Array(1.0f, 0.0f, 0.11f)),
      (3L, "a", Array(0.0f, 1.0f, 0.0f)))
    val dominant = (1000 until 1500).map(i => (i.toLong, "z", Array(0.5f, 0.5f, 0.5f)))
    val df = (healthy ++ dominant).toDF("vid", "lbl", "emb")
    val pairs = Dedup.embeddingNearDup(df, col("vid"), col("emb"), col("lbl"),
        threshold = 0.9, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"healthy-block pair lost: $pairs")
    assert(!pairs.exists { case (a, b) => a >= 1000 || b >= 1000 },
      "dominant block leaked pairs past the cap")
    // cap disabled (default 2^20): the dominant block pairs quadratically
    val uncapped = Dedup.embeddingNearDup(df, col("vid"), col("emb"), col("lbl"),
      threshold = 0.9).count()
    assert(uncapped === 1L + 500L * 499L / 2L)
  }

  test("lshTopK: zero-norm corpus embedding yields no candidates (brute-force parity)") {
    val embs = spark.range(100).select(col("id"),
      when(col("id") === 50L,
          transform(sequence(lit(0), lit(15)), _ => lit(0.0)))
        .otherwise(transform(sequence(lit(0), lit(15)),
          d => (pmod(hash(col("id"), d), lit(1000)).cast("double") - 500.0) / 500.0))
        .as("emb"))
    val queries = embs.filter(col("id") < 5)
    val approx = Similarity.lshTopK(embs, col("id"), col("emb"),
      queries, col("id"), col("emb"), k = 20, tables = 16, planes = 2)
    val rows = approx.collect()
    assert(!rows.exists(_.getLong(1) == 50L),
      "zero-norm corpus row ranked despite undefined cosine")
    assert(rows.forall(r => !r.getDouble(2).isNaN), "NaN cosine leaked")
    // brute force agrees: CosineSim is NULL there, TopKByScore drops it
    val brute = Similarity.bruteForceTopK(embs, col("id"), col("emb"),
      queries, col("id"), col("emb"), k = 20).collect()
    assert(!brute.exists(_.getLong(1) == 50L))
  }

  test("lshTopK: empty query set returns an empty frame; NULL query embedding fails fast") {
    val embs = spark.range(50).select(col("id"),
      transform(sequence(lit(0), lit(7)),
        d => (pmod(hash(col("id"), d), lit(1000)).cast("double") - 500.0) / 500.0).as("emb"))
    val none = Similarity.lshTopK(embs, col("id"), col("emb"),
      embs.filter(col("id") < 0), col("id"), col("emb"), k = 5)
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("query_id", "nn_id", "cos", "rank"))
    val withNull = embs.withColumn("emb",
      when(col("id") === 3L, lit(null)).otherwise(col("emb")))
    val ex = intercept[IllegalArgumentException] {
      Similarity.lshTopK(embs, col("id"), col("emb"),
        withNull.filter(col("id") < 5), col("id"), col("emb"), k = 5)
    }
    assert(ex.getMessage.contains("NULL query embedding"))
  }

  test("LSH ANN achieves >=60% recall@5 vs brute force on random embeddings") {
    // deterministic pseudo-random embeddings, 16 dims, 300 vectors
    val embs = spark.range(300).select(col("id"),
      transform(sequence(lit(0), lit(15)),
        d => (pmod(hash(col("id"), d), lit(1000)).cast("double") - 500.0) / 500.0).as("emb"))
    val queries = embs.filter(col("id") < 10)
    def collectNeighbors(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nn_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = collectNeighbors(Similarity.bruteForceTopK(
      embs, col("id"), col("emb"), queries, col("id"), col("emb"), k = 5))
    val approx = collectNeighbors(Similarity.lshTopK(
      embs, col("id"), col("emb"), queries, col("id"), col("emb"),
      k = 5, tables = 16, planes = 6))
    val recalls = exact.map { case (q, nn) =>
      approx.get(q).map(a => (a & nn).size.toDouble / nn.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 = $mean")
  }

  test("TopKByScore: generic (string) ids survive partial/merge serialization; ranking exact") {
    import graft.functions.TopKByScore
    // 40 partitions force map-side partials + a real merge+deserialize
    // path; string ids exercise the generic UnsafeProjection buffer codec
    val rows = (0 until 2000).map(i => (s"g${i % 3}", f"id$i%04d", (i * 37 % 1999) / 1000.0))
    val df = spark.createDataFrame(rows).toDF("g", "id", "score").repartition(40)
    val got = df.groupBy(col("g"))
      .agg(TopKByScore(col("score"), col("id"), 4).as("top"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(m => (m.getString(0), m.getDouble(1))))
      .toMap
    // oracle: plain Scala sort by (score desc, id asc)
    rows.groupBy(_._1).foreach { case (g, gr) =>
      val want = gr.map(t => (t._2, t._3)).sortBy { case (id, s) => (-s, id) }.take(4)
      assert(got(g) === want, s"group $g")
    }
  }

  test("TopKByScore survives ObjectHashAggregate's sort-based fallback (>128 groups)") {
    import graft.functions.TopKByScore
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold defaults
    // to 128 distinct groups per partition: past it the operator switches
    // to sort-based aggregation, driving serialize/merge on every buffer
    val n = 300
    val rows = (0 until n * 20).map(i => (i % n, i.toLong, ((i * 131) % 997) / 100.0))
    val df = spark.createDataFrame(rows).toDF("g", "id", "score").repartition(7)
    val got = df.groupBy(col("g"))
      .agg(TopKByScore(col("score"), col("id"), 3).as("top"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(m => (m.getLong(0), m.getDouble(1))))
      .toMap
    assert(got.size === n)
    rows.groupBy(_._1).foreach { case (g, gr) =>
      val want = gr.map(t => (t._2, t._3)).sortBy { case (id, s) => (-s, id) }.take(3)
      assert(got(g) === want, s"group $g")
    }
  }

  test("dropNearDuplicates keeps the lowest id of each planted pair") {
    val pairs = Dedup.minhashLsh(corpus, col("id"), col("text"),
      shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
    val kept = Dedup.dropNearDuplicates(corpus, col("id"), pairs)
    val ids = kept.select("id").as[Long].collect().toSet
    assert(ids.contains(1000L) && !ids.contains(1001L))
    assert(ids.contains(2000L) && !ids.contains(2001L))
    assert((0 until 200).forall(i => ids.contains(i.toLong))) // noise untouched
  }

  test("IVF ANN achieves >=60% recall@5 vs brute force on random embeddings") {
    val embs = spark.range(300).select(col("id"),
      transform(sequence(lit(0), lit(15)),
        d => (pmod(hash(col("id"), d), lit(1000)).cast("double") - 500.0) / 500.0).as("emb"))
    val queries = embs.filter(col("id") < 10)
    def collectNeighbors(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nn_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = collectNeighbors(Similarity.bruteForceTopK(
      embs, col("id"), col("emb"), queries, col("id"), col("emb"), k = 5))
    val approx = collectNeighbors(Similarity.ivfTopK(
      embs, col("id"), col("emb"), queries, col("id"), col("emb"),
      k = 5, nlist = 16, nprobe = 6, lloydIters = 1))
    val recalls = exact.map { case (q, nn) =>
      approx.get(q).map(a => (a & nn).size.toDouble / nn.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 = $mean")
    // sampled-Lloyd training (the 100 TB path: refinement reads a
    // hash-sample, not the corpus) must not collapse recall
    val sampled = collectNeighbors(Similarity.ivfTopK(
      embs, col("id"), col("emb"), queries, col("id"), col("emb"),
      k = 5, nlist = 16, nprobe = 6, lloydIters = 1, trainFraction = 0.5))
    val sRecalls = exact.map { case (q, nn) =>
      sampled.get(q).map(a => (a & nn).size.toDouble / nn.size).getOrElse(0.0)
    }
    val sMean = sRecalls.sum / sRecalls.size
    assert(sMean >= 0.6, s"sampled-Lloyd mean recall@5 = $sMean")
  }

  test("NearestCentroids: codegen matches eval, ordered by cosine, deterministic") {
    import graft.functions.NearestCentroids
    val cents = Array(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0),
      Array(0.7, 0.7, 0.0, 0.0),
      Array(0.0, 0.0, 5.0, 0.0)) // un-normalized on purpose
    val df = Seq(Seq(0.9, 0.1, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.0))
      .toDF("e").select(NearestCentroids(col("e"), cents, 3).as("nc"))
    val rows = df.as[Seq[Int]].collect()
    // row 0: nearest = x-axis (0), then diagonal (2), then y-axis (1)
    assert(rows(0) === Seq(0, 2, 1))
    // row 1: z-axis centroid wins despite magnitude 5 (cosine, not dot)
    assert(rows(1).head === 3)
    assert(df.as[Seq[Int]].collect().toSeq === rows.toSeq) // deterministic
  }

  test("multimodal decode: batch stage output matches per-row expectation") {
    val media = Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.decodeFeatures(media, Multimodal.FakeDecoder, partitions = 4)
      .collect()
    assert(feats.length === 500)
    feats.take(20).foreach { f =>
      assert(f.histogram.sum === f.n_bytes.toLong,
        s"histogram mass != byte count for ${f.media_id}")
      assert(f.histogram.length === 8)
    }
    assert(feats.map(_.kind).toSet === Set("image", "audio", "video"))
  }
}
