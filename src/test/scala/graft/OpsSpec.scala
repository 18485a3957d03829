package graft

import graft.ops.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  // --- text ---

  test("wordEntropy: uniform, skewed, constant, and degenerate docs") {
    val df = Seq("a b c d", "a a b b", "a a a a", "a a a b", "", "x")
      .toDF("t").select(TextAnalysis.wordEntropy($"t").as("h"))
    val h = df.as[Double].collect().toSeq
    assert(h(0) == 2.0) // 4 distinct of 4
    assert(h(1) == 1.0) // two 50/50 words
    assert(h(2) == 0.0) // one word only
    // 3/4 * log2(4/3) + 1/4 * log2(4) = 0.811278
    assert(math.abs(h(3) - 0.811278) < 1e-6)
    assert(h(4) == 0.0 && h(5) == 0.0) // <2 tokens
  }

  test("tokenCount: whitespace, blank, and multi-space handling") {
    val df = Seq("one two three", "", "   ", " padded  words ").toDF("t")
      .select(TextAnalysis.tokenCount($"t").as("n"))
    assert(df.as[Long].collect().toSeq == Seq(3L, 0L, 0L, 2L))
  }

  test("int8 quantization: 4x smaller, cosine preserved to 1e-2, zero-safe") {
    val vecs = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(32)(j => (math.sin(i * 7 + j * 13) * (1 + i % 5)).toFloat)))
      .toDF("vec_id", "embedding")
    val q = vecs.withColumn("q", Similarity.quantizeInt8($"embedding"))
      .withColumn("back", Similarity.dequantizeInt8($"q"))
    val err = q.select(Similarity.cosine($"embedding", $"back").as("c"))
      .agg(min("c")).as[Double].collect()(0)
    assert(err > 0.99, s"worst cosine after round-trip: $err")
    // codes are genuinely tinyint (1 byte vs 4)
    val codeType = q.schema("q").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .apply("codes").dataType
    assert(codeType == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType, containsNull = false) ||
      codeType.simpleString.startsWith("array<tinyint>"), codeType)
    // all-zero vector round-trips to all zeros, no NaN
    val z = Seq((0L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
      .withColumn("q", Similarity.quantizeInt8($"embedding"))
      .withColumn("back", Similarity.dequantizeInt8($"q"))
      .select("back").as[Array[Float]].collect()(0)
    assert(z.forall(_ == 0.0f))
  }

  test("chunkDocs: windows, overlap, tail coverage, empty exclusion") {
    val long = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, "short doc"), (2L, long), (3L, "  ")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(docs, "doc_id", "text", maxTokens = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // short doc: one chunk, whole text; empty doc: none
    assert(out.count(_._1 == 1L) == 1 && out.find(_._1 == 1L).get._4 == "short doc")
    assert(!out.exists(_._1 == 3L))
    // 100 tokens at stride 48: chunks [0,64) and [48,100)
    val c2 = out.filter(_._1 == 2L).sortBy(_._2)
    assert(c2.map(c => (c._2, c._3)).toSeq == Seq((0L, 64L), (1L, 52L)))
    assert(c2(0)._4.startsWith("w1 ") && c2(0)._4.endsWith(" w64"))
    assert(c2(1)._4.startsWith("w49 ") && c2(1)._4.endsWith(" w100"))
    // the overlap region is present in both chunks
    assert(c2(0)._4.contains("w50") && c2(1)._4.contains("w50"))
  }

  // hand-built fixture table for ALGORITHM tests (production uses the
  // learned table in the embedded resource; see the trainer tests)
  private val fixtureMerges: Vector[(String, String)] = Vector(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("in", "g"),
    ("l", "e"), ("a", "b"), ("ab", "le"), ("t", "able"), ("t", "er"))
  private val fixtureRanks = fixtureMerges.zipWithIndex.toMap

  test("BPE merge table is well-formed: operands from strictly earlier merges") {
    // confluence of the greedy loop (and its SQL-replay oracle) depends
    // on this: a merge's operands must be single chars or outputs of
    // LOWER-ranked merges, so newly created pairs always rank later
    // than the merge that created them. The LEARNED table must satisfy
    // it by construction (every symbol is a base char or an earlier
    // merge's output).
    val producible = scala.collection.mutable.Set[String]()
    TextAnalysis.bpeMerges.zipWithIndex.foreach { case ((a, b), i) =>
      for (op <- Seq(a, b))
        assert(op.length == 1 || producible.contains(op),
          s"merge $i ($a,$b): operand '$op' not producible by earlier merges")
      producible += (a + b)
    }
    // no duplicate pairs (a later duplicate would be dead)
    assert(TextAnalysis.bpeMerges.distinct.size == TextAnalysis.bpeMerges.size)
    // the learned table CONVERGED on its training corpus: every word of
    // the documents vocabulary segments to ONE token (the corpus has a
    // small closed vocabulary, so full convergence — not table size —
    // is the meaningful training success criterion)
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .groupBy("w").count().orderBy($"count".desc).limit(20)
      .select("w").as[String].collect()
    assert(words.nonEmpty)
    for (w <- words if w.matches("[a-z]+"))
      assert(TextAnalysis.bpeSegmentCount(w) == 1, s"corpus word '$w' not fully merged")
  }

  test("BPE segmentation: greedy lowest-rank merges, all occurrences") {
    def seg(w: String) = TextAnalysis.bpeSegmentCount(w, fixtureMerges, fixtureRanks)
    // the|table: (t,h) then (th,e); (t,able) via (a,b),(ab,le)
    assert(seg("thetable") == 2)
    // ter|ter|ing: (e,r) then (i,n) then (in,g) then (t,er) by rank
    assert(seg("tertering") == 3)
    // all-occurrence semantics: 'aaa' has no (a,a) merge -> 3 singles
    assert(seg("aaa") == 3)
    assert(seg("") == 0)
    assert(seg("x") == 1)
  }

  test("BPE trainer: learns the corpus' frequent words down to 1 token, deterministically") {
    val corpus = Seq.fill(50)("the quick table scan") ++ Seq.fill(30)("query the table") ++
      Seq.fill(10)("zebra quartz")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val merges = TextAnalysis.trainBpe(df, "text", numMerges = 60, maxWords = 100)
    // well-formed by construction
    val producible = scala.collection.mutable.Set[String]()
    merges.foreach { case (a, b) =>
      for (op <- Seq(a, b)) assert(op.length == 1 || producible.contains(op))
      producible += (a + b)
    }
    // frequent words fully merge to a single token
    val ranks = merges.zipWithIndex.toMap
    for (w <- Seq("the", "table", "query", "scan"))
      assert(TextAnalysis.bpeSegmentCount(w, merges, ranks) == 1, s"'$w' not fully merged")
    // rare words stay multi-token at this merge budget
    assert(TextAnalysis.bpeSegmentCount("zebraquartzzz", merges, ranks) > 1)
    // deterministic across runs
    assert(TextAnalysis.trainBpe(df, "text", numMerges = 60, maxWords = 100) == merges)
    // minFrequency floor: pairs seen once don't merge
    val tiny = Seq((1L, "xy")).toDF("id", "text")
    assert(TextAnalysis.trainBpe(tiny, "text", numMerges = 10).isEmpty)
  }

  test("BPE token counts: pre-tokenization + per-doc totals") {
    val ds = Seq((1L, "the table"), (2L, "a-b c3d"), (3L, ""), (4L, "   "))
      .toDS()
    val got = TextAnalysis.bpeTokenCounts(ds).collect().toMap
    // totals = sum of per-pretoken segment counts under the LEARNED
    // table ("a-b c3d" pre-tokenizes to [a][-][b][c][3][d] words)
    val exp1 = Seq("the", "table").map(TextAnalysis.bpeSegmentCount).sum.toLong
    val exp2 = Seq("a", "-", "b", "c", "3", "d").map(TextAnalysis.bpeSegmentCount).sum.toLong
    assert(got == Map(1L -> exp1, 2L -> exp2, 3L -> 0L, 4L -> 0L))
  }

  test("BPE token ids: counts agree, chars map to code points, outputs above Unicode") {
    val ds = Seq((1L, "the table"), (2L, "a-b c3d"), (3L, "")).toDS()
    val ids = TextAnalysis.bpeTokenIds(ds).collect().toMap
    val counts = TextAnalysis.bpeTokenCounts(ds).collect().toMap
    for ((k, v) <- ids) assert(v.length.toLong == counts(k),
      s"doc $k: ${v.length} ids vs count ${counts(k)}")
    assert(ids(3L).isEmpty)
    // '-' never merges (punctuation pre-tokenizes alone) -> its code point
    assert(ids(2L).contains('-'.toInt))
    // merged symbols sit above the Unicode range, disjoint from chars
    val (merged, chars) = ids.values.flatten.partition(_ >= 0x110000)
    assert(chars.forall(c => c >= 0 && c < 0x110000))
    // vocabulary mapping is injective (distinct outputs, distinct ids)
    val vocab = TextAnalysis.bpeVocabIds
    assert(vocab.values.toSeq.distinct.size == vocab.size)
    assert(merged.forall(id => vocab.values.exists(_ == id)))
    // a word that fully merges yields ONE id, the vocab id of the word
    if (TextAnalysis.bpeSegmentCount("the") == 1)
      assert(ids(1L).take(1).head == vocab("the"))
  }

  test("charShingles and wordNgrams") {
    val sh = Seq("abcdef").toDF("t")
      .select(TextAnalysis.charShingles($"t", 3).as("s")).as[Seq[String]].collect()(0)
    assert(sh.toSet == Set("abc", "bcd", "cde", "def"))
    val ng = Seq("a b c d").toDF("t")
      .select(TextAnalysis.wordNgrams($"t", 2).as("g")).as[Seq[String]].collect()(0)
    assert(ng.toSet == Set("a b", "b c", "c d"))
    // short text falls back to single element
    val short = Seq("ab").toDF("t")
      .select(TextAnalysis.charShingles($"t", 5).as("s")).as[Seq[String]].collect()(0)
    assert(short == Seq("ab"))
  }

  test("langId picks the stopword-dominant language") {
    val df = Seq(
      "the cat and the dog was in the house",
      "el perro y la casa de los gatos es una maravilla por aqui",
      "zzz qqq xxx").toDF("t")
      .select(TextAnalysis.langId($"t").as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "und"))
  }

  test("langId: every planted phrase labels its own language (28 langs + und + confusables)") {
    // the last four phrases TIE at the stopword stage across their
    // confusable pair (da/no, es/pt) — only the char-n-gram stage
    // separates them; da and es would lose the lex-largest tie-break
    // without it
    val expected = Seq("ja", "zh", "ko", "ar", "he", "hi", "th", "el",
      "en", "es", "fr", "de", "it", "pt", "nl", "sv", "da", "no", "fi",
      "pl", "cs", "ro", "hu", "tr", "id", "vi", "ru", "uk", "und",
      "da", "no", "es", "pt")
    val phrases = graft.SparkEntry.langPhrases
    assert(phrases.length == expected.length)
    val got = phrases.toDF("t")
      .select(TextAnalysis.langId($"t").as("l")).as[String].collect().toSeq
    assert(got == expected, phrases.zip(got).zip(expected)
      .filter { case ((_, g), e) => g != e }.mkString("; "))
  }

  test("quality score in [0,1], garbage scores lower than prose") {
    val scores = Seq(
      "The quick brown fox jumps over the lazy dog and runs far away today.",
      "!!!###$$$ ???***").toDF("t")
      .select(TextAnalysis.qualityScore($"t").as("q")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("fingerprint is stable under whitespace normalization") {
    val fps = Seq("hello   world foo", "hello world    foo").toDF("t")
      .select(TextAnalysis.fingerprint($"t").as("f")).as[Long].collect()
    assert(fps(0) == fps(1))
  }

  // --- dedup ---

  test("exact dedup keeps the min-id row per key") {
    val df = Seq((3L, "x", "c"), (1L, "x", "a"), (2L, "y", "b")).toDF("id", "k", "p")
    val got = Dedup.exact(df, Seq("k"), "id").orderBy("k")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("id"), r.getAs[String]("p")))
    assert(got.toSeq == Seq(("x", 1L, "a"), ("y", 2L, "b")))
    val byHash = Dedup.exactByHash(df.withColumnRenamed("k", "text"), "text", "id")
    assert(byHash.count() == 2)
  }

  test("minhash signature similarity tracks jaccard; LSH finds near-dups") {
    val base = "the quick brown fox jumps over the lazy dog again and again in the field"
    val near = base + " tail"
    val far = "completely different content about spark catalyst optimizer internals"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "text")
    val pairs = Dedup.minhashNearDups(df, "id", "text", threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical -> distance 0; near texts -> small distance") {
    val df = Seq(
      ("aaa", "the quick brown fox jumps over the lazy dog"),
      ("bbb", "the quick brown fox jumps over the lazy dog"),
      ("ccc", "spark catalyst tungsten shuffle partitions broadcast")).toDF("id", "t")
      .select($"id", Dedup.simhash($"t").as("h"))
    val m = df.as[(String, Long)].collect().toMap
    assert(m("aaa") == m("bbb"))
    assert(java.lang.Long.bitCount(m("aaa") ^ m("ccc")) > 10)
  }

  test("dup clustering: chains collapse to one component, min id wins") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L) // chain 1-2-3
    assert(got(10L) == 10L && got(11L) == 10L)
    // dropNearDups keeps one survivor per component
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today x"),
      (3L, "the quick brown fox jumps over the lazy dog again today x y"),
      (9L, "completely unrelated text about catalyst and tungsten engine")).toDF("id", "text")
    val kept = Dedup.dropNearDups(docs, "id", "text", threshold = 0.5)
      .select("id").as[Long].collect().sorted
    assert(kept.contains(1L) && kept.contains(9L) && kept.length < 4)
  }

  test("dup clustering: long chains (diameter >> 10) converge on both paths") {
    // a 30-link chain plus a shuffled 2nd component; the old min-label
    // propagation aborted past diameter 10 — both the driver union-find
    // and the large-star/small-star path must label these exactly
    val chain = (0L until 30L).map(i => (i, i + 1))
    val other = Seq((100L, 103L), (103L, 101L), (101L, 102L))
    val pairs = (chain ++ other).toDF("a", "b")
    val viaDriver = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    val viaStars = Dedup.dupClusters(pairs, driverLimit = 0L)
      .as[(Long, Long)].collect().toMap
    for (got <- Seq(viaDriver, viaStars)) {
      assert(got.size == 35)
      (0L to 30L).foreach(i => assert(got(i) == 0L))
      (100L to 103L).foreach(i => assert(got(i) == 100L))
    }
  }

  test("dup clustering: string ids and edge orientation don't matter") {
    val pairs = Seq(("zz", "bb"), ("bb", "aa"), ("q", "q2")).toDF("a", "b")
    for (limit <- Seq(1L << 20, 0L)) {
      val got = Dedup.dupClusters(pairs, driverLimit = limit)
        .as[(String, String)].collect().toMap
      assert(got == Map("zz" -> "aa", "bb" -> "aa", "aa" -> "aa",
        "q" -> "q", "q2" -> "q"))
    }
  }

  test("ngram jaccard on explicit pairs") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d f"), (3L, "x y z w q")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val got = Dedup.ngramJaccard(df, "id", "text", pairs, n = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((1L, 2L)) > 0.5)
    assert(got((1L, 3L)) == 0.0)
  }

  // --- as-of join ---

  test("asof join: latest right row at-or-before each left ts per key") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:03:00"), 50.0)).toDF("k", "ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:02:00"), "a"), // -> 100.0
      (1L, ts("2024-01-01 10:05:00"), "b"), // equality -> 101.0
      (2L, ts("2024-01-01 10:01:00"), "c"), // before any quote
      (3L, ts("2024-01-01 10:00:00"), "d")  // no key match
    ).toDF("k", "ts", "tag")
    val inner = graft.ops.AsOf.join(trades, quotes, Seq("k"), "ts", "ts", "q_")
      .select($"tag", $"q_px").as[(String, Double)].collect().toMap
    assert(inner == Map("a" -> 100.0, "b" -> 101.0))
    val outer = graft.ops.AsOf.join(trades, quotes, Seq("k"), "ts", "ts", "q_",
      inner = false)
    assert(outer.count() == 4)
    assert(outer.filter($"tag" === "c").select("q_px").collect()(0).isNullAt(0))
    // tolerance: 60s window excludes the 2-minute-old quote for 'a'
    val tol = graft.ops.AsOf.join(trades, quotes, Seq("k"), "ts", "ts", "q_",
      toleranceUs = Some(60L * 1000000L))
      .select($"tag").as[String].collect().toSet
    assert(tol == Set("b"))
    // sub-second tolerance must not truncate to whole seconds: a 500ms
    // window rejects a quote 1.5s old but keeps one 200ms old
    def tsm(s: String) = java.sql.Timestamp.valueOf(s)
    val q2 = Seq((1L, tsm("2024-01-01 10:00:00.0"), 1.0),
      (2L, tsm("2024-01-01 10:00:01.3"), 2.0)).toDF("k", "ts", "px")
    val t2 = Seq((1L, tsm("2024-01-01 10:00:01.5"), "x"),
      (2L, tsm("2024-01-01 10:00:01.5"), "y")).toDF("k", "ts", "tag")
    val subsec = graft.ops.AsOf.join(t2, q2, Seq("k"), "ts", "ts", "q_",
      toleranceUs = Some(500000L))
      .select($"tag").as[String].collect().toSet
    assert(subsec == Set("y"))
  }

  test("asof join directions: forward first-at-or-after, nearest with backward ties") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:10:00"), 110.0)).toDF("k", "ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:02:00"), "early"),   // nearest: 100 (2m vs 8m)
      (1L, ts("2024-01-01 10:05:00"), "mid"),     // tie 5m/5m -> backward 100
      (1L, ts("2024-01-01 10:09:00"), "late"),    // nearest: 110 (1m vs 9m)
      (1L, ts("2024-01-01 10:10:00"), "equal"),   // equality in every direction
      (1L, ts("2024-01-01 10:20:00"), "after")    // nothing follows
    ).toDF("k", "ts", "tag")
    def run(dir: String, tolUs: Option[Long] = None) =
      graft.ops.AsOf.join(trades, quotes, Seq("k"), "ts", "ts", "q_",
        toleranceUs = tolUs, direction = dir)
        .select($"tag", $"q_px").as[(String, Double)].collect().toMap
    assert(run("forward") == Map("early" -> 110.0, "mid" -> 110.0,
      "late" -> 110.0, "equal" -> 110.0))
    assert(run("nearest") == Map("early" -> 100.0, "mid" -> 100.0,
      "late" -> 110.0, "equal" -> 110.0, "after" -> 110.0))
    // forward tolerance measures distance into the future
    assert(run("forward", Some(5L * 60 * 1000000L)).keySet ==
      Set("mid", "late", "equal"))
    // nearest tolerance bounds BOTH arms
    assert(run("nearest", Some(2L * 60 * 1000000L)) ==
      Map("early" -> 100.0, "late" -> 110.0, "equal" -> 110.0))
    intercept[IllegalArgumentException](run("sideways"))
  }

  // --- similarity ---

  test("cosine and dot products") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .select(Similarity.cosine($"a", $"b").as("c")).as[Double].collect()
    assert(math.abs(df(0) - 1.0) < 1e-12)
    assert(math.abs(df(1)) < 1e-12)
  }

  test("brute-force top-k: self is rank 1; ranks are 1..k") {
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 3 + j).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val res = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      df.filter($"vec_id" < 3), "vec_id", "embedding", k = 5)
    val byQ = res.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 3)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.head.getAs[Long]("neighbor_id") == q) // self most similar
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
    }
  }

  test("randomProject: deterministic, sparse, rank-preserving enough for ANN") {
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 7 + j * 13).toFloat)))
      .toDF("vec_id", "embedding").cache()
    val p = Similarity.randomProject(vecs, "vec_id", "embedding", 16, 64)
    val rows = p.as[(Long, Int, Double)].collect()
    assert(rows.length == 200 * 16)
    // reproducible across invocations and partitionings
    val p2 = Similarity.randomProject(vecs.repartition(7), "vec_id", "embedding", 16, 64)
    assert(p2.as[(Long, Int, Double)].collect().toSet == rows.toSet)
    // a different salt projects into a different space
    val p3 = Similarity.randomProject(vecs, "vec_id", "embedding", 16, 64,
      salt = "other").as[(Long, Int, Double)].collect().toSet
    assert(p3 != rows.toSet)
    // JL sanity: top-1 brute neighbor in projected space agrees with
    // the full-space top-1 for most queries (16 of 64 dims kept)
    val proj = rows.groupBy(_._1).map { case (id, rs) =>
      id -> rs.sortBy(_._2).map(_._3.toFloat)
    }
    val projDf = proj.toSeq.toDF("vec_id", "embedding")
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Similarity.bruteForceTopK(df, "vec_id", "embedding",
        df.filter($"vec_id" < 20), "vec_id", "embedding", k = 2)
        .filter($"rank" === 2) // rank 1 is the query itself
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val full = top1(vecs)
    val reduced = top1(projDf)
    val agree = (0L until 20L).count(q => full.get(q) == reduced.get(q))
    assert(agree >= 12, s"projected top-1 agreement too low: $agree/20")
  }

  test("filtered vector search: payload predicate in the cell scan, no leaks") {
    val vecs = (0 until 400).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 7 + j * 13).toFloat),
        (i % 3).toInt))
      .toDF("vec_id", "embedding", "label").cache()
    val q = vecs.filter($"vec_id" < 5)
    val uri = TestSession.tmpDir("ivffilt")
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", uri,
      nCentroids = 8, payload = Seq("label"))
    val pred = col("label") === 1
    // full probe == filtered brute force, exactly
    val idx = Similarity.ivfIndexTopK(spark, uri, q, "vec_id", "embedding",
      k = 8, nprobe = 8, filter = Some(pred))
    val brute = Similarity.bruteForceTopK(vecs.filter(pred), "vec_id",
      "embedding", q, "vec_id", "embedding", k = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Long)].collect().toSet
    assert(rows(idx) == rows(brute))
    assert(idx.count() == 5 * 8) // k ELIGIBLE rows per query, not fewer
    // inline filtered path agrees at full probe too
    val inline = Similarity.ivfTopK(vecs, "vec_id", "embedding", q,
      "vec_id", "embedding", k = 8, nCentroids = 8, nprobe = 8,
      filter = Some(pred))
    assert(rows(inline) == rows(brute))
    // the payload predicate reaches the parquet scan (pushed filter)
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"),
      plan.take(600))
    // appends must carry the payload; a batch without it refuses
    val batch = Seq((9001L, Array.fill(16)(0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    Similarity.appendToIvfIndex(batch, "vec_id", "embedding", uri)
    val after = Similarity.ivfIndexTopK(spark, uri, q, "vec_id", "embedding",
      k = 8, nprobe = 8, filter = Some(col("label") === 1))
    assert(after.count() == 40)
    intercept[IllegalArgumentException](
      Similarity.appendToIvfIndex(batch.drop("label"), "vec_id", "embedding", uri))
    // rerank path honors the filter as well
    val rr = Similarity.ivfIndexTopK(spark, uri, q, "vec_id", "embedding",
      k = 8, nprobe = 8, rerank = 64, filter = Some(pred))
    assert(rr.join(vecs.filter($"label" =!= 1)
      .select($"vec_id".as("neighbor_id")), Seq("neighbor_id"), "left_semi")
      .count() == 0)
    // compaction rewrites whole rows: payload columns survive the
    // generation flip and filtered search keeps working
    Similarity.compactIvfIndex(spark, uri)
    val afterCompact = Similarity.ivfIndexTopK(spark, uri, q, "vec_id",
      "embedding", k = 8, nprobe = 8, filter = Some(col("label") === 1))
    assert(afterCompact.count() == 40)
  }

  test("persisted IVF index: same results as inline IVF, scan pruned to probed cells") {
    val vecs = (0 until 400).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 7 + j * 13).toFloat)))
      .toDF("vec_id", "embedding").cache()
    val queries = vecs.filter($"vec_id" < 5)
    val uri = TestSession.tmpDir("ivfidx")
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", uri,
      nCentroids = 16, lloydSteps = 2)
    // same deterministic trainer -> identical centroids -> identical results
    val indexed = Similarity.ivfIndexTopK(spark, uri, queries,
      "vec_id", "embedding", k = 10, nprobe = 4)
    val inline = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, nCentroids = 16, nprobe = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Long)].collect().toSet
    assert(rows(indexed) == rows(inline))
    // the probed scan reads strictly fewer cell directories than exist
    val probed = Similarity.indexCentroids(spark, uri)
    assert(probed.size == 16)
    val cells = spark.read.parquet(s"$uri/cells")
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val pruned = filesRead(cells.filter($"centroid_id".isin(0L, 1L)))
    val total = filesRead(cells)
    assert(pruned > 0 && pruned < total,
      s"partition pruning inert: read $pruned of $total files")
  }

  test("IVF re-rank: narrow int8 candidate scan + exact re-rank matches the exact scan") {
    val vecs = (0 until 400).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 7 + j * 13).toFloat)))
      .toDF("vec_id", "embedding").cache()
    val queries = vecs.filter($"vec_id" < 5)
    val uri = TestSession.tmpDir("ivfidx-rr")
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", uri,
      nCentroids = 16, lloydSteps = 2)
    val exact = Similarity.ivfIndexTopK(spark, uri, queries,
      "vec_id", "embedding", k = 10, nprobe = 4)
    val reranked = Similarity.ivfIndexTopK(spark, uri, queries,
      "vec_id", "embedding", k = 10, nprobe = 4, rerank = 30)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Long)].collect().toSet
    assert(rows(reranked) == rows(exact))
    // the candidate-phase scan must be NARROW: reads codes+scale, never
    // the 4x-wider vec column (that's the whole IO point of the layout).
    // (scan nodes sit inside AQE query stages — read them off the
    // executed plan text's ReadSchema entries.)
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(reranked.queryExecution.executedPlan.toString)
      .map(_.group(1)).toList
    assert(schemas.exists(f => f.contains("codes") && !f.contains("vec:")),
      s"no narrow codes-only scan found in: $schemas")
    assert(schemas.exists(f => f.contains("vec:") && !f.contains("codes")),
      s"no vec-only re-rank fetch scan found in: $schemas")
  }

  test("IVF index append: incremental vectors land in cells and are found") {
    val vecs = (0 until 300).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 7 + j * 13).toFloat)))
      .toDF("vec_id", "embedding")
    val uri = TestSession.tmpDir("ivfidx-app")
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", uri,
      nCentroids = 8, lloydSteps = 2)
    // append 100 new vectors from the same distribution
    val extra = (300 until 400).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 7 + j * 13).toFloat)))
      .toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(extra, "vec_id", "embedding", uri)
    // an appended vector queried against the index finds ITSELF rank 1
    // (its cell is probed first: the assignment argmin and the probe
    // ranking use the same centroid distances)
    val q = extra.filter($"vec_id" === 350L)
    val res = Similarity.ivfIndexTopK(spark, uri, q, "vec_id", "embedding",
      k = 3, nprobe = 2).collect().sortBy(_.getAs[Long]("rank"))
    assert(res.head.getAs[Long]("neighbor_id") == 350L, res.toSeq)
    // the full index now holds all 400 vectors; appends live in the
    // INC tier (base cells untouched — bounded-maintenance layout)
    assert(Similarity.readCellsAll(spark, uri).count() == 400)
    assert(spark.read.parquet(Similarity.cellsPath(spark, uri)).count() == 300)
    // recursive: base files sit under centroid_id= partition dirs,
    // inc files are FLAT centroid-sorted files at the tier root
    def filesUnder(path: String) = graft.storage.VFS(spark)
      .lsFilesRecursive(path).count(_.endsWith(".parquet"))
    def cellFiles() = filesUnder(Similarity.cellsPath(spark, uri)) +
      filesUnder(Similarity.cellsIncPath(spark, uri))
    // minor fold first: inc-tier-only maintenance — base generation
    // does not move, inc coalesces, everything still found
    Similarity.appendToIvfIndex(
      (400 until 500).map(i =>
        (i.toLong, Array.tabulate(16)(j => math.cos(i * 11 + j * 5).toFloat)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding", uri)
    val basePathBefore = Similarity.cellsPath(spark, uri)
    val filesBeforeMinor = cellFiles()
    Similarity.minorCompactIvfIndex(spark, uri)
    assert(Similarity.cellsPath(spark, uri) == basePathBefore,
      "minor fold must not touch the base cells generation")
    assert(cellFiles() < filesBeforeMinor,
      s"minor fold must shrink inc files ($filesBeforeMinor -> ${cellFiles()})")
    assert(Similarity.readCellsAll(spark, uri).count() == 500)
    // major compact: folds base ∪ inc into one generation, resets inc;
    // vectors and results intact
    val filesBefore = cellFiles()
    Similarity.compactIvfIndex(spark, uri)
    assert(cellFiles() < filesBefore,
      s"compact must shrink per-cell file count ($filesBefore -> ${cellFiles()})")
    assert(spark.read.parquet(Similarity.cellsPath(spark, uri)).count() == 500)
    assert(filesUnder(Similarity.cellsIncPath(spark, uri)) == 0,
      "major compact must fold the inc tier away")
    val res2 = Similarity.ivfIndexTopK(spark, uri, q, "vec_id", "embedding",
      k = 3, nprobe = 2).collect().sortBy(_.getAs[Long]("rank"))
    assert(res2.head.getAs[Long]("neighbor_id") == 350L)
  }

  test("compactIvfIndex is reader-safe: topK concurrent with and around the flip") {
    val vecs = (0 until 300).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 7 + j * 13).toFloat)))
      .toDF("vec_id", "embedding")
    val uri = TestSession.tmpDir("ivfidx-rs")
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", uri,
      nCentroids = 8, lloydSteps = 2)
    Similarity.appendToIvfIndex(
      (300 until 350).map(i =>
        (i.toLong, Array.tabulate(16)(j => math.sin(i * 7 + j * 13).toFloat)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding", uri)
    val q = vecs.filter($"vec_id" < 3)
    def topk() = Similarity.ivfIndexTopK(spark, uri, q, "vec_id", "embedding",
      k = 5, nprobe = 3).select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val expected = topk()
    val expectedPairs = expected.map { case (qid, nid, _) => (qid, nid) }
    assert(expected.nonEmpty)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    @volatile var stop = false
    val reader = Future {
      var n = 0
      while (!stop) {
        // DOCUMENTED major-compact window: between the base flip and
        // the inc reset a probe may see an appended row in both tiers
        // — a duplicate can displace the tail of the top-k, so ranks
        // can shift for that instant. The invariant that must hold
        // THROUGH the flip: no fabricated neighbors (every returned
        // pair is a true pair) and no read errors. Exact equality is
        // re-asserted after the compact completes.
        val got = topk().map { case (qid, nid, _) => (qid, nid) }
        assert(got.subsetOf(expectedPairs),
          s"concurrent topK fabricated pairs: ${got -- expectedPairs}")
        // duplicates only ADD rows, so every query must still answer —
        // a subset check alone would also pass an empty (failed) read
        assert(got.map(_._1) == expectedPairs.map(_._1),
          s"concurrent topK lost queries: got ${got.map(_._1)}")
        n += 1
      }
      n
    }
    Similarity.compactIvfIndex(spark, uri)
    stop = true
    assert(Await.result(reader, scala.concurrent.duration.Duration("120s")) > 0)
    assert(topk() == expected, "post-compact topK must match exactly")
    // pre-flip reader keeps its (grace) directory across the next flip
    val preResolved = spark.read.parquet(Similarity.cellsPath(spark, uri))
    val nRows = preResolved.count()
    Similarity.compactIvfIndex(spark, uri)
    assert(preResolved.count() == nRows, "pre-flip reader lost its directory")
    assert(topk() == expected)
  }

  test("compactIvfIndex re-split: outgrown geometry re-trains atomically; " +
    "all-cells results exact, hysteresis holds, appends follow the new geometry") {
    val uri = TestSession.tmpDir("ivfidx-resplit")
    def mkVecs(r: Range) = r.map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 7 + j * 13).toFloat)))
      .toDF("vec_id", "embedding")
    // bootstrap-small geometry: 4 cells over 100 vecs (the streaming
    // shape — the index is born before the corpus)
    Similarity.buildIvfIndex(mkVecs(0 until 100), "vec_id", "embedding", uri,
      nCentroids = 4, lloydSteps = 2)
    // the corpus grows 20x past the geometry via appends
    (1 to 4).foreach(w => Similarity.appendToIvfIndex(
      mkVecs(w * 1000 until w * 1000 + 475), "vec_id", "embedding", uri))
    val q = mkVecs(0 until 3)
    def full() = { // nprobe = every cell -> exact, geometry-independent
      val n = Similarity.indexCentroids(spark, uri).size
      Similarity.ivfIndexTopK(spark, uri, q, "vec_id", "embedding",
          k = 5, nprobe = n)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Long)].collect().toSet
    }
    val before = full()
    assert(Similarity.indexCentroids(spark, uri).size == 4)
    // 100 + 4*475 = 2000 rows at target 100 -> 20 cells (>= 2*4 fires)
    Similarity.compactIvfIndex(spark, uri, resplitTargetRows = 100)
    assert(Similarity.indexCentroids(spark, uri).size == 20,
      s"re-split to ${Similarity.indexCentroids(spark, uri).size} cells")
    assert(full() == before, "re-split changed exact (all-cells) results")
    // the geometry rode the generation flip: sidecar lives IN the live dir
    assert(graft.storage.VFS(spark).exists(
      s"${Similarity.cellsPath(spark, uri)}/_centroids.json"),
      "re-split centroids must flip atomically with the cells")
    // appends after the re-split assign by the NEW geometry
    Similarity.appendToIvfIndex(mkVecs(9000 until 9010),
      "vec_id", "embedding", uri)
    assert(Similarity.readCellsAll(spark, uri).count() == 2010)
    val cents = Similarity.indexCentroids(spark, uri)
    val expected = mkVecs(9000 until 9010).select(col("vec_id").as("neighbor_id"),
      Similarity.assignNarrow(col("embedding"), cents).as("e"))
    val mis = spark.read.parquet(Similarity.cellsIncPath(spark, uri))
      .select(col("neighbor_id"), col("centroid_id"))
      .join(expected, "neighbor_id")
      .filter(col("centroid_id") =!= col("e"))
    assert(mis.count() == 0, "append assigned by a retired geometry: " +
      mis.collect().mkString(", "))
    // hysteresis: same target again (2010/100 -> 21 < 2*20) doesn't churn
    Similarity.compactIvfIndex(spark, uri, resplitTargetRows = 100)
    assert(Similarity.indexCentroids(spark, uri).size == 20)
    // fixed-geometry default never re-splits
    Similarity.compactIvfIndex(spark, uri)
    assert(Similarity.indexCentroids(spark, uri).size == 20)
    assert(full().map(p => (p._1, p._2)) == before.map(p => (p._1, p._2)))
  }

  test("IVF top-k recall≥0.6 of brute force at nprobe=4/16") {
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 7 + j * 13).toFloat)))
    val df = vecs.toDF("vec_id", "embedding").cache()
    val queries = df.filter($"vec_id" < 5)
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs(Similarity.bruteForceTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    val ivf = pairs(Similarity.ivfTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, nCentroids = 16, nprobe = 4))
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall")
  }

  // --- product quantization ---

  /** Clustered 64-dim vectors (10 centers + deterministic noise) —
    * the regime PQ is built for; m=8 subspaces of 8 dims. */
  private def pqVecs(n: Int) = (0 until n).map { i =>
    val c = i % 10
    (i.toLong, Array.tabulate(64)(j =>
      (math.sin(c * 17 + j) + 0.05 * math.sin(i * 31 + j * 7)).toFloat))
  }

  test("PQ round-trip: m codes in [0,ksub), clustered data reconstructs") {
    val df = pqVecs(200).toDF("vec_id", "embedding").cache()
    val cb = Similarity.trainPq(df, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb.size == 8 && cb.forall(_.size == 16) &&
      cb.forall(_.forall(_.size == 8)))
    val rt = df
      .withColumn("codes",
        Similarity.pqEncode(Similarity.unitNorm($"embedding"), cb))
      .withColumn("back", Similarity.pqDecode($"codes", cb))
    val codes = rt.select($"codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.size == 8 && c.forall(x => x >= 0 && x < 16)))
    // 10 true clusters vs 16 codes/subspace: reconstruction stays tight
    val worst = rt.select(Similarity.cosine($"embedding", $"back").as("c"))
      .agg(min($"c")).as[Double].head()
    assert(worst > 0.98, s"worst reconstruction cosine $worst")
  }

  test("PQ top-k: planted duplicate surfaces; full rerank == brute force") {
    val base = pqVecs(200).toDF("vec_id", "embedding").cache()
    val queries = base.filter($"vec_id" < 5)
    val planted = queries.select(($"vec_id" + 100000L).as("vec_id"),
      $"embedding")
    val corpus = base.unionByName(planted).cache()
    // pure ADC: within a tight cluster all members share codes, so the
    // exact duplicate is indistinguishable from its ~20 cluster
    // siblings — PQ's documented resolution limit (hence rerank). The
    // correct claim AT PQ resolution: every ADC hit comes from the
    // query's true cluster (i % 10), never from another cluster.
    val adc = Similarity.pqTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
    adc.select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .foreach { case (q, n) =>
        assert(n % 100000L % 10L == q % 10L,
          s"ADC hit $n for query $q is from the wrong cluster")
      }
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
    // rerank over every candidate = exact brute force, bit-for-bit —
    // which also means the planted duplicate lands at rank <= 2
    val rr = Similarity.pqTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, rerank = 1000)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Long)].collect().toSet
    assert(rows(rr) == rows(brute))
    val byQ = rr.collect().groupBy(_.getAs[Long]("query_id"))
    (0L until 5L).foreach { q =>
      val dup = byQ(q).find(_.getAs[Long]("neighbor_id") == q + 100000L)
      assert(dup.exists(_.getAs[Long]("rank") <= 2L),
        s"planted dup of $q not in reranked top-2")
    }
  }

  test("persisted PQ index: codes-only scan, equals inline ADC") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val corpus = pqVecs(300).toDF("vec_id", "embedding").cache()
    val queries = corpus.filter($"vec_id" < 4)
    Similarity.buildPqIndex(corpus, "vec_id", "embedding", dir)
    // the index stores ids + codes ONLY (the 32x memory cut)
    val stored = spark.read.parquet(s"$dir/codes")
    assert(stored.columns.toSet == Set("neighbor_id", "codes"))
    val cb = Similarity.pqCodebook(spark, dir)
    val inline = Similarity.pqTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 8, codebookOpt = Some(cb))
    val idx = Similarity.pqIndexTopK(spark, dir, queries,
      "vec_id", "embedding", k = 8)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Long)].collect().toSet
    assert(rows(idx) == rows(inline))
  }

  test("PQ index append + compact: fixed-codebook parity, reader-safe flip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-app").toString
    val first = pqVecs(200).toDF("vec_id", "embedding").cache()
    val rest = pqVecs(300).toDF("vec_id", "embedding")
      .filter($"vec_id" >= 200).cache()
    Similarity.buildPqIndex(first, "vec_id", "embedding", dir,
      m = 8, ksub = 16)
    Similarity.appendToPqIndex(rest, "vec_id", "embedding", dir)
    val q = first.filter($"vec_id" < 3)
    // appended index == inline ADC over the UNION with the SAME codebook
    val cb = Similarity.pqCodebook(spark, dir)
    val union = first.unionByName(rest)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Long)].collect().toSet
    val expected = rows(Similarity.pqTopK(union, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 8, codebookOpt = Some(cb)))
    def probe() = rows(Similarity.pqIndexTopK(spark, dir, q,
      "vec_id", "embedding", k = 8))
    assert(probe() == expected)
    // compact flips a generation; concurrent + around-the-flip probes
    // never diverge, and a pre-flip reader keeps its grace directory
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    @volatile var stop = false
    val reader = Future {
      var n = 0
      while (!stop) { assert(probe() == expected, "concurrent probe diverged"); n += 1 }
      n
    }
    Similarity.compactPqIndex(spark, dir)
    stop = true
    assert(Await.result(reader, scala.concurrent.duration.Duration("120s")) > 0)
    val preResolved = spark.read.parquet(Similarity.pqCodesPath(spark, dir))
    val nRows = preResolved.count()
    Similarity.compactPqIndex(spark, dir)
    assert(preResolved.count() == nRows, "pre-flip reader lost its directory")
    assert(probe() == expected)
  }

  test("IVF+PQ index: probe-all+rerank == brute force; probes prune cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val corpus = pqVecs(400).toDF("vec_id", "embedding").cache()
    val queries = corpus.filter($"vec_id" < 4)
    Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding", dir,
      nCentroids = 8, m = 8, ksub = 16)
    // index stores codes only, partitioned by cell
    val stored = spark.read.parquet(s"$dir/cells")
    assert(stored.columns.toSet == Set("neighbor_id", "codes", "centroid_id"))
    // probe-all + rerank-everything = exact brute force
    val all = Similarity.ivfPqTopK(spark, dir, queries, "vec_id", "embedding",
      k = 6, nprobe = 8, rerankFrom = Some((corpus, "vec_id", "embedding")),
      rerank = 1000)
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 6)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Long)].collect().toSet
    assert(rows(all) == rows(brute))
    // the cell filter statically prunes the codes scan to probed dirs
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val pruned = filesRead(stored.filter($"centroid_id".isin(0L, 1L)))
    val total = filesRead(stored)
    assert(pruned > 0 && pruned < total,
      s"partition pruning inert: read $pruned of $total files")
    // and the narrow-probe path still returns k ranked rows per query
    val narrow = Similarity.ivfPqTopK(spark, dir, queries,
      "vec_id", "embedding", k = 6, nprobe = 2)
    assert(narrow.groupBy("query_id").count()
      .as[(Long, Long)].collect().forall(_._2 == 6))
  }

  test("semantic near-dups: planted duplicates found within cells, exact-cosine verified") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val planted = e.withColumn("vec_id", $"vec_id" + 100000L)
    val corpus = e.unionByName(planted)
    val pairs = Dedup.semanticNearDups(corpus, "vec_id", "embedding",
      nClusters = 8, minCosine = 0.999)
    val found = pairs.select("a", "b").as[(Long, Long)].collect().toSet
    val nVecs = e.count()
    // identical vectors share a deterministic cell -> every planted pair surfaces
    val missed = (0L until nVecs).count(i => !found.contains((i, i + 100000L)))
    assert(missed == 0, s"$missed planted pairs missed")
    // every emitted pair really is above threshold (exact verify built in)
    assert(pairs.filter($"cosine" < 0.999).count() == 0)
    // drop keeps one survivor per duplicate component
    val survivors = Dedup.dropSemanticDups(corpus, "vec_id", "embedding",
      nClusters = 8, minCosine = 0.999)
    assert(survivors.count() == nVecs)
    assert(survivors.filter($"vec_id" >= 100000L).count() == 0, "min-id survivor rule")
  }

  test("semantic near-dups: cell cap drops oversized cells, not the rest") {
    // 40 identical vectors (one degenerate cell) + 2 distinct near-pairs
    val deg = (0 until 40).map(i => (i.toLong, Array.fill(8)(1.0f)))
    val pair = Seq((100L, Array.tabulate(8)(j => (j + 1).toFloat)),
      (101L, Array.tabulate(8)(j => (j + 1).toFloat)))
    val df = (deg ++ pair).toDF("vec_id", "embedding")
    val pairs = Dedup.semanticNearDups(df, "vec_id", "embedding",
      nClusters = 4, minCosine = 0.999, maxCell = 10)
    val found = pairs.select("a", "b").as[(Long, Long)].collect().toSet
    assert(found.contains((100L, 101L)), "small-cell pair survives the cap")
    assert(!found.exists(p => p._1 < 40 && p._2 < 40), "capped cell emits no pairs")
  }

  test("crossNearDups: finds planted cross pairs, never within-side pairs") {
    val salad = (seed: Int) => (0 until 30).map(i =>
      s"w${(seed * 31 + i * 17) % 97}x${(seed * 13 + i * 7) % 89}").mkString(" ")
    val corpus = (Seq((1L, salad(1)), (2L, salad(2)), (3L, salad(3))) ++
      Seq((10L, salad(42)), (11L, salad(42)))) // within-corpus exact dup pair
      .toDF("doc_id", "text")
    val ref = Seq(
      (100L, "  " + salad(1).toUpperCase.replace(" ", "   ")), // mangled copy of doc 1
      (101L, salad(77))) // unrelated
      .toDF("ref_id", "text")
    val got = Dedup.crossNearDups(corpus, "doc_id", "text",
      ref, "ref_id", "text", threshold = 0.7)
      .select($"corpus_id", $"ref_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 100L, 1.0)),
      s"expected exactly the planted cross pair, got $got")
  }

  test("crossBucketedPairs: per-side caps drop the bucket; cross-only output") {
    val rows = ((0 until 5).map(i => (i.toLong, 0.toByte)) ++
      Seq((100L, 1.toByte))).toDF("__id", "__side")
      .withColumn("__band", lit(0)).withColumn("__bucket", lit(7L))
    val ok = Dedup.crossBucketedPairs(rows, maxBucket = 8)
      .as[(Long, Long)].collect().toSet
    assert(ok == (0 until 5).map(i => (i.toLong, 100L)).toSet)
    assert(ok.forall(_._2 == 100L), "side-0 ids only ever pair with side-1 ids")
    val capped = Dedup.crossBucketedPairs(rows, maxBucket = 4).count()
    assert(capped == 0L, "corpus side over cap drops the whole bucket")
  }

  test("topKPerKey primitive fast path: identical to the generic path incl. ties") {
    val rnd = new scala.util.Random(7)
    // coarse score grid -> heavy ties, so the (score desc, id asc)
    // tie rule is actually exercised
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(20).toLong, i.toLong, math.floor(rnd.nextDouble() * 20) / 20.0)
    }
    val df = rows.toDF("k", "id", "s")
    val prim = Similarity.topKPerKey(df, "k", "id", "s", 7)
      .select($"k", $"id", $"s", $"rank").as[(Long, Long, Double, Long)]
      .collect().toSet
    // an int key disqualifies the primitive path -> generic Row path
    val gen = Similarity.topKPerKey(
        df.withColumn("k", $"k".cast("int")), "k", "id", "s", 7)
      .select($"k".cast("long"), $"id", $"s", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(prim == gen, "fast path must keep the exact same ranked set")
    assert(prim.size == 20 * 7)
  }

  test("semanticNearDups with coarseProbe: exact duplicates still structural") {
    val base = (0 until 120).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 11 + j * 5).toFloat)))
    val planted = base.filter(_._1 % 10 == 0)
      .map { case (id, v) => (id + 1000L, v) }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Dedup.semanticNearDups(df, "vec_id", "embedding",
      nClusters = 12, minCosine = 0.999, coarseProbe = Some((4, 1)))
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    // identical vectors share any deterministic assignment, so every
    // planted pair surfaces even at the stingiest probe depth
    for (id <- base.map(_._1).filter(_ % 10 == 0))
      assert(pairs.contains((id, id + 1000L)), s"planted pair $id missing")
  }

  test("hierarchical assignment: probe-all degenerates to EXACTLY flat") {
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 13 + j * 7).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(vecs, "vec_id", "embedding",
      nCentroids = 24, lloydSteps = 1, trainPerCentroid = 4)
    val (coarse, members) = Similarity.trainCoarse(cents, 6, spark)
    assert(members.flatten.sorted == (0 until cents.size).toList,
      "every fine centroid lives in exactly one group")
    val got = vecs.select(
      Similarity.assignNarrow($"embedding", cents).as("flat"),
      Similarity.assignHierarchical($"embedding", cents, coarse, members,
        nprobe = coarse.size).as("hier"))
    assert(got.filter($"flat" =!= $"hier").count() == 0L,
      "probing every coarse group must reproduce the flat argmin bit-exactly")
    // narrow plan: no exchange anywhere in the assignment
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must stay narrow:\n$plan")
  }

  // --- edit-distance near-dup / fuzzy join (PassJoin pigeonhole) ---

  /** Brute-force truth: all id pairs a < b with levenshtein <= k. */
  private def editBrute(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val l = df.filter($"t".isNotNull).select($"id".as("ia"), $"t".as("ta"))
    val r = df.filter($"t".isNotNull).select($"id".as("ib"), $"t".as("tb"))
    l.crossJoin(r).filter($"ia" < $"ib")
      .select($"ia".as("a"), $"ib".as("b"),
        levenshtein($"ta", $"tb", k).as("dist"))
      .filter($"dist" >= 0)
      .as[(Long, Long, Int)].collect().toSet
  }

  test("editNearDups: handpicked dups, near-misses, shorts, empty, nulls") {
    val df = Seq(
      (1L, "red widget"), (2L, "red widget"),   // exact dup -> dist 0
      (3L, "red widgets"),                      // dist 1 of 1/2
      (4L, "red wadgets"),                      // dist 1 of 3, dist 2 of 1/2
      (5L, "blue bolt"), (6L, "blue boat"),     // one substitution (l -> a)
      (7L, "xz"), (8L, "x"), (9L, ""),          // shorts at/below k -> residue arm
      (10L, "completely unrelated phrase"),
      (11L, null.asInstanceOf[String])          // ignored
    ).toDF("id", "t")
    val got = Dedup.editNearDups(df, "id", "t", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val want = editBrute(df, 2)
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.contains((1L, 2L, 0)) && want.contains((1L, 3L, 1)) &&
      want.contains((3L, 4L, 1)) && want.contains((5L, 6L, 1)) &&
      want.contains((7L, 8L, 1)) && want.contains((8L, 9L, 1)))
    assert(!want.exists(p => p._1 == 10L || p._2 == 10L || p._2 == 11L))
  }

  test("editNearDups: randomized exactness vs brute force across length boundaries") {
    // small alphabet + lengths straddling k+1 stresses every pigeonhole
    // edge: empty segments, residue arm, shift clamping, length windows
    val rnd = new scala.util.Random(42)
    for (k <- Seq(1, 2, 3)) {
      val strs = (0 until 80).map { i =>
        val len = rnd.nextInt(9) // 0..8 spans [0, k], [k+1, 2k], beyond
        (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
      }
      val df = strs.toDF("id", "t")
      val got = Dedup.editNearDups(df, "id", "t", maxDist = k)
        .as[(Long, Long, Int)].collect()
      assert(got.length == got.toSet.size, s"k=$k: duplicate pairs emitted")
      assert(got.toSet == editBrute(df, k), s"k=$k mismatch")
    }
  }

  test("editJoin: cross-table linkage matches brute force, keeps exact matches") {
    val left = Seq((1L, "alice johnson"), (2L, "bob smith"), (3L, "carol white"),
      (4L, "dave")).toDF("lid", "name")
    val right = Seq((10L, "alice jonson"), (11L, "bob smith"), (12L, "karol whyte"),
      (13L, "unrelated entirely"), (14L, "daves")).toDF("rid", "name")
    val got = Dedup.editJoin(left, "lid", "name", right, "rid", "name", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val want = left.select($"lid", $"name".as("ln"))
      .crossJoin(right.select($"rid", $"name".as("rn")))
      .select($"lid", $"rid", levenshtein($"ln", $"rn", 2).as("dist"))
      .filter($"dist" >= 0).as[(Long, Long, Int)].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.contains((1L, 10L, 1)) && want.contains((2L, 11L, 0)) &&
      want.contains((3L, 12L, 2)) && want.contains((4L, 14L, 1)))
  }

  test("editJoin: randomized two-table exactness vs brute force") {
    // independent left/right corpora over a small alphabet, lengths
    // straddling k+1 on BOTH sides — exercises the asymmetric probe/
    // index direction and the short-indexed residue arm cross-table
    val rnd = new scala.util.Random(7)
    def mk(n: Int) = (0 until n).map { i =>
      val len = rnd.nextInt(8)
      (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    }
    for (k <- Seq(1, 2)) {
      val left = mk(50).toDF("lid", "lt")
      val right = mk(60).toDF("rid", "rt")
      val got = Dedup.editJoin(left, "lid", "lt", right, "rid", "rt", k)
        .as[(Long, Long, Int)].collect()
      assert(got.length == got.toSet.size, s"k=$k: duplicate pairs")
      val want = left.crossJoin(right)
        .select($"lid", $"rid", levenshtein($"lt", $"rt", k).as("dist"))
        .filter($"dist" >= 0).as[(Long, Long, Int)].collect().toSet
      assert(got.toSet == want, s"k=$k mismatch")
    }
  }

  test("editJoinBest: per-left argmin with deterministic rid ties") {
    val left = Seq((1L, "red widget"), (2L, "blue bolt"), (3L, "nothing alike")).toDF("lid", "n")
    val right = Seq((10L, "red widgets"), (11L, "red widget"), (12L, "red widget"),
      (13L, "blue boat")).toDF("rid", "n")
    val got = Dedup.editJoinBest(left, "lid", "n", right, "rid", "n", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // lid 1: exact matches at rid 11 and 12 -> lowest rid wins
    // lid 2: only "blue boat" (dist 1); lid 3: no match -> absent
    assert(got == Set((1L, 11L, 0), (2L, 13L, 1)))
  }

  test("dropEditDups: typo copies die, survivors pairwise beyond maxDist") {
    val df = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha betas"),
      (4L, "gamma delta"), (5L, "gamma celta"), (6L, "unrelated thing")).toDF("id", "t")
    val kept = Dedup.dropEditDups(df, "id", "t", maxDist = 2)
      .select($"id").as[Long].collect().toSet
    // components: {1,2,3} -> 1, {4,5} -> 4, {6} -> 6
    assert(kept == Set(1L, 4L, 6L))
    // survivors of distinct components are pairwise > maxDist
    val sv = df.filter($"id".isin(kept.toSeq: _*))
    assert(Dedup.editNearDups(sv, "id", "t", maxDist = 2).count() == 0)
  }

  test("editNearDups: one candidate equi-join, no cross join at scale") {
    val df = (0L until 200L).map(i => (i, s"name-$i-suffix")).toDF("id", "t")
    val plan = Dedup.editNearDups(df, "id", "t", 2).queryExecution.executedPlan.toString
    // the only permissible non-equi path is the broadcast residue arm
    // over strings shorter than k+1 chars (none here, but the operator
    // plans it); a CartesianProduct would mean the pigeonhole regressed
    assert(!plan.contains("CartesianProduct"), s"cross join leaked:\n$plan")
  }

  // --- interval (range) join ---

  test("rangeJoin: boundary semantics and randomized parity with the naive join") {
    // microsecond timestamps straddling bin boundaries (width 100),
    // including pre-epoch negatives (floorDiv must be a true floor),
    // empty intervals, and ts-at-start / ts-at-end boundary hits
    val rnd = new scala.util.Random(19)
    val left = (0 until 200).map { i =>
      (i.toLong, (i % 7).toLong, rnd.between(-300L, 1300L))
    }.toDF("eid", "k", "tus")
      .select($"eid", $"k", timestamp_micros($"tus").as("t"))
    val right = (0 until 80).map { j =>
      val s = rnd.between(-350L, 1200L)
      (j.toLong + 1000, (j % 7).toLong, s, s + rnd.between(0L, 400L))
    }.toDF("wid", "k", "sus", "eus")
      .select($"wid", $"k", timestamp_micros($"sus").as("s"),
        timestamp_micros($"eus").as("e"))
    val got = graft.ops.AsOf.rangeJoin(left, right, Seq("k"), "t", "s", "e",
        "w_", binWidthUs = 100L)
      .select($"eid", $"w_wid").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    val want = left.join(right, Seq("k"))
      .filter($"t" >= $"s" && $"t" < $"e")
      .select($"eid", $"wid").as[(Long, Long)].collect().toSet
    assert(got.toSet == want,
      s"missing=${want -- got.toSet} extra=${got.toSet -- want}")
  }

  test("overlapJoin: randomized parity, touching intervals excluded") {
    val rnd = new scala.util.Random(23)
    def iv(n: Int, idBase: Long) = (0 until n).map { i =>
      val s = rnd.between(-300L, 1200L)
      (idBase + i, (i % 5).toLong, s, s + rnd.between(0L, 350L)) // incl. empty
    }
    val left = iv(120, 0L).toDF("lid", "k", "sus", "eus")
      .select($"lid", $"k", timestamp_micros($"sus").as("ls"),
        timestamp_micros($"eus").as("le"))
    val right = iv(90, 1000L).toDF("rid", "k", "sus", "eus")
      .select($"rid", $"k", timestamp_micros($"sus").as("rs"),
        timestamp_micros($"eus").as("re"))
    val got = graft.ops.AsOf.overlapJoin(left, right, Seq("k"),
        "ls", "le", "rs", "re", "w_", binWidthUs = 100L)
      .select($"lid", $"w_rid").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    val want = left.join(right, Seq("k"))
      .filter($"ls" < $"re" && $"rs" < $"le" && $"le" > $"ls" && $"re" > $"rs")
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(got.toSet == want,
      s"missing=${want -- got.toSet} extra=${got.toSet -- want}")
    // touching intervals do not overlap (half-open semantics)
    val a = Seq((1L, 1L, 0L, 100L)).toDF("lid", "k", "sus", "eus")
      .select($"lid", $"k", timestamp_micros($"sus").as("ls"),
        timestamp_micros($"eus").as("le"))
    val b = Seq((2L, 1L, 100L, 200L)).toDF("rid", "k", "sus", "eus")
      .select($"rid", $"k", timestamp_micros($"sus").as("rs"),
        timestamp_micros($"eus").as("re"))
    assert(graft.ops.AsOf.overlapJoin(a, b, Seq("k"),
      "ls", "le", "rs", "re", "w_", binWidthUs = 64L).count() == 0)
  }

  test("interval joins: a sentinel-wide interval fails LOUDLY at the bin cap") {
    // the open-interval trap: an unclamped 9999-12-31 end would explode
    // to ~70M bins per row — the cap must fail with the fix in the
    // message, not OOM an executor
    val left = Seq((1L, 1L, 500L)).toDF("eid", "k", "tus")
      .select($"eid", $"k", timestamp_micros($"tus").as("t"))
    val wide = Seq((9L, 1L, 0L, 5000L)).toDF("wid", "k", "sus", "eus")
      .select($"wid", $"k", timestamp_micros($"sus").as("s"),
        timestamp_micros($"eus").as("e"))
    val ex = intercept[Exception] {
      graft.ops.AsOf.rangeJoin(left, wide, Seq("k"), "t", "s", "e", "w_",
        binWidthUs = 100L, maxBinsPerInterval = 10L).count()
    }
    assert(ex.getMessage.contains("maxBinsPerInterval"),
      s"expected the bin-cap message, got: ${ex.getMessage}")
    // same guard on overlapJoin's LEFT side (its intervals explode too)
    val ex2 = intercept[Exception] {
      graft.ops.AsOf.overlapJoin(wide.select($"wid", $"k",
          $"s".as("ls"), $"e".as("le")),
        left.select($"eid", $"k", $"t".as("rs"),
          timestamp_micros(lit(600L)).as("re")),
        Seq("k"), "ls", "le", "rs", "re", "w_",
        binWidthUs = 100L, maxBinsPerInterval = 10L).count()
    }
    assert(ex2.getMessage.contains("maxBinsPerInterval"))
    // at-cap (exactly maxBins bins) still runs: 50 bins with cap 50
    assert(graft.ops.AsOf.rangeJoin(left, wide, Seq("k"), "t", "s", "e",
      "w_", binWidthUs = 100L, maxBinsPerInterval = 50L).count() == 1L)
  }

  test("rangeJoin: TIMESTAMP_NTZ stays wall-clock-exact across a DST gap") {
    // NTZ is a wall clock; routing it through the session timezone is
    // non-monotonic across spring-forward (two wall times collapse to
    // one instant, silently emptying intervals). Pin the wall-clock
    // path under a DST zone: 2026-03-08 02:00-03:00 does not exist in
    // America/New_York, and intervals spanning it must still match.
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    spark.conf.set(tzKey, "America/New_York")
    try {
      val left = Seq((1L, 9L, "2026-03-08 03:10:00"), (2L, 9L, "2026-03-08 02:30:00"))
        .toDF("eid", "k", "ts")
        .select($"eid", $"k", to_timestamp_ntz($"ts").as("t"))
      val right = Seq((10L, 9L, "2026-03-08 02:20:00", "2026-03-08 03:20:00"))
        .toDF("wid", "k", "ss", "es")
        .select($"wid", $"k", to_timestamp_ntz($"ss").as("s"),
          to_timestamp_ntz($"es").as("e"))
      val got = graft.ops.AsOf.rangeJoin(left, right, Seq("k"), "t", "s", "e",
          "w_", binWidthUs = 600L * 1000000L)
        .select($"eid", $"w_wid").as[(Long, Long)].collect().toSet
      // wall-clock truth: NTZ comparisons are timezone-free
      val want = left.join(right, Seq("k"))
        .filter($"t" >= $"s" && $"t" < $"e")
        .select($"eid", $"wid").as[(Long, Long)].collect().toSet
      assert(want == Set((1L, 10L), (2L, 10L)), s"naive truth surprised: $want")
      assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    } finally spark.conf.set(tzKey, saved)
  }

  // --- multi-phrase exact scan (Aho-Corasick) ---

  test("phraseMatches: overlaps, nested phrases, repeats, null and empty text") {
    val docs = Seq(
      (1L, "ababa"),                    // overlapping "aba" occurrences
      (2L, "the abc and ab end"),       // "ab" is a prefix of "abc"
      (3L, "xyz xyz xyz"),              // repeated phrase reports once
      (4L, ""),                         // empty text matches nothing
      (5L, null.asInstanceOf[String]),  // ignored
      (6L, "ends with aba")             // match flush at text end
    ).toDF("doc_id", "text")
    val phrases = Seq("aba", "ab", "abc", "xyz", "missing")
    val got = graft.ops.TextAnalysis
      .phraseMatches(docs, "doc_id", "text", phrases)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "aba"), (1L, "ab"), (2L, "ab"), (2L, "abc"),
      (3L, "xyz"), (6L, "ab"), (6L, "aba")))
  }

  test("phraseMatches: null and non-castable ids are skipped like null texts") {
    // string ids: castable ones keep matching, garbage ones skip
    // quietly instead of NPE-ing the tuple encoder mid-job
    val docs = Seq(("7", "has xyz inside"), (null.asInstanceOf[String], "xyz"),
      ("not-a-number", "xyz")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis
      .phraseMatches(docs, "doc_id", "text", Seq("xyz"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((7L, "xyz")))
  }

  test("phrase automaton: per-executor content-keyed cache, framed keys") {
    val ps = Array("alpha", "beta")
    val k = graft.ops.TextAnalysis.phraseSetKey(ps)
    val a = graft.ops.TextAnalysis.cachedAutomaton(k, ps)
    // not a flake under GC pressure: `a` is strongly held here, and a
    // SoftReference whose referent is strongly reachable is never
    // cleared — the by-name error can only fire on a real cache bug
    val b = graft.ops.TextAnalysis.cachedAutomaton(k,
      sys.error("cache hit must not rebuild"))
    assert(a eq b, "same content key must return the cached automaton")
    // length-framed hashing: phrase lists with equal concatenations
    // are DIFFERENT sets and must key differently
    assert(graft.ops.TextAnalysis.phraseSetKey(Array("ab", "c")) !=
      graft.ops.TextAnalysis.phraseSetKey(Array("a", "bc")))
  }

  test("phrase automaton: bound eviction is least-recently-used") {
    import graft.ops.TextAnalysis.{cachedAutomaton, clearAutomatonCache, phraseSetKey}
    clearAutomatonCache()
    def put(s: String) = cachedAutomaton(phraseSetKey(Array(s)), Array(s))
    // hold strong refs to the ORIGINAL builds for the whole test (a
    // strongly-held referent is never soft-cleared), and probe with the
    // by-name sys.error argument WITHOUT a preceding put — a put would
    // silently rebuild an evicted entry and mask a wrong eviction choice
    def assertCached(s: String, expect: graft.ops.TextAnalysis.AhoCorasick) = {
      val again = cachedAutomaton(phraseSetKey(Array(s)),
        sys.error(s"'$s' was evicted: cache hit must not rebuild"))
      assert(expect eq again)
    }
    val builds = Seq("k1", "k2", "k3", "k4").map(s => s -> put(s)).toMap
    assert(put("k2") eq builds("k2")) // refresh k2 — k1 is now the LRU entry
    put("k5")      // overflow (bound 4): must evict k1, NOT the hot k2
    assertCached("k2", builds("k2"))
    assertCached("k3", builds("k3"))
    assertCached("k4", builds("k4"))
    // k1 must be gone (rebuild fires — by-name phrases are evaluated)
    var rebuilt = false
    cachedAutomaton(phraseSetKey(Array("k1")), { rebuilt = true; Array("k1") })
    assert(rebuilt, "LRU entry k1 should have been evicted")
    clearAutomatonCache()
  }

  test("phraseMatches: randomized parity with per-phrase contains") {
    val rnd = new scala.util.Random(11)
    def s(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val docs = (0 until 60).map(i => (i.toLong, s(rnd.nextInt(30)))).toDF("doc_id", "text")
    val phrases = (0 until 25).map(_ => s(1 + rnd.nextInt(5))).distinct
    val got = graft.ops.TextAnalysis
      .phraseMatches(docs, "doc_id", "text", phrases)
      .as[(Long, String)].collect()
    assert(got.length == got.toSet.size, "duplicate (doc, phrase) rows")
    val want = docs.crossJoin(phrases.toDF("phrase"))
      .filter(expr("contains(text, phrase)"))
      .select($"doc_id", $"phrase").as[(Long, String)].collect().toSet
    assert(got.toSet == want, s"missing=${want -- got.toSet} extra=${got.toSet -- want}")
  }
}
