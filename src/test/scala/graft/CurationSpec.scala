package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs emails, IPv4s, and phone numbers, leaves prose") {
    val df = Seq(
      "mail a.b+c@sub.example.org now",
      "host 192.168.0.17 port 80",
      "call 555-123-4567 or 555.987.6543",
      "version 1.2 is not an IP, 12-34-5678 is not a phone",
      "clean text stays clean").toDF("t")
      .select(Curation.redactPii($"t").as("r"))
    assert(df.as[String].collect().toSeq == Seq(
      "mail <EMAIL> now",
      "host <IP> port 80",
      "call <PHONE> or <PHONE>",
      "version 1.2 is not an IP, 12-34-5678 is not a phone",
      "clean text stays clean"))
  }

  test("capPerKey keeps the n lowest-ordered rows per key") {
    val df = (1 to 30).map(i => (s"k${i % 3}", i)).toDF("k", "v")
    val capped = Curation.capPerKey(df, $"k", $"v", 4)
    assert(capped.count() == 12)
    val k0 = capped.filter($"k" === "k0").select($"v").as[Int].collect().sorted
    assert(k0.toSeq == Seq(3, 6, 9, 12)) // the 4 smallest v for k0
    // cap larger than group size keeps everything
    assert(Curation.capPerKey(df, $"k", $"v", 100).count() == 30)
  }

  test("repetitionFeatures measures the duplicate-token fraction") {
    val f = Seq("a b c d", "a a a a", "x y x y").toDF("t")
      .select(Curation.repetitionFeatures($"t").as("f"))
      .select($"f.n_tokens", $"f.n_distinct", $"f.dup_ratio")
      .as[(Long, Long, Double)].collect().toSeq
    assert(f == Seq((4L, 4L, 0.0), (4L, 1L, 0.75), (4L, 2L, 0.5)))
  }

  test("contamination finds docs sharing an 8-gram with the benchmark") {
    val words = (1 to 40).map(i => s"w$i")
    val doc = (id: Long, toks: Seq[String]) => (id, toks.mkString(" "))
    val corpus = Seq(
      doc(1L, words.take(20)),              // contains benchmark span
      doc(2L, words.slice(20, 40)),         // disjoint
      doc(3L, words.slice(5, 25)),          // overlaps span 5..12 partially
      doc(4L, Seq("tiny", "doc"))           // shorter than one gram
    ).toDF("doc_id", "text")
    // benchmark = tokens w3..w12 (two 8-grams of doc 1's prefix)
    val bench = Seq(words.slice(2, 12).mkString(" ")).toDF("snippet")
    val hits = Curation.contamination(corpus, "doc_id", "text", bench, "snippet")
      .as[(Long, Long)].collect().toMap
    // doc1 holds all 3 benchmark 8-grams (w3..w10, w4..w11, w5..w12);
    // doc3 starts at w6 so it holds none of them fully... except w5..w12
    // needs w5 — doc3 has w6..w25, so no full benchmark gram: absent.
    assert(hits == Map(1L -> 3L))
    // planting the span inside doc2 makes it contaminated too
    val corpus2 = corpus.union(Seq(doc(5L,
      Seq("pad") ++ words.slice(2, 12) ++ Seq("tail"))).toDF("doc_id", "text"))
    val hits2 = Curation.contamination(corpus2, "doc_id", "text", bench, "snippet")
      .as[(Long, Long)].collect().toMap
    assert(hits2 == Map(1L -> 3L, 5L -> 3L))
  }

  test("contamination: edge \\t\\n whitespace shifts tokens consistently") {
    // Spark's trim strips spaces only, so a trailing \n yields a
    // trailing EMPTY token and a leading \t a leading one — gram
    // windows must stay consistent between a corpus doc and a
    // benchmark snippet carrying the same edge whitespace (the kernel
    // and tokens() agree on the empty edge tokens)
    val words = (1 to 10).map(i => s"w$i")
    val corpus = Seq(
      (1L, words.mkString(" ") + "\n"),  // trailing empty token
      (2L, "\t" + words.mkString(" ")),  // leading empty token
      (3L, words.reverse.mkString(" "))).toDF("doc_id", "text")
    // snippet = the same 10 words + trailing \n: its windows include
    // the ["w4".."w10", ""] gram, which only doc 1 shares
    val bench = Seq(words.mkString(" ") + "\n").toDF("snippet")
    val hits = Curation.contamination(corpus, "doc_id", "text", bench, "snippet")
      .as[(Long, Long)].collect().toMap
    // doc1 tokens = [w1..w10, ""] -> 4 8-grams, all shared with the
    // identical snippet; doc2 tokens = ["", w1..w10] -> its windows
    // shift by the leading empty, sharing only the pure-word grams
    // [w1..w8], [w2..w9], [w3..w10] (3 of the snippet's 4)
    assert(hits == Map(1L -> 4L, 2L -> 3L), hits.toString)
  }

  test("gopherRules: each rule trips on its own violation, clean prose keeps") {
    import graft.ops.TextAnalysis
    // 60 words of plain prose with stopwords: passes everything
    val good = (("the quick brown fox jumps over the lazy dog and " * 6).trim)
    val cases = Seq(
      ("good", good),
      ("short", "the and one two three"),                       // word_count
      ("longwords", Array.fill(60)("pneumonoultramicroscopic").mkString(" ")
        + " the and"),                                          // mean_word_len
      ("symbols", good + " " + Array.fill(20)("#").mkString(" ")), // symbol_ratio
      ("bullets", (Seq.fill(10)("- " + good).mkString("\n"))),   // bullet_lines
      ("ellipses", (Seq.fill(10)(good + "...").mkString("\n"))), // ellipsis_lines
      ("numbers", good + " " + (1 to 60).map(_.toString).mkString(" ")), // alpha_words
      ("salad", Array.tabulate(60)(i => s"zq$i").mkString(" "))  // stopwords
    ).toDF("name", "text")
    val out = cases.select($"name", TextAnalysis.gopherRules($"text").as("g"))
      .select($"name", $"g.keep", $"g.ok_word_count", $"g.ok_mean_word_len",
        $"g.ok_symbol_ratio", $"g.ok_bullet_lines", $"g.ok_ellipsis_lines",
        $"g.ok_alpha_words", $"g.ok_stopwords")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("good").getBoolean(1), out("good"))
    def failsOnly(name: String, idx: Int): Unit = {
      val r = out(name)
      assert(!r.getBoolean(1), s"$name must not keep")
      assert(!r.getBoolean(idx), s"$name must fail field $idx")
    }
    failsOnly("short", 2)
    failsOnly("longwords", 3)
    failsOnly("symbols", 4)
    failsOnly("bullets", 5)
    failsOnly("ellipses", 6)
    failsOnly("numbers", 7)
    failsOnly("salad", 8)
  }

  test("fixMojibake repairs double-encoded text, leaves honest text alone") {
    def mojibake(clean: String): String = {
      // UTF-8 bytes viewed through cp1252 (the classic corruption)
      val cp = Map(0x80 -> 0x20AC, 0x93 -> 0x201C, 0x94 -> 0x201D,
        0x99 -> 0x2122, 0x91 -> 0x2018, 0x92 -> 0x2019)
      clean.getBytes("UTF-8").map { b =>
        cp.getOrElse(b & 0xFF, b & 0xFF).toChar
      }.mkString
    }
    val clean = Seq(
      "café résumé",          // latin-1 range
      "a—b “quoted” ™",  // cp1252 window specials
      "mixed ascii and ümläut")
    val rows = clean.map(c => mojibake(c)) ++ Seq(
      "plain ascii stays",
      "déjà vu",          // REAL latin-1 prose: no lead bytes
      "é",                     // lone e-acute: invalid UTF-8, kept
      "Ελλάδα") // Greek: unmappable, kept
    val out = rows.toDF("t")
      .select(Curation.fixMojibake($"t").as("r")).as[String].collect().toSeq
    assert(out.take(3) == clean, out.take(3))
    assert(out.drop(3) == rows.drop(3), out.drop(3)) // untouched
    // repair-then-clean composes with NFC (decomposed stays for NFC)
    val chained = Seq(mojibake("\u00e9cole")).toDF("t")
      .select(Curation.cleanText(Curation.fixMojibake($"t")).as("r"))
      .as[String].collect().head
    assert(chained == "\u00e9cole", chained) // composed by NFC
  }

  test("bloomContamination equals the exact join, even at a loose fpp") {
    // a corpus big enough that a 50% fpp bloom WILL flag clean docs:
    // the verification join must kill every false positive
    val mk = (id: Long) =>
      (id, (0 until 12).map(t => s"tok_${id}_$t").mkString(" "))
    val clean = (1L to 400L).map(mk)
    val bench = Seq(mk(9001L)._2, mk(9002L)._2).toDF("snippet")
    val dirty = Seq((500L, "pad " + mk(9001L)._2 + " tail"), mk(9002L).copy(_1 = 501L))
    val corpus = (clean ++ dirty).toDF("doc_id", "text")
    val exact = Curation.contamination(corpus, "doc_id", "text", bench, "snippet")
      .as[(Long, Long)].collect().toMap
    assert(exact.keySet == Set(500L, 501L)) // sanity: plants hit, clean don't
    for (fpp <- Seq(0.5, 0.01)) {
      graft.core.Stats.counter(spark, "decontam.bloom_docs_flagged").reset()
      val bloom = Curation.bloomContamination(
        corpus, "doc_id", "text", bench, "snippet", fpp = fpp)
        .as[(Long, Long)].collect().toMap
      assert(bloom == exact, s"fpp=$fpp")
    }
    // the loose-fpp sweep above only proves anything if the prefilter
    // actually over-flagged: with fpp=0.01 last, flagged counter ~= 2
    assert(graft.core.Stats.counterValue("decontam.bloom_docs_flagged") >= 2L)
  }

  test("deterministicSample: reproducible, partitioning-independent, ~fraction") {
    val df = (1L to 10000L).toDF("id")
    val a = Curation.deterministicSample(df, "id", 0.3).select("id")
      .as[Long].collect().toSet
    // same ids regardless of partitioning or repeated evaluation
    val b = Curation.deterministicSample(df.repartition(13), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02, s"got ${a.size}")
    // monotone in fraction: a smaller sample is a subset of a larger one
    val small = Curation.deterministicSample(df, "id", 0.1).select("id")
      .as[Long].collect().toSet
    assert(small.subsetOf(a))
    // different salt -> a different (roughly independent) sample
    val other = Curation.deterministicSample(df, "id", 0.3, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(other != a)
    // fraction bounds
    assert(Curation.deterministicSample(df, "id", 0.0).count() == 0)
    assert(Curation.deterministicSample(df, "id", 1.0).count() == 10000)
  }

  test("weightedSample: A-ES keys, deterministic, weight-proportional, no global sort") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) 100.0 else 1.0))
      .toDF("id", "w")
    val got = Curation.weightedSample(df, "id", "w", 200).select("id")
      .as[Long].collect().toSet
    // reproducible and partitioning-independent
    val got2 = Curation.weightedSample(df.repartition(17), "id", "w", 200)
      .select("id").as[Long].collect().toSet
    assert(got == got2 && got.size == 200)
    // heavy weights dominate: P(heavy beats light) >> 1/2 per pair
    val heavy = got.count(_ % 2 == 0)
    assert(heavy > 170, s"heavy=$heavy of 200")
    // exact agreement with a driver-side replay of the key formula
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Double): Double = {
      val hex = md.digest(s"graft$id".getBytes("UTF-8"))
        .take(3).map(b => f"${b & 0xFF}%02x").mkString
      val h = java.lang.Long.parseLong(hex, 16)
      math.pow((h + 0.5) / (1 << 24).toDouble, 1.0 / w)
    }
    val want = (1L to 4000L).map(i => (i, key(i, if (i % 2 == 0) 100.0 else 1.0)))
      .sortBy { case (id, k) => (-k, id) }.take(200).map(_._1).toSet
    assert(got == want)
    // zero/null weights carry no mass
    val wz = df.withColumn("w", when($"id" <= 3999L, lit(0.0)).otherwise($"w"))
    val onlyPos = Curation.weightedSample(wz, "id", "w", 10)
      .select("id").as[Long].collect().toSeq
    assert(onlyPos == Seq(4000L))
    // rank executes as TakeOrderedAndProject (bounded heaps, no sort)
    val plan = Curation.weightedSample(df, "id", "w", 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("mixtureSample: per-source fractions, default for the rest") {
    val df = (1L to 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val out = Curation.mixtureSample(df, "source", "id",
      Map("src0" -> 0.0, "src1" -> 1.0), defaultFraction = 0.5)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(!bySrc.contains("src0"))
    assert(bySrc("src1") == 1000L)
    assert(math.abs(bySrc("src2") / 1000.0 - 0.5) < 0.06, bySrc)
    // per-id membership at fraction f agrees with deterministicSample(f)
    val det = Curation.deterministicSample(df.filter($"source" === "src2"), "id", 0.5)
      .select("id").as[Long].collect().toSet
    val mix = out.filter($"source" === "src2").select("id").as[Long].collect().toSet
    assert(mix == det)
  }

  test("splitColumn: deterministic, complete, ~weights") {
    val df = (0L until 4000L).toDF("id")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = df.withColumn("split", Curation.splitColumn($"id", w))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") / 4000.0 - 0.8) < 0.03, counts)
    // pure function of (id, salt): repartitioning doesn't move anyone
    val again = df.repartition(13).withColumn("split", Curation.splitColumn($"id", w))
    assert(out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      again.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
  }

  test("leakageFreeSplit: a near-dup cluster never spans two splits") {
    def uniq(i: Int) = (0 until 20).map { j =>
      java.lang.Long.toString(((i + 11L) * 2654435761L + j * 40503L) & 0xffffffL, 26)
    }.mkString(" ")
    // 50 clusters of 3 near-dup docs each + 50 singletons
    val docs = ((0 until 50).flatMap { c =>
      Seq((c * 10L, uniq(c)), (c * 10L + 1, uniq(c) + " x"), (c * 10L + 2, uniq(c) + " y"))
    } ++ (0 until 50).map(i => (10000L + i, uniq(1000 + i)))).toDF("doc_id", "text")
    val out = Curation.leakageFreeSplit(docs, "doc_id", "text",
      Seq("train" -> 0.5, "test" -> 0.5), threshold = 0.6)
    assert(out.count() == 200)
    // every planted triple shares one split
    val spans = out.filter($"doc_id" < 10000L)
      .withColumn("c", ($"doc_id" / 10).cast("long"))
      .groupBy("c").agg(countDistinct("split").as("n"))
      .filter($"n" > 1)
    assert(spans.count() == 0, spans.collect().mkString(","))
    // both splits are populated
    assert(out.select("split").distinct().count() == 2)
  }

  test("dupSpans: planted shared boilerplate is flagged, unique text is not") {
    val boiler = "this license header is replicated verbatim across many files " +
      "and should be detected as duplicated span content by the detector"
    def uniq(i: Int) = (0 until 16).map { j =>
      java.lang.Long.toString(((i + 3L) * 2654435761L + j * 40503L) & 0xffffffL, 26)
    }.mkString(" ")
    val docs = ((0 until 10).map(i => (i.toLong, boiler + " " + uniq(i))) :+
      (100L, uniq(50)) :+ (101L, "too short")).toDF("doc_id", "text")
    val out = Curation.dupSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the short doc (<8 tokens) has no windows at all
    assert(!out.contains(101L))
    // the boilerplate docs share exactly the boilerplate's windows (the
    // 20-token boilerplate has 13 8-gram windows; the 7 bridge windows
    // straddling into each doc's unique tail are NOT shared)
    (0 until 10).foreach { i =>
      val (n, shared) = out(i.toLong)
      assert(shared == 13, s"doc $i shared=$shared")
      assert(n == (20 + 16) - 8 + 1, s"doc $i n=$n")
    }
    // the fully unique doc shares nothing
    assert(out(100L)._2 == 0)
  }

  test("normalizeUrl: case, ports, fragments, tracking params, root slash") {
    val cases = Seq(
      // scheme+host lowercase, default port stripped, path case kept
      ("HTTP://WWW.Example.COM:80/Path/Page", "http://www.example.com/Path/Page"),
      ("https://a.com:443/x", "https://a.com/x"),
      // non-default port and userinfo survive normalize
      ("https://API.b.com:8443/v1", "https://api.b.com:8443/v1"),
      ("http://user@Host.com/x", "http://user@host.com/x"),
      // fragment always dropped
      ("http://a.com/p#frag?utm_source=x", "http://a.com/p"),
      // tracking first (promote next), middle, trailing, only, many
      ("http://a.com/p?utm_source=f&id=2", "http://a.com/p?id=2"),
      ("http://a.com/p?id=2&fbclid=x&c=3", "http://a.com/p?id=2&c=3"),
      ("http://a.com/p?id=2&gclid=x", "http://a.com/p?id=2"),
      ("http://a.com/p?msclkid=only", "http://a.com/p"),
      ("http://a.com/p?utm_a=1&utm_b=2&q=3", "http://a.com/p?q=3"),
      // bare root slash stripped; deeper trailing slash kept
      ("http://Example.com:80/", "http://example.com"),
      ("http://a.com/dir/", "http://a.com/dir/"),
      // path-internal '&' is NOT query syntax — untouched
      ("http://a.com/a&b/c", "http://a.com/a&b/c"),
      // schemeless passes through trimmed + fragmentless
      ("  www.x.com/path#f ", "www.x.com/path"))
    val got = cases.map(_._1).toDF("u")
      .select(Curation.normalizeUrl($"u").as("n")).as[String].collect().toSeq
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"normalizeUrl($in) = $g, want $want")
    }
  }

  test("urlHost and registeredDomain: suffix list, IPs, short hosts") {
    val cases = Seq(
      ("https://www.example.com/x", "www.example.com", "example.com"),
      ("http://News.Site.co.uk/s", "news.site.co.uk", "site.co.uk"),
      ("http://a.b.c.shop.com.au/", "a.b.c.shop.com.au", "shop.com.au"),
      ("http://user:pw@Secure.org:8080/x", "secure.org", "secure.org"),
      ("http://10.0.42.7/f", "10.0.42.7", "10.0.42.7"),
      ("http://localhost/x", "localhost", "localhost"),
      ("no-scheme.com/path", "", ""))
    val got = cases.map(_._1).toDF("u")
      .select(Curation.urlHost($"u").as("h"),
        Curation.registeredDomain(Curation.urlHost($"u")).as("d"))
      .as[(String, String)].collect().toSeq
    cases.zip(got).foreach { case ((in, wh, wd), (h, d)) =>
      assert(h == wh, s"urlHost($in) = $h, want $wh")
      assert(d == wd, s"registeredDomain($in) = $d, want $wd")
    }
  }

  test("removeBoilerplate strips high-doc-frequency lines, keeps order") {
    // "NAV" appears (modulo whitespace) in 5 docs = minDocs -> removed;
    // "rare" in 2 docs < minDocs -> kept; blank lines always kept.
    val docs = Seq(
      (1L, "NAV\n\nbody one\nrare"),
      (2L, "  NAV  \nbody two\nrare"),
      (3L, "NAV\nbody three"),
      (4L, "NAV\nbody four"),
      (5L, "NAV"), // all lines boilerplate -> empty clean_text
      (6L, "solo doc")).toDF("id", "text")
    val out = Curation.removeBoilerplate(docs, "id", "text", minDocs = 5)
      .orderBy("id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "\nbody one\nrare", 4L, 1L),
      (2L, "body two\nrare", 3L, 1L),
      (3L, "body three", 2L, 1L),
      (4L, "body four", 2L, 1L),
      (5L, "", 1L, 1L),
      (6L, "solo doc", 1L, 0L)))
  }

  test("removeDupSpans: keep-first, overlap union, self-repeats, short docs") {
    // n=3 windows. Doc 1 carries the original phrase; doc 2 repeats it
    // verbatim (removed); doc 3 repeats it INSIDE other text (only the
    // covered tokens go); doc 4 repeats a 3-gram within itself (second
    // occurrence removed); doc 5 is shorter than n (untouchable).
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "x alpha beta gamma delta y"),
      (4L, "p q r z p q r"),
      (5L, "so short"),
      (6L, "")).toDF("id", "text")
    val out = Curation.removeDupSpans(docs, "id", "text", n = 3)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    // doc 1: windows (alpha beta gamma), (beta gamma delta) both
    //   duplicated but FIRST occurrences -> everything kept
    // doc 2: both windows duplicated, non-first -> tokens 0..3 all
    //   covered -> empty
    // doc 3: its (alpha beta gamma) + (beta gamma delta) windows are
    //   non-first -> tokens 1..4 go; x and y survive
    // doc 4: (p q r) occurs at 0 (keeper) and 4 (removed);
    //   overlapping non-dup windows don't resurrect tokens
    // doc 5/6: no windows
    assert(out == Seq(
      (1L, "alpha beta gamma delta", 4L, 0L),
      (2L, "", 4L, 4L),
      (3L, "x y", 6L, 4L),
      (4L, "p q r z", 7L, 3L),
      (5L, "so short", 2L, 0L),
      (6L, "", 1L, 0L)))
  }

  test("removeDupSpans above the broadcast gate: same rows, merge join") {
    val docs = Seq(
      (1L, "one two three four"), (2L, "one two three four"),
      (3L, "only unique words here")).toDF("id", "text")
    val want = Curation.removeDupSpans(docs, "id", "text", n = 3)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(want.map(_._4).sum == 4L, s"planted dup must be removed: $want")
    spark.conf.set("graft.dedup.corpusBroadcastMaxBytes", "1")
    try {
      val gated = Curation.removeDupSpans(docs, "id", "text", n = 3)
      val plan = gated.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected pinned merge join above the gate, got:\n$plan")
      assert(gated.orderBy("id")
        .as[(Long, String, Long, Long)].collect().toSeq == want)
    } finally spark.conf.unset("graft.dedup.corpusBroadcastMaxBytes")
  }

  test("removeBoilerplate above the broadcast gate: same rows, merge join") {
    val docs = ((1L to 6L).map(i => (i, s"NAV\nbody $i"))).toDF("id", "text")
    val want = Curation.removeBoilerplate(docs, "id", "text", minDocs = 5)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    spark.conf.set("graft.dedup.corpusBroadcastMaxBytes", "1")
    try {
      val gated = Curation.removeBoilerplate(docs, "id", "text", minDocs = 5)
      val plan = gated.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected pinned merge join above the gate, got:\n$plan")
      assert(gated.orderBy("id")
        .as[(Long, String, Long, Long)].collect().toSeq == want)
    } finally spark.conf.unset("graft.dedup.corpusBroadcastMaxBytes")
  }

  test("cleanText: CRLF, controls, zero-width junk, NFC composition") {
    val rows = Seq(
      (1L, "a\r\nb"),                     // CRLF -> LF
      (2L, "a\rb"),                        // bare CR -> LF
      (3L, "a\u0007b\u0001c"),            // C0 controls stripped
      (4L, "a\u200Bb\uFEFFc"),            // zero-width + BOM stripped
      (5L, "cafe\u0301"),                  // decomposed -> composed NFC
      (6L, "e\u200B\u0301x"),             // junk removed BEFORE NFC: composes
      (7L, "keep\tthis\nplain"))          // tab + LF survive
      .toDF("id", "text")
    val out = rows.select($"id", Curation.cleanText($"text").as("c"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "a\nb"), (2L, "a\nb"), (3L, "abc"), (4L, "abc"),
      (5L, "caf\u00E9"), (6L, "\u00E9x"), (7L, "keep\tthis\nplain")))
  }

  test("stripMarkup: subtrees, comments, breaks, entities, whitespace") {
    val rows = Seq(
      // script subtree vanishes WHOLLY — its </p > is not a break
      (1L, "<p>a</p><script>x = 1 < 2; // </p ></script><p>b</p>"),
      (2L, "<style>p {c: d}</style>text"),
      (3L, "before<!-- <p>hidden</p> -->after"),
      // block closes and <br> forms become newlines; attrs dropped
      (4L, "<h2 id=\"x\">T</h2><ul><li>a</li><li>b</li></ul>c<br/>d<br >e"),
      // entity decode AFTER tag strip; &amp; LAST (no double decode)
      (5L, "<p>1 &lt; 2 &amp;&amp; &quot;q&quot; &#39;s&#39; &amp;lt;raw&amp;gt;</p>"),
      // whitespace: runs collapse, spaces hugging \n drop, 3+ \n -> 2
      (6L, "a  \t b \n\n\n\n c"),
      (7L, "  <p> padded </p>  "))
      .toDF("id", "text")
    val out = rows.select($"id", Curation.stripMarkup($"text").as("c"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "a\nb"),
      (2L, "text"),
      (3L, "beforeafter"),
      (4L, "T\na\nb\nc\nd\ne"),
      (5L, "1 < 2 && \"q\" 's' &lt;raw&gt;"),
      (6L, "a b\n\nc"),
      (7L, "padded")))
  }

  test("stripMarkup: unterminated <script>/<style> swallows the tail") {
    val rows = Seq(
      // truncated crawl doc: unclosed <script> — body and everything
      // after it must vanish, not leak into clean_text
      (1L, "<p>kept</p><script type=\"x\">var leaked = 1; if (a<b) {"),
      (2L, "<p>kept</p><style>p {color: red"),
      // a CLOSED script earlier must not interfere with the fallback
      (3L, "<script>x=1</script><p>kept</p><script>var leaked = 2;"),
      // "<script" as literal decoded entity text is NOT a tag
      (4L, "<p>a &lt;script&gt; word</p>"))
      .toDF("id", "text")
    val out = rows.select($"id", Curation.stripMarkup($"text").as("c"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "kept"), (2L, "kept"), (3L, "kept"),
      (4L, "a <script> word")))
  }

  test("NfcNormalize ASCII fast path returns the input buffer") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("plain ascii only")
    assert(graft.functions.NfcNormalize.compute(ascii) eq ascii)
    val composed = UTF8String.fromString("caf\u00E9") // already NFC
    assert(graft.functions.NfcNormalize.compute(composed) eq composed)
    assert(graft.functions.NfcNormalize.compute(
      UTF8String.fromString("cafe\u0301")).toString == "caf\u00E9")
  }

  test("dedupParagraphs keeps the globally first occurrence only") {
    // "dup" first occurs in doc 1 pos 0 -> kept there, stripped from
    // docs 2 and 3; doc 2 repeats its own body -> second copy removed;
    // empty paragraph (doc 3) kept; whitespace variants unify.
    val docs = Seq(
      (1L, "dup\n\nbody one"),
      (2L, "  dup  \n\nbody two\n\nbody two"),
      (3L, "dup\n\n\n\nbody three"),
      (4L, "only unique")).toDF("id", "text")
    val out = Curation.dedupParagraphs(docs, "id", "text")
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "dup\n\nbody one", 2L, 0L),
      (2L, "body two", 3L, 2L),
      (3L, "\n\nbody three", 3L, 1L),
      (4L, "only unique", 1L, 0L)))
  }

  test("dedupParagraphs ties break to the smallest (doc, pos)") {
    // same paragraph at different positions across docs: survivor is
    // doc 1 (smaller id) even though doc 2 has it at pos 0
    val docs = Seq(
      (1L, "lead\n\nshared"),
      (2L, "shared\n\ntail")).toDF("id", "text")
    val out = Curation.dedupParagraphs(docs, "id", "text")
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "lead\n\nshared", 2L, 0L),
      (2L, "tail", 2L, 1L)))
  }

  test("removeBoilerplate counts docs, not occurrences") {
    // one doc repeating a line 10 times must not make it boilerplate
    val docs = (Seq((1L, Seq.fill(10)("spam").mkString("\n"))) ++
      (2L to 4L).map(i => (i, s"text $i"))).toDF("id", "text")
    val out = Curation.removeBoilerplate(docs, "id", "text", minDocs = 3)
      .filter($"id" === 1L)
      .as[(Long, String, Long, Long)].collect().head
    assert(out._3 == 10L && out._4 == 0L, s"spam doc kept intact: $out")
  }

  test("stratifiedSample: n per class, lowest-hash-first, matches capPerKey") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Curation.stratifiedSample(docs, "lang", "doc_id", n = 10)
    // exactly 10 per class (every lang has >= 10 docs in the fixture)
    val perClass = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perClass.values.forall(_ == 10L), s"per-class counts $perClass")
    // the heap path must pick the SAME rows as the window formulation
    val windowed = Curation.capPerKey(docs, col("lang"),
      Curation.samplingHash(col("doc_id")), 10)
    assert(got.select("doc_id").exceptAll(windowed.select("doc_id")).count() == 0)
    assert(windowed.select("doc_id").exceptAll(got.select("doc_id")).count() == 0)
  }

  test("tokenBudgetSample: greedy prefix per source, under-budget sources intact") {
    val rows = Seq(
      // source A: totals 90 <= budget 100 -> all kept
      (1L, "A", 30L), (2L, "A", 30L), (3L, "A", 30L),
      // source B: 4 docs of 40 -> greedy prefix keeps 2 (80 <= 100)
      (10L, "B", 40L), (11L, "B", 40L), (12L, "B", 40L), (13L, "B", 40L))
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val got = Curation.tokenBudgetSample(df, "source", "doc_id", "n_tokens", 100L)
    assert(got.filter($"source" === "A").count() == 3)
    val b = got.filter($"source" === "B")
    assert(b.count() == 2)
    // kept B rows are the two lowest by (hash, id) — replay the order
    val expect = df.filter($"source" === "B")
      .withColumn("h", Curation.samplingHash($"doc_id"))
      .orderBy($"h", $"doc_id").limit(2)
      .select("doc_id").as[Long].collect().toSet
    assert(b.select("doc_id").as[Long].collect().toSet == expect)
    // budget is a cumulative cap, not a per-row filter
    assert(got.agg(sum($"n_tokens")).head().getLong(0) == 90L + 80L)
  }

  test("tokenMixtureSample: water-filled rates, binding source keeps all") {
    // A has 1000 tokens, B has 9000; target 50/50 -> A binds
    // (capacity = 1000/0.5 = 2000), A keeps everything, B rate = 1/9
    val docs = ((0 until 100).map(i => (i.toLong, "A", 10L)) ++
      (100 until 1000).map(i => (i.toLong, "B", 10L)) ++
      Seq((5000L, "C", 10L))) // not in target -> dropped
      .toDF("doc_id", "source", "n_tokens")
    val kept = Curation.tokenMixtureSample(docs, "source", "doc_id",
      "n_tokens", Map("A" -> 0.5, "B" -> 0.5))
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("A") == 100L, "binding source keeps every row")
    assert(!bySrc.contains("C"), "untargeted sources are dropped")
    // B's keep rate is 1/9 in expectation: 900 docs -> ~100
    assert(bySrc("B") > 50L && bySrc("B") < 160L, s"B kept ${bySrc("B")}")
    // deterministic: same inputs, same rows
    val again = Curation.tokenMixtureSample(docs, "source", "doc_id",
      "n_tokens", Map("A" -> 0.5, "B" -> 0.5))
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
    intercept[IllegalArgumentException](
      Curation.tokenMixtureSample(docs, "source", "doc_id", "n_tokens",
        Map("A" -> 0.5, "B" -> 0.4)))
  }
}
