package graft

import graft.ops.NgramLm
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // Hand-derived fixture: tokens a b a b a c | a b x | c
  //   unigram counts  a:4 b:3 c:2 x:1   N=10, x cut by minUnigram=2
  //   bigram  counts  (a,b):3 (b,a):2 (a,c):1 (b,x):1, only (a,b) kept
  private val docs = Seq(
    (0L, "A b a, b a c"), // punctuation/case fold into the same tokens
    (1L, "a b x"),
    (2L, "c")).toDF("doc_id", "text")

  test("trainBigramLm: counts, floors, and normalizer are exact") {
    val lm = NgramLm.trainBigramLm(docs, "text", minUnigram = 2L, minBigram = 3L)
    assert(lm.totalTokens == 10L)
    assert(lm.unigrams.orderBy("w").as[(String, Long)].collect().toSeq ==
      Seq(("a", 4L), ("b", 3L), ("c", 2L)))
    assert(lm.bigrams.as[(String, String, Long)].collect().toSeq ==
      Seq(("a", "b", 3L)))
  }

  test("perplexity: Stupid Backoff scores match hand-computed values") {
    val lm = NgramLm.trainBigramLm(docs, "text", minUnigram = 2L, minBigram = 3L)
    val out = NgramLm.perplexity(docs, "doc_id", "text", lm)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    // doc 0 pairs: (a,b)=3/4, (b,a)=0.4*4/10, (a,b), (b,a), (a,c)=0.4*2/10
    val lp0 = (2 * math.log10(0.75) + 2 * math.log10(0.16) + math.log10(0.08)) / 5
    // doc 1 pairs: (a,b)=3/4, (b,x) backs off to CUT word x: 0.4*0.1/10
    val lp1 = (math.log10(0.75) + math.log10(0.4 * 0.1 / 10)) / 2
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // doc 2 has one token -> no scored positions -> omitted
    assert(out == Seq(
      (0L, 5L, r6(lp0), r6(math.pow(10, -lp0))),
      (1L, 2L, r6(lp1), r6(math.pow(10, -lp1)))))
  }

  test("perplexity separates fluent from shuffled text on a real-ish corpus") {
    // 60 fluent docs repeat common bigrams; 6 'junk' docs use the same
    // VOCABULARY in scrambled order, so unigram stats alone can't
    // separate them — only the bigram model does.
    val fluent = (0 until 60).map { i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog ${i % 3}")
    }
    val junk = (60 until 66).map { i =>
      val words = "dog the over quick lazy fox brown jumps the".split(" ")
      val rot = (i * 7) % words.length
      (i.toLong, (words.drop(rot) ++ words.take(rot)).mkString(" "))
    }
    val corpus = (fluent ++ junk).toDF("doc_id", "text")
    val lm = NgramLm.trainBigramLm(corpus, "text", minUnigram = 2L, minBigram = 3L)
    val ppl = NgramLm.perplexity(corpus, "doc_id", "text", lm)
      .select($"doc_id", $"ppl").as[(Long, Double)].collect().toMap
    val fluentMax = (0 until 60).map(i => ppl(i.toLong)).max
    val junkMin = (60 until 66).map(i => ppl(i.toLong)).min
    assert(fluentMax < junkMin,
      s"fluent ppl up to $fluentMax should undercut junk ppl from $junkMin")
  }

  test("pmiCollocations: rare fixed phrases outrank common chains") {
    // pmi ~ cb/(ca*cw): a RARE always-together pair ("quantum
    // entanglement", 5 docs) scores 1/5, while pairs built from the
    // ubiquitous "the"/"common" (85 occurrences each) score ~1/85 —
    // frequency alone never wins, association strength does
    val common = (0 until 40).map { i =>
      (i.toLong, s"the common market holds the common goods ${i % 4}")
    }
    // "entanglement" is followed by the COMMON "holds" so only the
    // (quantum, entanglement) pair itself is a rare perfect pairing
    val rare = (40 until 45).map { i =>
      (i.toLong, "quantum entanglement holds the common market")
    }
    val docs = (common ++ rare).toDF("doc_id", "text")
    val top = NgramLm.pmiCollocations(docs, "text", n = 10)
      .select($"pw", $"w", $"pmi").as[(String, String, Double)].collect()
    assert(top.nonEmpty && top.head._1 == "quantum" && top.head._2 == "entanglement",
      s"expected (quantum, entanglement) first, got ${top.take(3).toSeq}")
    val pmis = top.map(_._3)
    assert(pmis.sorted.reverse.toSeq == pmis.toSeq, "must be pmi-descending")
    top.find(p => p._1 == "the" && p._2 == "common")
      .foreach(p => assert(p._3 < top.head._3, "common chain must rank below"))
  }
}
