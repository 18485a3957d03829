package graft

import org.apache.spark.sql.functions._

/** Pins the [[graft.functions.TermCounts]] kernel to its defining
  * contract: tokenization identical to
  * `filter(split(text, "[^\\p{L}\\p{N}]+"), t -> length(t) > 0)` and
  * counts identical to the old explode + groupBy(doc, term) postings
  * shape — the kernel replaced a shuffle, so THESE rows are the
  * correctness boundary. */
class TermCountsSpec extends SparkSpec {
  import spark.implicits._

  private val Delim = "[^\\p{L}\\p{N}]+"

  test("kernel token classes match java.util.regex over every BMP codepoint") {
    // the kernel's isTokenCp must agree with the regex engine Spark's
    // split() uses, for every non-surrogate BMP codepoint plus a
    // supplementary-plane sweep (letters, digits, emoji, symbols)
    val cps = (0 until 0xFFFF).filterNot(c => c >= 0xD800 && c <= 0xDFFF) ++
      (0x10000 until 0x10500) ++ (0x1D400 until 0x1D800) ++
      (0x1F300 until 0x1F700) ++ (0x20000 until 0x20100)
    val bad = cps.filter { cp =>
      val s = new String(Character.toChars(cp))
      val regexToken = s.split(Delim).exists(_.nonEmpty) // cp survives = token char
      val arr = graft.functions.TermCounts.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val kernelToken = arr.numElements() > 0
      regexToken != kernelToken
    }
    assert(bad.isEmpty, s"codepoints disagreeing with regex: ${bad.take(20).map(c => f"U+$c%04X")}")
  }

  test("kernel (term, tf, dl) equals the split+groupBy expression on adversarial strings") {
    val rows = Seq(
      "the quick brown fox the the",
      "", "   ", "...!!!", "a",
      "word1 2words w0rd 123 0x7f",
      "Ünïcødé çhàrs mixed ASCII tokens",
      "é́ combining marks ́leading",
      "中文分词 no spaces。中文 again",
      "٠١٢ arabic digits Ⅻ roman numeral ½ half",
      "tab\tnewline\nmixed\r\nws",
      "𝐀𝐁 math letters 😀 emoji 😀x",
      "ends with delim...", "...starts with delim",
      "reP eated Rep rep REP rep"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "term", "tf", "dl").as[(Long, String, Long, Long)]
        .collect().sorted.toSeq
    val old = df
      .select(col("doc_id"),
        filter(split(lower(col("text")), Delim), t => length(t) > 0).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val neu = graft.ops.Search.postings(df, "doc_id", "text")
    assert(canon(neu) == canon(old))
  }

  test("postings plan has no exchange and null/empty docs emit no rows") {
    val df = Seq((1L, "a b a"), (2L, null), (3L, ""), (4L, "...")).toDF("doc_id", "text")
    val post = graft.ops.Search.postings(df, "doc_id", "text")
    val plan = post.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"postings must be shuffle-free:\n$plan")
    assert(post.count() == 2L) // doc 1 only: terms a(2), b(1)
    val m = post.as[(Long, String, Long, Long)].collect().sorted.toSeq
    assert(m == Seq((1L, "a", 2L, 3L), (1L, "b", 1L, 3L)))
  }
}
