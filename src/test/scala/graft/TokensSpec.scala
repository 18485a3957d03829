package graft

import org.apache.spark.sql.functions._

/** Pins the [[graft.functions.Tokens]] kernel to its defining
  * contract: output IDENTICAL (order, duplicates, elements) to
  * `filter(split(text, "[^\\p{L}\\p{N}]+"), t -> length(t) > 0)` — the
  * expression it replaced in `NgramLm.lmTokens` / `Search.termsOf`.
  * Every consumer (LM training counts, perplexity pairs, PMI, BM25
  * query terms, corpus stats) derives from this array, so THESE rows
  * are the correctness boundary of the swap. */
class TokensSpec extends SparkSpec {
  import spark.implicits._

  private val Delim = "[^\\p{L}\\p{N}]+"

  private def kernelTokens(s: String): Seq[String] = {
    val arr = graft.functions.Tokens.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (0 until arr.numElements()).map(i =>
      arr.getUTF8String(i).toString)
  }

  test("kernel tokens equal the regex split over every BMP codepoint") {
    // per-codepoint agreement with the regex engine (same sweep as
    // TermCountsSpec), but on the ORDERED output: the codepoint either
    // is a token or splits
    val cps = (0 until 0xFFFF).filterNot(c => c >= 0xD800 && c <= 0xDFFF) ++
      (0x10000 until 0x10500) ++ (0x1D400 until 0x1D800) ++
      (0x1F300 until 0x1F700) ++ (0x20000 until 0x20100)
    val bad = cps.filter { cp =>
      val s = "a" + new String(Character.toChars(cp)) + "b"
      val regex = s.split(Delim).filter(_.nonEmpty).toSeq
      regex != kernelTokens(s)
    }
    assert(bad.isEmpty, s"codepoints disagreeing with regex: ${bad.take(20).map(c => f"U+$c%04X")}")
  }

  test("kernel array equals the split+filter expression on adversarial strings") {
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
    val both = df.select(
      col("doc_id"),
      filter(split(lower(col("text")), Delim), t => length(t) > 0).as("old"),
      graft.functions.Tokens(lower(col("text"))).as("neu"))
    val mismatched = both.filter(not(col("old") <=> col("neu"))).count()
    assert(mismatched == 0L)
    // and null text stays null through the kernel, like split
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(graft.functions.Tokens(lower(col("text"))).as("neu"))
    assert(nulls.filter(col("neu").isNull).count() == 1L)
  }

  test("lmTokens/termsOf consumers: LM counts and query terms unchanged by the kernel") {
    // end-to-end: the bigram LM trained via the kernel-backed lmTokens
    // must equal one trained via the raw expression on the same docs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick"),
      (2L, "the quick brown cat naps under the warm sun the quick"),
      (3L, "Ünïcødé tökensrépeat Ünïcødé tökens the quick brown"),
      (4L, "the quick brown fox 123 456 123 the quick brown fox")
    ).toDF("doc_id", "text")
    val exprTokens = filter(split(lower(col("text")), Delim), t => t =!= "")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).sortBy(_.mkString("")).toSeq
    val viaKernel = graft.ops.NgramLm.perplexity(
      docs, "doc_id", "text",
      graft.ops.NgramLm.trainBigramLm(docs, "text", 2L, 3L))
    val oldUni = docs.select(explode(exprTokens).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val kernelUni = docs.select(
        explode(graft.functions.Tokens(lower(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    assert(canon(kernelUni) == canon(oldUni))
    assert(viaKernel.count() == 4L) // every doc has >= 2 tokens
  }
}
