package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Full-text retrieval over the document corpus: an inverted index
  * (postings) plus BM25 scoring and top-k search. A training-data
  * pipeline uses this for eval-set contamination lookup, quality
  * retrieval ("find the docs most similar to this prompt") and
  * source triage — the reference has no search surface at all
  * (SURVEY §2.12: no scalar function library, computation happens in
  * numpy), so this is extension surface in the BASELINE.json
  * north-star sense.
  *
  * Scale design (the 100 TB story):
  *  - the postings build is ONE map-side-combined shuffle
  *    (`groupBy(doc_id, term)`) — tf and dl come out of the same
  *    aggregation, so document length never needs a second
  *    corpus-sized join;
  *  - document-frequency (df) stays corpus-side; the query-term
  *    table (tiny by definition) is BROADCAST into it, so the
  *    vocabulary table never shuffles;
  *  - candidate generation is a broadcast join of postings against
  *    the (query, term, idf) table — postings stream, nothing
  *    corpus-sized shuffles on an unbounded key;
  *  - per-(query, doc) score assembly is one shuffle of MATCHING
  *    pairs only, and top-k uses [[Similarity.topKPerKey]]'s bounded
  *    per-partition heaps — no `row_number().over(partitionBy(query))`
  *    window, which would hash-partition every scored row onto
  *    |queries| reducers (the classic skew bomb when queries are few
  *    and the corpus is huge).
  */
object Search {

  /** Unicode-word terms, lowercased: split on any non-letter/digit
    * run, drop empties. Mirrors the tokenizer the perplexity oracle
    * already replays in DuckDB (`string_split_regex(lower(text),
    * '[^\p{L}\p{N}]+')`), so every Search oracle is value-exact. */
  def termsOf(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Inverted index: one row per (doc, term) with the term frequency
    * and the document length riding along (same aggregation, no
    * second join). Columns: doc_id, term, tf (long), dl (long). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), termsOf(col(textCol)).as("__t"))
    toks
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
  }

  /** Exact integer corpus stats: (nDocs, sum of doc lengths). One
    * tiny job; division into avgdl happens ONCE on the driver so both
    * engines compute `sum/n` with a single rounding step. */
  def corpusStats(docs: DataFrame, idCol: String, textCol: String): (Long, Long) = {
    val r: Row = docs
      .select(size(termsOf(col(textCol))).cast("long").as("__dl"))
      .agg(count(lit(1)).as("n"), sum(col("__dl")).as("s"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** BM25 scores for every (query, doc) pair sharing at least one
    * term. Query terms are DISTINCT (standard for short queries —
    * query-side tf is ignored, documented). idf is the
    * Robertson/Lucene non-negative variant
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`.
    *
    * Output: (query_id, doc_id, score raw double). Callers round for
    * presentation; [[bm25TopK]] ranks on the 6-decimal rounding so
    * ordering is reproducible across engines. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val (nDocs, sumDl) = corpusStats(docs, idCol, textCol)
    val n = nDocs.toDouble
    val avgdl = if (nDocs == 0L) 1.0 else sumDl.toDouble / nDocs
    val post = postings(docs, idCol, textCol)
    val df = post.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("__df"))
    val qterms = queries.select(col(qidCol).as("query_id"),
      explode(array_distinct(termsOf(col(qtextCol)))).as("term"))
    // vocabulary-sized df table streams; tiny query-term table
    // broadcasts into it, then the (query, term, idf) result (still
    // tiny) broadcasts into the postings stream.
    val qidf = df.join(broadcast(qterms), "term")
      .select(col("query_id"), col("term"),
        log(lit(1.0) + (lit(n) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
          .as("__idf"))
    val tfD = col("tf").cast("double")
    val contrib = post.join(broadcast(qidf), "term")
      .select(col("query_id"), col("doc_id"),
        (col("__idf") * tfD * lit(k1 + 1.0) /
          (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl))))
          .as("__s"))
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__s")).as("score"))
  }

  /** Top-k docs per query by BM25, ranked on the 6-decimal-rounded
    * score with doc_id ascending as the tie-break (rounded ranking
    * keeps the order stable under last-ulp float differences between
    * engines; ties at 6 decimals are broken deterministically).
    * Output: (query_id, doc_id, score, rank). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10, k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val scored = bm25Scores(docs, idCol, textCol, queries, qidCol, qtextCol, k1, b)
      .select(col("query_id"), col("doc_id"), round(col("score"), 6).as("score"))
    Similarity.topKPerKey(scored, "query_id", "doc_id", "score", k)
  }
}
