package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Dev profiling harness for the heavy operators (not part of the
  * driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val edited = docs.withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text", concat(col("text"), lit(" xyzzy")))
    val all = docs.unionByName(edited)
    time("count")(all.count())
    time("shingles")(all.select(TextAnalysis.charShingles(col("text"), 5).as("s"))
      .agg(sum(size(col("s")))).collect()(0))
    val withSig = all.select(col("doc_id"), col("text"))
      .withColumn("__hs", graft.functions.ShingleHashes(
        lower(regexp_replace(trim(col("text")), TextAnalysis.WsClass + "+", " ")), 5))
      .withColumn("__sig", Dedup.minhashSignatureFromHashes(col("__hs"), 64))
      .drop("text")
      .cache()
    time("signatures")(withSig.count())
    val cands = Dedup.lshCandidates(withSig, "doc_id", "__sig", 16)
    time("candidates")(cands.count())
    time("full")(Dedup.minhashNearDups(all, "doc_id", "text", threshold = 0.6).count())
    spark.stop()
  }
}
