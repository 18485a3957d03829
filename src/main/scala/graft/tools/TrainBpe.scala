package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Train the embedded BPE merge table and write it as the
  * `merges.txt`-style resource [[graft.ops.TextAnalysis.bpeMerges]]
  * loads (one `a b` pair per line, learned rank order).
  *
  * Usage:
  *   sbt "runMain graft.tools.TrainBpe <corpus>[,<corpus>...] \
  *     src/main/resources/graft/bpe_merges.txt [numMerges] [maxWords]"
  *
  * Each corpus entry is either
  *   - an sf dir or .parquet path (reads its `documents.parquet` /
  *     itself, uses the `text` column), or
  *   - a directory of plain-text files (read recursively, one corpus
  *     line per file line).
  *
  * The committed resource was produced by this tool over the engine's
  * own documents corpus PLUS locally-available public English/code
  * text — the production pattern: train the tokenizer on your own
  * data mixed with generic text so token budgets (packing, chunking)
  * reflect real segmentation, not a toy closed vocabulary.
  */
object TrainBpe {

  private def corpusDf(spark: SparkSession, path: String): DataFrame = {
    val docsParquet = new java.io.File(path, "documents.parquet")
    if (path.endsWith(".parquet"))
      spark.read.parquet(path).select(col("text"))
    else if (docsParquet.exists())
      spark.read.parquet(docsParquet.getPath).select(col("text"))
    else
      spark.read.option("recursiveFileLookup", "true").textFile(path)
        .toDF("text")
  }

  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val outPath = args(1)
    val numMerges = if (args.length > 2) args(2).toInt else 1500
    val maxWords = if (args.length > 3) args(3).toInt else 100000
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = corpus.split(",").map(_.trim).filter(_.nonEmpty)
      .map(corpusDf(spark, _)).reduce(_ unionByName _)
    val t0 = System.nanoTime()
    val merges = graft.ops.TextAnalysis.trainBpe(docs, "text", numMerges, maxWords)
    println(f"[trainbpe] learned ${merges.size} merges in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val out = new java.io.File(outPath)
    Option(out.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(out, "UTF-8")
    try merges.foreach { case (a, b) => w.println(s"$a $b") }
    finally w.close()
    println(s"[trainbpe] wrote $outPath")
    spark.stop()
  }
}
