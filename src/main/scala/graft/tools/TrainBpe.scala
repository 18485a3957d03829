package graft.tools

/** Train the embedded BPE merge table from a documents parquet file and
  * write it as the `merges.txt`-style resource [[graft.ops.TextAnalysis
  * .bpeMerges]] loads (one `a b` pair per line, learned rank order).
  *
  * Usage:
  *   sbt "runMain graft.tools.TrainBpe /root/testdata/sf0.01 \
  *     src/main/resources/graft/bpe_merges.txt 1500"
  *
  * The committed resource was produced by this tool over the sf0.01
  * documents corpus — a real learned vocabulary for the corpus the
  * engine's token budgets (packing, chunking) are computed over, the
  * way a production pipeline trains its tokenizer on its own data.
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val numMerges = if (args.length > 2) args(2).toInt else 1500
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val merges = graft.ops.TextAnalysis.trainBpe(docs, "text", numMerges)
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
