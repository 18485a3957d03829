package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Measure the IVF recall@10-vs-nprobe curve against exact brute force
  * (the BASELINE.md artifact backing the `knn_ivf_recall` floor), plus
  * the quantized-scan + re-rank path at the gate's nprobe.
  *
  *   sbt "runMain graft.tools.IvfCurve /root/testdata/sf0.1"
  */
object IvfCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10).cache()
    brute.count()
    println(s"[ivfcurve] sf=$sfDir corpus=${e.count()} queries=${q.count()} k=10 nCentroids=16")
    for (np <- Seq(1, 2, 4, 6, 8, 10, 12, 14, 16)) {
      val ivf = Similarity.ivfTopK(e, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 10, nCentroids = 16, nprobe = np)
      val r = Similarity.recallAtK(ivf, brute).head().getDouble(0)
      println(f"[ivfcurve] nprobe=$np%2d recall@10=$r%.4f")
    }
    spark.stop()
  }
}
