package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Measure PQ quality on the real embeddings table across (m, ksub)
  * configurations: reconstruction cosine (min/avg over every vector)
  * and ADC recall@10 vs exact brute force, with and without exact
  * re-ranking — the BASELINE.md artifact backing the `pq_*` gate
  * floors.
  *
  *   sbt "runMain graft.tools.PqCurve /root/testdata/sf0.01"
  */
object PqCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val q = e.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10).cache()
    brute.count()
    println(s"[pqcurve] sf=$sfDir corpus=${e.count()} queries=${q.count()} k=10")
    for ((m, ksub) <- Seq((8, 16), (8, 64), (8, 256), (16, 16), (16, 64), (32, 16))) {
      val cb = Similarity.trainPq(e, "vec_id", "embedding", m = m, ksub = ksub)
      val rt = e.withColumn("codes",
          Similarity.pqEncode(Similarity.unitNorm(col("embedding")), cb))
        .withColumn("back", Similarity.pqDecode(col("codes"), cb))
        .select(Similarity.cosine(col("embedding"), col("back")).as("c"))
        .agg(min("c"), avg("c")).head()
      val adc = Similarity.pqTopK(e, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 10, codebookOpt = Some(cb))
      val rAdc = Similarity.recallAtK(adc, brute).head().getDouble(0)
      val rr = Similarity.pqTopK(e, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 10, rerank = 100, codebookOpt = Some(cb))
      val rRr = Similarity.recallAtK(rr, brute).head().getDouble(0)
      println(f"[pqcurve] m=$m%2d ksub=$ksub%3d bytes/vec=${m * (if (ksub <= 256) 1 else 2)}%3d " +
        f"minCos=${rt.getDouble(0)}%.4f avgCos=${rt.getDouble(1)}%.4f " +
        f"recall@10(adc)=$rAdc%.4f recall@10(rerank100)=$rRr%.4f")
    }
    spark.stop()
  }
}
