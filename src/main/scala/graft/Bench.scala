package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Benchmark main: runs the declared query surface on
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query wall-clock
  * seconds. One warm-up pass (JIT + page cache + array fixtures), then
  * each query runs three times BACK-TO-BACK and reports its MEDIAN
  * (BASELINE.md protocol). Consecutive runs, not interleaved sweeps:
  * single-shot numbers at these sub-second scales are dominated by
  * GC/JIT spill-over from whatever query ran before (measured: knn_ivf
  * 3.1 s mid-sweep vs 1.19 s isolated median on identical plans).
  * Also times the fragment-write path (`ingest`), mirroring the
  * reference's DenseWrite workload (BASELINE.md).
  */
object Bench {
  private val Sweeps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.sorted.apply(ok.size / 2)
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up (builds array fixtures, JIT, parquet footer cache)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench/warm] $n: ${e.getMessage}") }
    }
    val results = names.map { n =>
      val med = median((1 to Sweeps).map { _ =>
        try time(SparkEntry.queries(n)(spark, sfDir).count())
        catch { case _: Throwable => -1.0 }
      })
      // storage hygiene between queries: drop anything a query cached
      // and nudge the ContextCleaner to release dropped localCheckpoint
      // blocks — accumulated pinned storage otherwise makes LATER
      // shuffle-heavy queries spill (measured r5: dedup_exact 3.74 s
      // in-sweep vs 0.60 s isolated on identical plans)
      spark.catalog.clearCache()
      System.gc()
      n -> med
    }
    // fragment-ingest benchmark: write sf lineitem as a fresh array-table
    val ingestSec = median((1 to Sweeps).map { _ =>
      val ingestDir = s"/root/repo/target/graft-arrays/bench_ingest_${System.nanoTime()}"
      val sec = time {
        graft.storage.ArrayTable.ingest(spark,
          spark.read.parquet(s"$sfDir/lineitem.parquet"), ingestDir,
          Seq("l_orderkey", "l_linenumber"), overwrite = true)
      }
      graft.storage.VFS(spark).delete(ingestDir)
      sec
    })

    val all = results :+ ("ingest_lineitem" -> ingestSec)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = all.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
