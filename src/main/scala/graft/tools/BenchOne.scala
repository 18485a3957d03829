package graft.tools

/** Times a single named SparkEntry query N times in one JVM (first run
  * warms fixtures/JIT) — the whole-surface Bench main measures each
  * query once after a global warmup, which is too noisy to judge a
  * single query's plan change. Usage:
  *   sbt "runMain graft.tools.BenchOne <query> [runs]"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = (0 until n).map { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] $name run$i $s%.3f s")
      s
    }
    // with runs=1 there is no warm run to drop — report the single time
    val warm = if (times.size > 1) times.drop(1).sorted else times.sorted
    println(f"[benchone] $name median-warm ${warm(warm.size / 2)}%.3f s")
    spark.stop()
  }
}
