package graft.tools

/** Interleaved A/B timing of one SparkEntry query under a runtime conf
  * toggle — robust to box drift, unlike sequential BenchOne pairs
  * (alternating runs sample the same box state for both arms).
  *
  * Usage: sbt "runMain graft.tools.ABOne <query> <confKey> <valA> <valB> [pairs]"
  */
object ABOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val key = args(1)
    val valA = args(2); val valB = args(3)
    val pairs = if (args.length > 4) args(4).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // one warm run per arm first
    spark.conf.set(key, valA); run()
    spark.conf.set(key, valB); run()
    val as = scala.collection.mutable.ArrayBuffer.empty[Double]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until pairs).foreach { i =>
      spark.conf.set(key, valA); val a = run(); as += a
      spark.conf.set(key, valB); val b = run(); bs += b
      println(f"[abone] $name pair$i $key: $valA=$a%.3f s  $valB=$b%.3f s")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[abone] $name median $key=$valA: ${med(as.toSeq)}%.3f s  " +
      f"$key=$valB: ${med(bs.toSeq)}%.3f s")
    spark.stop()
  }
}
