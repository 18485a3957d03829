package graft.tools

/** Sub-job attribution for `minhash_index_gate` (r13 verdict item: the
  * gate regressed 4.50 → 7.02 s driver / 5.87 s exclusive with no
  * recorded cause). Wall-clocks each stage of the gate's OWN staged
  * pipeline (`SparkEntry.minhashGate*` — shared, not mirrored, so the
  * profiler can never drift from the benched gate):
  *
  *   1. fixture  — DedupIndex.build (first run only; steady-state 0)
  *   2. probe    — DedupIndex.probe with exact verify (batch-scale)
  *   3. one-shot — minhashNearDups over corpus ∪ batch (corpus-scale)
  *   4. parity   — the three counts + union-distinct agreement
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.GateProfile [reps]"
  */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    (0 until reps).foreach { rep =>
      val (uri, tFix) = time(graft.SparkEntry.minhashIndex(spark, sfDir))
      val (docs, planted, batch) = graft.SparkEntry.minhashGateInputs(spark, sfDir)
      val (probed, tProbe) =
        time(graft.SparkEntry.minhashGateProbe(batch, docs, uri))
      val (oneShot, tOne) =
        time(graft.SparkEntry.minhashGateOneShot(docs, batch))
      val (verdicts, tParity) =
        time(graft.SparkEntry.minhashGateParity(probed, oneShot, planted))
      require(verdicts == ((true, true, true)), s"gate violated: $verdicts")
      println(f"[gateprofile] rep$rep fixture=$tFix%6.2fs probe=$tProbe%6.2fs " +
        f"one-shot=$tOne%6.2fs parity=$tParity%6.2fs " +
        f"total=${tFix + tProbe + tOne + tParity}%6.2fs")
    }
    spark.stop()
  }
}
