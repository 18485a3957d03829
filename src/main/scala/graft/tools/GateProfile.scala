package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Sub-job attribution for `minhash_index_gate` (r13 verdict item: the
  * gate regressed 4.50 → 7.02 s driver / 5.87 s exclusive with no
  * recorded cause). Replays the gate's exact pipeline with a wall
  * clock around each stage:
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
    val DupOff = 1000000L

    (0 until reps).foreach { rep =>
      val (uri, tFix) = time(graft.SparkEntry.minhashIndex(spark, sfDir))
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + DupOff)
        .withColumn("text", concat(col("text"), lit(" xyzzy")))
      val fresh = spark.range(5).select((col("id") + 2L * DupOff).as("doc_id"),
        concat(lit("totally fresh unseen content block qwertyuiop "),
          col("id")).as("text"))
      val batch = planted.unionByName(fresh)
      val (probed, tProbe) = time {
        graft.ops.DedupIndex.probe(batch, "doc_id", "text", uri,
          threshold = 0.6, verifyWith = Some(docs)).localCheckpoint(true)
      }
      val (oneShot, tOne) = time {
        Dedup.minhashNearDups(docs.unionByName(batch), "doc_id", "text",
            threshold = 0.6)
          .filter((col("a") >= DupOff) =!= (col("b") >= DupOff))
          .select(greatest(col("a"), col("b")).as("id"),
            least(col("a"), col("b")).as("match_id"))
          .localCheckpoint(true)
      }
      val (_, tParity) = time {
        val nPlanted = planted.count()
        val nProbed = probed.count()
        val selfHits = probed.filter(col("match_id") === col("id") - DupOff).count()
        val freshHits = probed.filter(col("id") >= 2L * DupOff).count()
        val agree = probed.select("id", "match_id")
          .unionByName(oneShot).distinct().count() == nProbed &&
          nProbed == oneShot.count()
        require(selfHits == nPlanted && freshHits == 0 && agree, "gate violated")
      }
      println(f"[gateprofile] rep$rep fixture=$tFix%6.2fs probe=$tProbe%6.2fs " +
        f"one-shot=$tOne%6.2fs parity=$tParity%6.2fs " +
        f"total=${tFix + tProbe + tOne + tParity}%6.2fs")
    }
    spark.stop()
  }
}
