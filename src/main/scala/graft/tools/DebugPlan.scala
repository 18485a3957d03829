package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: inspect the minhashNearDups physical plan against a
  * rehearsal corpus to see which join sides broadcast. */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale30x")
    val spark = graft.core.GraftSession.get()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.6)
    println("=== OPTIMIZED ===")
    println(pairs.queryExecution.optimizedPlan.toString().linesIterator.take(60).mkString("\n"))
    println("=== PHYSICAL (static, pre-AQE) ===")
    println(pairs.queryExecution.executedPlan.toString().linesIterator.take(80).mkString("\n"))
    println("=== stats ===")
    val opt = pairs.queryExecution.optimizedPlan
    opt.foreach { p =>
      println(f"${p.stats.sizeInBytes}%20s  ${p.nodeName}  ${p.simpleString(60).take(100)}")
    }
    spark.stop()
  }
}
