package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: dump physical plans of key queries to verify pushdown,
  * pruning, and codegen spans (not part of the driver contract). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.get()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("slice_range", "qc_compare", "proj_attrs", "agg_slice_cond",
        "time_travel", "join_agg", "group_agg")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        .toString().linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}
