package graft

import graft.core.{ArraySchema, Attr, Dim}
import graft.storage.{ArrayTable, Dense}
import org.apache.spark.sql.functions._

/** PLAN-shape contract of the dense completion path ([[Dense]]): the
  * scale properties the 10^8-cell rehearsal measures must hold by
  * construction in the plan, at any size —
  *  - the coordinate grid is generated DISTRIBUTED (codegen'd Range
  *    leaves), never materialized driver-side;
  *  - a sub-box read pushes its dim bounds into the fragment parquet
  *    scan (the analogue of the reference's tile pruning,
  *    tiledb/core.cc:1225-1258), so data-side IO tracks the box, not
  *    the domain.
  */
class DensePlanSpec extends SparkSpec {
  import spark.implicits._

  /** Final physical plan: collect() THIS frame (count() builds a
    * separate QueryExecution and would leave df's own adaptive plan
    * un-finalized), then unwrap the adaptive root — so the assertions
    * run against the plan AQE actually executed, runtime
    * re-optimizations included. Returns (rowCount, plan). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    val n = df.collect().length.toLong
    (n, df.queryExecution.executedPlan)
  }

  /** Leaves of the EXECUTED plan, descending through the adaptive root
    * and the QueryStageExec boundaries AQE materializes (a plain
    * collectLeaves stops at ResultQueryStage and sees nothing). */
  private def leavesOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      leavesOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      leavesOf(q.plan)
    case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
      leavesOf(r.child)
    case l if l.children.isEmpty => Seq(l)
    case n => n.children.flatMap(leavesOf)
  }

  private def mkArray(): String = {
    val uri = TestSession.tmpDir("denseplan")
    val schema = ArraySchema(
      dims = Seq(Dim("x", "int64", Some(("0", "99"))),
        Dim("y", "int64", Some(("0", "99")))),
      attrs = Seq(Attr("v", "float64", fill = Some("-1"))),
      sparse = false)
    ArrayTable.create(spark, uri, schema)
    ArrayTable.write(spark,
      spark.range(500).select((col("id") % 100).as("x"),
        (expr("id div 100") * 20).as("y"), col("id").cast("double").as("v")),
      uri, Some(100L))
    uri
  }

  test("dense grid is Range leaves — never a driver-side local table") {
    val uri = mkArray()
    val df = Dense.read(spark, uri)
    val (n, plan) = finalPlan(df)
    // the read is right: full box, fill-completed
    assert(n == 10000L)
    val leaves = leavesOf(plan)
    val ranges = leaves.count(_.nodeName.contains("Range"))
    assert(ranges >= 2, s"expected >=2 distributed Range grid legs, " +
      s"got leaves: ${leaves.map(_.nodeName)}")
    assert(!leaves.exists(_.nodeName.contains("LocalTableScan")),
      "grid must not be materialized driver-side")
  }

  test("dense sub-box pushes dim bounds into the fragment scan") {
    val uri = mkArray()
    val boxed = Dense.read(spark, uri,
      Map("x" -> (10L, 19L), "y" -> (20L, 59L)))
    val (n, plan) = finalPlan(boxed)
    assert(n == 400L)
    val scans = leavesOf(plan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a parquet fragment scan under the join")
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    // both dims' bounds must reach the scan (row-group pruning basis)
    Seq("GreaterThanOrEqual(x,10)", "LessThanOrEqual(x,19)",
      "GreaterThanOrEqual(y,20)", "LessThanOrEqual(y,59)").foreach(f =>
      assert(pushed.contains(f), s"missing pushed filter $f in: $pushed"))
    // value spot-check: grid x fill semantics hold inside the box
    val vals = boxed.filter(col("x") === 10L && col("y") === 20L)
      .select("v").as[Double].collect()
    assert(vals.toSeq == Seq(110.0)) // id=110 -> x=10, y=20
  }
}
