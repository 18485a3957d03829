package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: for each left row, the most recent right row
  * with the same keys and right.ts <= left.ts (inclusive), optionally
  * within a tolerance.
  *
  * Built by composition (SURVEY §7.2 preference (a)): tag both sides,
  * union, ONE window pass per key carrying the last-seen right payload
  * forward. This shuffles each row exactly once on the join keys —
  * unlike a range-join (quadratic blowup per key) or a per-left-row
  * subquery. At equal timestamps the right row sorts first, so
  * equality matches (same rule as DuckDB/pandas ASOF).
  */
object AsOf {

  /** @param toleranceUs maximum left.ts - right.ts in MICROSECONDS —
    *   compared via `unix_micros`, so sub-second tolerances are exact
    *   (a cast-to-long comparison would truncate to whole seconds). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "right_",
      toleranceUs: Option[Long] = None, inner: Boolean = true): DataFrame = {
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")
        :+ struct(rPayload.map(col): _*).as("__r")): _*)
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val matchOk = toleranceUs match {
      case Some(tol) => col("__m").isNotNull &&
        unix_micros(col("__ts").cast("timestamp")) -
          unix_micros(col(s"__m.$rightTs").cast("timestamp")) <= tol
      case None => col("__m").isNotNull
    }
    val leftRows = carried.filter(col("__side") === 1)
      .withColumn("__ok", matchOk)
    val filtered = if (inner) leftRows.filter(col("__ok")) else leftRows
    val outCols = left.columns.map(col).toSeq ++ rPayload.map(p =>
      when(col("__ok"), col(s"__m.$p")).otherwise(lit(null)).as(rightPrefix + p))
    filtered.select(outCols: _*)
  }
}
