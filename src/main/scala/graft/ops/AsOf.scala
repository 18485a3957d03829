package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: for each left row, the matching right row
  * with the same keys by timestamp direction — "backward" (most recent
  * right.ts <= left.ts, the default), "forward" (earliest right.ts >=
  * left.ts), or "nearest" (closer of the two, backward on ties — the
  * pandas merge_asof direction set) — optionally within a tolerance.
  *
  * Built by composition (SURVEY §7.2 preference (a)): tag both sides,
  * union, ONE window pass per key carrying the adjacent right payload
  * across the timeline (last-before for backward, first-after for
  * forward, both frames in the same pass for nearest). This shuffles
  * each row exactly once on the join keys — unlike a range-join
  * (quadratic blowup per key) or a per-left-row subquery. At equal
  * timestamps the right row matches in every direction (same
  * inclusive rule as DuckDB/pandas ASOF): backward sorts the right
  * row first, forward sorts it after the left row, and nearest takes
  * it through the backward frame at distance zero.
  */
object AsOf {

  /** @param toleranceUs maximum |left.ts - right.ts| in MICROSECONDS —
    *   compared via `unix_micros`, so sub-second tolerances are exact
    *   (a cast-to-long comparison would truncate to whole seconds).
    * @param direction "backward" | "forward" | "nearest" */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "right_",
      toleranceUs: Option[Long] = None, inner: Boolean = true,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    // side tag orders equal timestamps: backward/nearest want the
    // right row BEFORE the left (0 < 1) so the preceding frame holds
    // it; forward wants it AFTER (2 > 1) so the following frame does
    val rSide = if (direction == "forward") 2 else 0
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")
        :+ struct(rPayload.map(col): _*).as("__r")): _*)
      .withColumn("__side", lit(rSide))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val wBase = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
    val wBack = wBase.rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = wBase.rowsBetween(0, Window.unboundedFollowing)
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    def dist(m: Column) = {
      val d = micros(col("__ts")) - micros(m.getField(rightTs).cast("timestamp"))
      when(m.isNotNull, abs(d))
    }
    def withinTol(m: Column) = toleranceUs match {
      case Some(tol) => m.isNotNull && dist(m) <= tol
      case None => m.isNotNull
    }
    val carried = direction match {
      case "backward" =>
        u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(wBack))
      case "forward" =>
        u.withColumn("__m", first(col("__r"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        // equal-ts rights ride the backward frame (distance 0 always
        // wins); the forward frame sees strictly-later rights only
        val both = u
          .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wBack))
          .withColumn("__mf", first(col("__r"), ignoreNulls = true).over(wFwd))
        val okb = withinTol(col("__mb"))
        val okf = withinTol(col("__mf"))
        both.withColumn("__m",
          when(okb && (!okf || dist(col("__mb")) <= dist(col("__mf"))), col("__mb"))
            .when(okf, col("__mf")))
          .drop("__mb", "__mf")
    }
    val matchOk = withinTol(col("__m"))
    val leftRows = carried.filter(col("__side") === 1)
      .withColumn("__ok", matchOk)
    val filtered = if (inner) leftRows.filter(col("__ok")) else leftRows
    val outCols = left.columns.map(col).toSeq ++ rPayload.map(p =>
      when(col("__ok"), col(s"__m.$p")).otherwise(lit(null)).as(rightPrefix + p))
    filtered.select(outCols: _*)
  }
}
