package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-selection channel aggregates with the reference's exact result
  * semantics (reference: tiledb/aggregation.py:4-97, tiledb/query.py:
  * 140-201; engine glue core.cc:300-583). The reference has NO group-by —
  * aggregates are scalars over the current selection, composable with
  * slicing and query conditions.
  *
  * Semantics reproduced (tested by the reference's test_aggregates.py):
  *  - sum upcasts: signed int -> int64, float -> float64
  *    (reference: core.cc:512-535); empty/all-null sum -> 0
  *  - mean is float64; count / null_count are int64 (uint64 upstream)
  *  - min/max over an empty (or all-null) selection is undefined ->
  *    null for integer attrs, NaN for float attrs
  *    (reference: core.cc:346-361,451-485; doc tiledb/query.py:151-157)
  *  - null_count is only valid on nullable attrs (error otherwise)
  *  - nulls are excluded from sum/min/max/mean; `count` counts cells
  *    read, `null_count` counts nulls
  *
  * All of this is plain `df.agg` — partial (map-side) aggregation and
  * whole-stage codegen come from Catalyst; no custom Aggregator needed.
  */
object Aggregates {

  val ops = Set("sum", "min", "max", "mean", "count", "null_count")

  /** Build one aggregate column named `attr_op` with reference dtype and
    * undefined-result rules. `dt` is the attr's Spark type, `nullable`
    * its schema nullability. */
  def aggColumn(attr: String, op: String, dt: DataType, nullable: Boolean): Column = {
    val c = col(attr)
    val isFloat = dt == FloatType || dt == DoubleType
    val out = op match {
      case "sum" =>
        val s = if (isFloat) sum(c.cast(DoubleType)) else sum(c.cast(LongType))
        coalesce(s, if (isFloat) lit(0.0) else lit(0L))
      case "min" => if (isFloat) coalesce(min(c).cast(DoubleType), lit(Double.NaN)) else min(c)
      case "max" => if (isFloat) coalesce(max(c).cast(DoubleType), lit(Double.NaN)) else max(c)
      case "mean" => coalesce(avg(c.cast(DoubleType)), lit(Double.NaN)) // empty -> NaN
      case "count" => count(lit(1))
      case "null_count" =>
        require(nullable, s"null_count is only valid on nullable attributes ($attr is not)")
        sum(when(c.isNull, 1L).otherwise(0L))
      case other => sys.error(s"unknown aggregate op: $other")
    }
    out.as(s"${attr}_$op")
  }

  /** Whole-selection aggregation: `specs` maps attr -> ops, exactly the
    * reference's `Query.agg({"a": ["sum","min"]})` shape
    * (reference: tiledb/query.py:185-201). Returns a single-row frame
    * with one `attr_op` column per pair. */
  def agg(df: DataFrame, specs: Map[String, Seq[String]]): DataFrame = {
    val cols = for {
      (attr, attrOps) <- specs.toSeq
      op <- attrOps
    } yield {
      val field = df.schema(attr)
      aggColumn(attr, op, field.dataType, field.nullable)
    }
    require(cols.nonEmpty, "no aggregates requested")
    df.agg(cols.head, cols.tail: _*)
  }
}
