package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass dataset profiling: per-column counts, null counts, distinct
  * counts, numeric moments and exact interpolated quartiles, string
  * length stats — the "what is in this 100 TB table" query.
  *
  * Everything is ONE `df.agg(...)` — a single scan with partial
  * (map-side) aggregation, no joins, no per-column passes. Exact
  * `count_distinct` and `percentile` are used so results are
  * engine-checkable (the DuckDB oracle recomputes them); at extreme
  * cardinalities swap `countDistinct` for `approx_count_distinct` and
  * `percentile` for `percentile_approx` — same plan shape, sketch
  * memory instead of exact state.
  *
  * Output is LONG-form — one row per (column, stat) — so any schema
  * profiles into the same 3-column frame (easy to store, diff between
  * snapshots, and hash-compare).
  */
object Profile {

  /** Profile `cols` (default: every column) of `df` in one aggregate
    * pass. Returns (column, stat, value: double) rows; string columns
    * report length stats, numeric columns report value stats. */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs: Seq[Column] = names.flatMap { name =>
      val c = col(name)
      val common = Seq(
        count(c).cast("double").as(s"${name}__count"),
        sum(when(c.isNull, 1L).otherwise(0L)).cast("double").as(s"${name}__nulls"),
        countDistinct(c).cast("double").as(s"${name}__distinct"))
      df.schema(name).dataType match {
        case _: NumericType => common ++ Seq(
          min(c).cast("double").as(s"${name}__min"),
          max(c).cast("double").as(s"${name}__max"),
          avg(c.cast("double")).as(s"${name}__mean"),
          percentile(c.cast("double"), lit(0.25)).as(s"${name}__p25"),
          percentile(c.cast("double"), lit(0.5)).as(s"${name}__p50"),
          percentile(c.cast("double"), lit(0.75)).as(s"${name}__p75"))
        case StringType => common ++ Seq(
          min(length(c)).cast("double").as(s"${name}__min_len"),
          max(length(c)).cast("double").as(s"${name}__max_len"),
          avg(length(c).cast("double")).as(s"${name}__mean_len"))
        case _ => common
      }
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row to (column, stat, value)
    val pairs = wide.columns.map { full =>
      // split at the LAST "__": stat names never contain it, but a
      // source column name may (e.g. "a__b__count" → ("a__b", "count"))
      val cut     = full.lastIndexOf("__")
      val colName = full.substring(0, cut)
      val stat    = full.substring(cut + 2)
      struct(lit(colName).as("column"), lit(stat).as("stat"),
        col(s"`$full`").as("value"))
    }
    wide.select(explode(array(pairs.toSeq: _*)).as("p"))
      .select(col("p.column"), col("p.stat"), col("p.value"))
  }
}
