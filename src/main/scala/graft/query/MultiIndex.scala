package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-selection operators of the reference, re-expressed as Catalyst
  * predicates so Parquet row-group pruning plays the role of tile
  * pruning.
  *
  * Selection semantics reproduced:
  *  - `multi_index` (reference: tiledb/multirange_indexing.py:384-413,
  *    128-241): per dimension a point, an INCLUSIVE range, or a list of
  *    points/ranges; the result is the cross product of per-dim
  *    selections (AND across dims, OR within a dim); no negative
  *    wrap-around, no steps.
  *  - dense `__getitem__` slicing (reference: tiledb/dense_array.py:
  *    36-102,195-297; normalization tiledb/array.py:37-297): half-open
  *    int slices, negative wrap-around against the domain, steps.
  *  - `domain_index` (reference: tiledb/domain_indexer.py:16-123):
  *    inclusive coordinate slicing, no normalization — same predicate
  *    shape as a single multi_index range.
  *
  * Scale note: point lists beyond `isinThreshold` become a broadcast
  * semi-join instead of a giant `IN` literal — an `IN` with 100k items
  * neither prunes nor codegens well, while a broadcast join keeps the
  * probe side shuffle-free.
  */
object MultiIndex {

  sealed trait DimSel
  /** single coordinate */
  case class Point(v: Any) extends DimSel
  /** inclusive range; None = unbounded on that side */
  case class RangeIncl(lo: Option[Any], hi: Option[Any]) extends DimSel
  /** list of point coordinates */
  case class Points(vs: Seq[Any]) extends DimSel
  /** list of inclusive ranges (OR-ed) */
  case class Ranges(rs: Seq[RangeIncl]) extends DimSel
  case object All extends DimSel

  val isinThreshold = 1000

  def rangePred(c: Column, r: RangeIncl): Column = (r.lo, r.hi) match {
    case (Some(a), Some(b)) => c.between(lit(a), lit(b))
    case (Some(a), None)    => c >= lit(a)
    case (None, Some(b))    => c <= lit(b)
    case (None, None)       => lit(true)
  }

  def dimPred(c: Column, sel: DimSel): Option[Column] = sel match {
    case All           => None
    case Point(v)      => Some(c === lit(v))
    case r: RangeIncl  => Some(rangePred(c, r))
    case Points(vs) if vs.size <= isinThreshold => Some(c.isin(vs: _*))
    case Points(_)     => None // handled by semi-join in apply()
    case Ranges(rs)    => Some(rs.map(rangePred(c, _)).reduceLeft(_ || _))
  }

  /** Apply a multi_index selection: AND across dims of OR within dims.
    * Large point lists become broadcast left-semi joins. */
  def apply(df: DataFrame, sel: Map[String, DimSel]): DataFrame = {
    val spark = df.sparkSession
    val preds = sel.toSeq.flatMap { case (d, s) => dimPred(col(d), s) }
    val filtered = if (preds.isEmpty) df else df.filter(preds.reduceLeft(_ && _))
    // big point lists: broadcast semi-join per dim
    sel.toSeq.collect { case (d, Points(vs)) if vs.size > isinThreshold => (d, vs) }
      .foldLeft(filtered) { case (acc, (d, vs)) =>
        val pts = spark.createDataFrame(
          spark.sparkContext.parallelize(vs.map(org.apache.spark.sql.Row(_)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(d, acc.schema(d).dataType, nullable = false))))
        acc.join(broadcast(pts.distinct()), Seq(d), "left_semi")
      }
  }

  /** Normalize a numpy-style dense slice against an inclusive int domain
    * (reference: tiledb/array.py:75-94,117-297): negative wrap-around,
    * half-open upper bound, clamping, positive OR negative steps.
    *
    * Step semantics follow the reference exactly: the subarray bounds
    * are computed from (start, stop) IGNORING the step's sign
    * (tiledb/array.py:117-297 normalizes `[start, stop-1]`), and the
    * step then applies POSITIONALLY to the materialized buffer
    * (tiledb/dense_array.py:283-287, `v[::step]`) — so a negative step
    * anchors at the TOP of the subarray and walks down. That differs
    * from raw numpy slicing (where `a[10:50:-2]` is empty) and is
    * deliberate: we reproduce the reference, not numpy. Row order is a
    * separate concern (§2.9 result_order) — a DataFrame carries its
    * coordinates, so the reversed buffer order of a negative step
    * carries no information here. */
  case class DenseSlice(start: Option[Long], stop: Option[Long], step: Long = 1L) {
    require(step != 0, "slice step cannot be zero")

    /** Inclusive (lo, hi) of the subarray against the domain: negative
      * indices wrap against hi+1 (numpy-style; reference:
      * tiledb/array.py:237-239): domain (1,100), start -10 -> 91. */
    def resolve(domain: (Long, Long)): (Long, Long) = {
      val (dLo, dHi) = domain
      def wrap(v: Long): Long = if (v < 0) v + dHi + 1 else v
      val lo = start.map(wrap).getOrElse(dLo).max(dLo)
      val hi = (stop.map(wrap).getOrElse(dHi + 1) - 1).min(dHi)
      (lo, hi)
    }
  }

  def denseSlicePred(c: Column, s: DenseSlice, domain: (Long, Long)): Column = {
    val (lo, hi) = s.resolve(domain)
    val base = c >= lit(lo) && c <= lit(hi)
    if (s.step == 1) base
    else if (s.step > 0) base && ((c - lit(lo)) % lit(s.step) === lit(0))
    else base && ((lit(hi) - c) % lit(-s.step) === lit(0))
  }

  /** nonempty domain: min/max bounding box of written cells per dim
    * (reference: tiledb/array.py:687-727). One map-reduce with parquet
    * footer-stat aggregate pushdown when enabled. */
  def nonemptyDomain(df: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = dims.flatMap(d => Seq(min(col(d)).as(s"${d}_min"), max(col(d)).as(s"${d}_max")))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** distinct coordinate values of one dim
    * (reference: tiledb/sparse_array.py:636-652). */
  def uniqueDimValues(df: DataFrame, dim: String): DataFrame =
    df.select(dim).distinct()

  /** Label-based slicing: two-phase resolution — the label table maps a
    * label range to dim coordinates, then a broadcast semi-join selects
    * those coordinates from the main table (reference:
    * tiledb/array.py:987-1061, tiledb/multirange_indexing.py:663-733). */
  def labelIndex(df: DataFrame, labels: DataFrame, labelCol: String,
      dimCol: String, sel: DimSel): DataFrame = {
    val resolved = apply(labels, Map(labelCol -> sel)).select(dimCol).distinct()
    df.join(broadcast(resolved), Seq(dimCol), "left_semi")
  }
}
