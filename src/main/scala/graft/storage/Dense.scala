package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.ArraySchema
import graft.query.QueryCondition

/** Dense-array semantics on the relational substrate (SURVEY §7.3.1):
  * every coordinate of the requested box logically exists; unwritten
  * cells read back as the attribute's fill value (reference: dense
  * cell semantics, tiledb/dense_array.py; fill values
  * tiledb/attribute.py:87-104).
  *
  * The coordinate grid is `spark.range` cross-products — lazy,
  * distributed, and prunable; the join against written cells is a
  * plain equi-join on the dims, so at scale it shuffles once on the
  * dim key (or broadcasts when the requested box is small).
  */
object Dense {

  /** Read the box [lo, hi] per dim (defaults: the dim's declared
    * domain), with fill-value completion for unwritten cells. */
  def read(spark: SparkSession, uri: String,
      box: Map[String, (Long, Long)] = Map.empty,
      cond: Option[String] = None): DataFrame = {
    val schema = ArrayTable.schemaOf(spark, uri)
    val bounds = schema.dims.map { d =>
      val b = box.get(d.name).orElse(d.domain.map(t => (t._1.toLong, t._2.toLong)))
        .getOrElse(sys.error(s"dense read needs a box or domain for dim ${d.name}"))
      (d.name, b._1, b._2, 1L)
    }
    completed(spark, uri, schema, bounds, cond)
  }

  /** Stepped dense slice (`__getitem__` with steps, positive or
    * negative): each dim's numpy-style slice resolves against the
    * declared domain, and the grid enumerates only the stepped
    * coordinates — a negative step anchors at the subarray's top, the
    * reference's positional `v[::step]` semantics
    * (tiledb/dense_array.py:283-287; see
    * [[graft.query.MultiIndex.DenseSlice]]). */
  def slice(spark: SparkSession, uri: String,
      slices: Map[String, graft.query.MultiIndex.DenseSlice],
      cond: Option[String] = None): DataFrame = {
    val schema = ArrayTable.schemaOf(spark, uri)
    val bounds = schema.dims.map { d =>
      val dom = d.domain.map(t => (t._1.toLong, t._2.toLong))
        .getOrElse(sys.error(s"dense slice needs a domain for dim ${d.name}"))
      val s = slices.getOrElse(d.name, graft.query.MultiIndex.DenseSlice(None, None))
      val (lo, hi) = s.resolve(dom)
      (d.name, lo, hi, s.step)
    }
    completed(spark, uri, schema, bounds, cond)
  }

  /** Fill-value completion over the (possibly stepped) coordinate grid:
    * `spark.range` grids stay lazy/distributed; unwritten grid cells
    * come back as the attr's fill value. */
  private def completed(spark: SparkSession, uri: String, schema: ArraySchema,
      bounds: Seq[(String, Long, Long, Long)], cond: Option[String]): DataFrame = {
    val grid = bounds.map { case (name, lo, hi, step) =>
      val ids = if (step > 0) spark.range(lo, hi + 1, step)
                else spark.range(hi, lo - 1, step) // anchor hi, walk down
      ids.select(col("id").as(name))
    }.reduceLeft(_ crossJoin _)
    val data = ArrayTable.read(spark, uri,
      ranges = bounds.map { case (n, lo, hi, _) =>
        n -> (Some(lo): Option[Any], Some(hi): Option[Any]) }.toMap)
    val condData = cond.map(c =>
      // dense + condition: matching cells keep values, others fill
      QueryCondition.denseApply(data, c, schema)).getOrElse(data)
    val joined = grid.join(condData, schema.dimNames, "left")
    val cols = schema.dims.map(d => col(d.name)) ++ schema.attrs.map { a =>
      val fill = a.fill
        .map(f => lit(QueryCondition.castFill(f, a.dtype)).cast(a.sparkField.dataType))
        .getOrElse(lit(null).cast(a.sparkField.dataType))
      coalesce(col(a.name), fill).as(a.name)
    }
    joined.select(cols: _*)
  }

  /** Whole-domain single-attribute dense read (`read_direct`/`__array__`
    * analogue, reference: tiledb/dense_array.py:730-777): values in
    * row-major coordinate order, ready for driver-side reshape. */
  def readDirect(spark: SparkSession, uri: String, attr: String): Array[Any] = {
    val schema = ArrayTable.schemaOf(spark, uri)
    read(spark, uri)
      .orderBy(schema.dimNames.map(col): _*)
      .select(attr).collect().map(_.get(0))
  }
}
