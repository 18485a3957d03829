package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ArraySchema, Attr, Dim, Dtypes}
import graft.query.MultiIndex
import graft.query.MultiIndex.DimSel

/** Dimension labels: secondary monotonic label vectors attached to a
  * dimension, enabling label-based slicing (reference:
  * tiledb/dimension_label.py:12-113, label_index two-phase resolution
  * tiledb/array.py:987-1061, tiledb/multirange_indexing.py:663-733).
  *
  * Storage: each label is a companion array-table under
  * `uri/__labels/<name>` keyed by the dimension, with the label as its
  * single attribute. Resolution is the reference's two-phase plan:
  * (1) slice the label table by label range -> dim coordinates,
  * (2) broadcast semi-join those coordinates into the main read.
  */
object DimLabels {

  private def labelUri(uri: String, name: String) = s"$uri/__labels/$name"

  /** Attach a label vector (rows: dim value, label value). `increasing`
    * is validated lazily on write via a monotonicity check. */
  def addLabel(spark: SparkSession, uri: String, name: String, dim: String,
      labels: DataFrame, increasing: Boolean = true): Unit = {
    val schema = ArrayTable.schemaOf(spark, uri)
    require(schema.dims.exists(_.name == dim), s"no dim $dim")
    val cols = labels.columns
    require(cols.contains(dim), s"label frame must carry dim column $dim")
    val labelCol = cols.filterNot(_ == dim).head
    // monotonicity check: label order must follow dim order
    val viol = labels.select(col(dim), col(labelCol))
      .withColumn("__lag", lag(col(labelCol), 1)
        .over(org.apache.spark.sql.expressions.Window.orderBy(col(dim))))
      .filter(if (increasing) col(labelCol) < col("__lag") else col(labelCol) > col("__lag"))
      .limit(1).count()
    require(viol == 0, s"label $name is not ${if (increasing) "increasing" else "decreasing"}")
    val lu = labelUri(uri, name)
    if (!ArrayTable.exists(spark, lu)) {
      val schemaL = ArraySchema(
        dims = Seq(Dim(dim, schema.dim(dim).dtype)),
        attrs = Seq(Attr(labelCol, Dtypes.fromSpark(labels.schema(labelCol).dataType))))
      ArrayTable.create(spark, lu, schemaL)
    }
    ArrayTable.write(spark, labels.select(col(dim), col(labelCol)), lu)
    ArrayTable.putMeta(spark, lu, "increasing", graft.core.Json.JBool(increasing))
  }

  def labels(spark: SparkSession, uri: String): Seq[String] =
    VFS(spark).ls(s"$uri/__labels").map(p => p.substring(p.lastIndexOf('/') + 1))

  /** Two-phase label slice: label selection -> dim coords -> main read
    * restricted to those coords. */
  def labelIndex(spark: SparkSession, uri: String, name: String,
      sel: DimSel): DataFrame = {
    val lu = labelUri(uri, name)
    val labelTable = ArrayTable.read(spark, lu)
    val schemaL = ArrayTable.schemaOf(spark, lu)
    val dim = schemaL.dimNames.head
    val labelCol = schemaL.attrNames.head
    val coords = MultiIndex(labelTable, Map(labelCol -> sel)).select(dim).distinct()
    ArrayTable.read(spark, uri).join(broadcast(coords), Seq(dim), "left_semi")
  }
}
