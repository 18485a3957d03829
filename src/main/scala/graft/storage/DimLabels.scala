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
    // monotonicity check: label order must follow dim order. Scale-safe
    // formulation — a global Window.orderBy(dim) would pull the whole
    // label vector into ONE partition; instead range-partition + sort by
    // the dim, verify adjacency per partition in a single narrow pass,
    // and stitch the partition boundaries on the driver (partition count
    // rows, not data rows).
    require(checkMonotonic(labels.select(col(dim), col(labelCol)), increasing),
      s"label $name is not ${if (increasing) "increasing" else "decreasing"}")
    val lu = labelUri(uri, name)
    if (!ArrayTable.exists(spark, lu)) {
      val schemaL = ArraySchema(
        dims = Seq(Dim(dim, schema.dim(dim).dtype)),
        attrs = Seq(Attr(labelCol, Dtypes.fromSpark(labels.schema(labelCol).dataType))))
      // label values are user data: a label sub-array under an
      // ENCRYPTED parent inherits the parent's key (a plaintext label
      // table beside ciphertext fragments would be a leak hole)
      ArrayTable.create(spark, lu, schemaL,
        encryptionKey = ArrayTable.encryptionKeyId(spark, uri))
    }
    ArrayTable.write(spark, labels.select(col(dim), col(labelCol)), lu)
    ArrayTable.putMeta(spark, lu, "increasing", graft.core.Json.JBool(increasing))
  }

  /** Monotonicity of column 1 (label) along column 0 (dim) without a
    * global single-partition window. Per partition emits one summary row
    * (violations, first label, last label); repartitionByRange guarantees
    * partition i's dims all precede partition i+1's, and collect()
    * preserves partition order, so cross-boundary pairs are checked
    * driver-side over O(partitions) rows. */
  private[storage] def checkMonotonic(df: DataFrame, increasing: Boolean): Boolean = {
    val dimC = df.columns(0); val labC = df.columns(1)
    val laidOut = df.repartitionByRange(col(dimC)).sortWithinPartitions(col(dimC))
    val labField = df.schema(labC)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("viol",
        org.apache.spark.sql.types.LongType, nullable = false),
      labField.copy(name = "first"), labField.copy(name = "last")))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    def bad(prev: Any, cur: Any): Boolean = {
      val c = prev.asInstanceOf[Comparable[Any]].compareTo(cur)
      if (increasing) c > 0 else c < 0
    }
    val summaries = laidOut.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        var viol = 0L
        val firstRow = rows.next()
        val first = firstRow.get(1)
        var prev = first
        rows.foreach { r =>
          val cur = r.get(1)
          if (bad(prev, cur)) viol += 1
          prev = cur
        }
        Iterator.single(org.apache.spark.sql.Row(viol, first, prev))
      }
    }.collect()
    summaries.forall(_.getLong(0) == 0L) &&
      summaries.sliding(2).forall {
        case Array(a, b) => !bad(a.get(2), b.get(1))
        case _ => true
      }
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
