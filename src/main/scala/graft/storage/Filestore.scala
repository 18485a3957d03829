package graft.storage

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core.{ArraySchema, Attr, Dim}

/** Filestore: whole files stored inside an array (reference:
  * tiledb/filestore.py:9-151). Our shape: a 1-d sparse array keyed by
  * byte offset of fixed-size chunks, attrs (data: binary). Chunking
  * keeps single rows bounded (a 10 GB blob must not be one row on a
  * real cluster); reads reassemble by ordered offset. */
object Filestore {

  val ChunkBytes = 4 * 1024 * 1024

  def schema: ArraySchema = ArraySchema(
    dims = Seq(Dim("offset", "int64")),
    attrs = Seq(Attr("data", "blob", isVar = true)))

  def create(spark: SparkSession, uri: String): Unit =
    ArrayTable.create(spark, uri, schema)

  /** store bytes (chunked) + original length in array metadata */
  def write(spark: SparkSession, uri: String, bytes: Array[Byte],
      tsOpt: Option[Long] = None): Unit = {
    if (!ArrayTable.exists(spark, uri)) create(spark, uri)
    val chunks = bytes.grouped(ChunkBytes).zipWithIndex
      .map { case (c, i) => Row(i.toLong * ChunkBytes, c) }.toSeq
    val df = spark.createDataFrame(spark.sparkContext.parallelize(chunks, math.max(1, chunks.size / 4)),
      StructType(Seq(StructField("offset", LongType, false), StructField("data", BinaryType, false))))
    ArrayTable.write(spark, df, uri, tsOpt)
    ArrayTable.putMeta(spark, uri, "file_size", graft.core.Json.JLong(bytes.length.toLong))
  }

  def read(spark: SparkSession, uri: String): Array[Byte] = {
    val rows = ArrayTable.read(spark, uri).orderBy("offset").collect()
    val out = new java.io.ByteArrayOutputStream()
    rows.foreach(r => out.write(r.getAs[Array[Byte]]("data")))
    out.toByteArray
  }

  def copyFrom(spark: SparkSession, uri: String, filePath: String): Unit =
    write(spark, uri, VFS(spark).readBytes(filePath))

  def copyTo(spark: SparkSession, uri: String, filePath: String): Unit =
    VFS(spark).writeBytes(filePath, read(spark, uri))

  def size(spark: SparkSession, uri: String): Long =
    ArrayTable.getMeta(spark, uri, "file_size")
      .collect { case graft.core.Json.JLong(v) => v }.getOrElse(0L)
}
