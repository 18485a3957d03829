package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.ArraySchema

/** Ingestion family: the reference's `from_*` helpers are Spark readers
  * fronting the fragment writer (reference: from_pandas
  * tiledb/dataframe_.py:534-779, from_csv tiledb/dataframe_.py:811-1013,
  * from_parquet tiledb/parquet_.py:4-9, from_numpy
  * tiledb/highlevel.py:75-150). Chunked/multi-file CSV ingestion is
  * native to spark.read; each call still lands as one timestamped
  * fragment so MVCC/time-travel semantics hold for ingests too.
  */
object Ingest {

  /** CSV -> array-table (header + schema inference like the pandas
    * path; pass `schema` to pin dtypes instead). */
  def fromCsv(spark: SparkSession, csvPath: String, uri: String,
      dimCols: Seq[String], header: Boolean = true,
      inferSchema: Boolean = true, tsOpt: Option[Long] = None,
      allowsDuplicates: Boolean = false): ArrayTable.FragmentInfo = {
    val df = spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(csvPath)
    ArrayTable.ingest(spark, df, uri, dimCols, tsOpt = tsOpt,
      allowsDuplicates = allowsDuplicates)
  }

  /** Parquet -> array-table. */
  def fromParquet(spark: SparkSession, parquetPath: String, uri: String,
      dimCols: Seq[String], tsOpt: Option[Long] = None,
      allowsDuplicates: Boolean = false): ArrayTable.FragmentInfo =
    ArrayTable.ingest(spark, spark.read.parquet(parquetPath), uri, dimCols,
      tsOpt = tsOpt, allowsDuplicates = allowsDuplicates)

  /** 1-d dense-style ingest of a local sequence (the from_numpy
    * analogue): dim = 0-based index (reference: tiledb/highlevel.py:
    * 75-150). */
  def fromSeq[T](spark: SparkSession, values: Seq[T], uri: String,
      tsOpt: Option[Long] = None)
      (implicit enc: org.apache.spark.sql.Encoder[T]): ArrayTable.FragmentInfo = {
    import spark.implicits._
    val df = spark.createDataset(values).toDF("value")
      .withColumn("idx", monotonically_increasing_id())
      .select(col("idx"), col("value"))
    ArrayTable.ingest(spark, df, uri, Seq("idx"), tsOpt = tsOpt)
  }

  /** `write_direct`-style append growing one dimension: new rows get
    * dim offsets after the current max (reference: append mode of
    * write_direct, tiledb/dense_array.py:685-704). */
  def appendAlong(spark: SparkSession, df: DataFrame, uri: String,
      growDim: String, tsOpt: Option[Long] = None): ArrayTable.FragmentInfo = {
    val ned = ArrayTable.nonemptyDomain(spark, uri)
    val offset = ned.get(growDim).map {
      case (_, hi) => hi match {
        case graft.core.Json.JLong(v) => v + 1
        case graft.core.Json.JNum(v) => v.toLong + 1
        case _ => 0L
      }
    }.getOrElse(0L)
    val shifted = df.withColumn(growDim, col(growDim) + lit(offset))
    ArrayTable.write(spark, shifted, uri, tsOpt)
  }
}
