package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import graft.storage.ArrayTable

/** The array-table as a first-class Spark data source:
  *
  * {{{
  *   spark.read.format("graft").load(uri)                     // full read
  *   spark.read.format("graft").option("t0","0").option("t1","1500").load(uri)
  *   df.write.format("graft").option("dims","x,y").mode("append").save(uri)
  * }}}
  *
  * Read side implements `PrunedFilteredScan`, so Catalyst hands us the
  * required columns and the pushable predicates: dim-range filters
  * become fragment MBR pruning (partition-pruning analogue) AND are
  * re-applied by the underlying parquet scan (row-group pruning);
  * column pruning propagates to the parquet reader. Write side appends
  * one immutable fragment per save (MVCC preserved for every writer).
  */
class GraftSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", sys.error("graft source needs a path"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    GraftRelation(sqlContext, path(parameters),
      parameters.get("t0").map(_.toLong), parameters.get("t1").map(_.toLong))

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val uri = path(parameters)
    val exists = ArrayTable.exists(spark, uri)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        sys.error(s"array already exists at $uri")
      case SaveMode.Ignore if exists => // no-op
      case _ =>
        val overwrite = mode == SaveMode.Overwrite
        if (!exists || overwrite) {
          val dims = parameters.getOrElse("dims",
            sys.error("graft write needs option 'dims' (comma-separated) to create an array"))
            .split(",").map(_.trim).toSeq
          val dups = parameters.get("allowsDuplicates").exists(_.toBoolean)
          ArrayTable.ingest(spark, data, uri, dims, overwrite = true,
            allowsDuplicates = dups)
        } else {
          ArrayTable.write(spark, data, uri)
        }
    }
    createRelation(sqlContext, parameters)
  }
}

case class GraftRelation(sqlContext: SQLContext, uri: String,
    t0: Option[Long], t1: Option[Long])
    extends BaseRelation with PrunedFilteredScan {

  private def spark: SparkSession = sqlContext.sparkSession
  private lazy val arraySchema = ArrayTable.schemaOf(spark, uri)

  override def schema: StructType = arraySchema.sparkSchema

  /** All filters are also evaluated by the inner plan; report none as
    * fully handled only for those we can't translate (Spark re-checks
    * everything we return). */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot(GraftRelation.translatable)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val at = (t0, t1) match {
      case (None, None) => None
      case (a, b) => Some((a.getOrElse(0L), b.getOrElse(Long.MaxValue)))
    }
    // dim bounds -> fragment MBR pruning + pushed range predicates
    val dimSet = arraySchema.dimNames.toSet
    val bounds = GraftRelation.boundsOf(filters.filter(f =>
      GraftRelation.refs(f).forall(dimSet)), dimSet)
    val base = ArrayTable.read(spark, uri, at = at, ranges = bounds)
    val withFilters = filters.flatMap(GraftRelation.toColumn)
      .foldLeft(base)(_ filter _)
    val projected =
      if (requiredColumns.isEmpty) withFilters
      else withFilters.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }
}

object GraftRelation {

  def refs(f: Filter): Seq[String] = f.references.toSeq

  def translatable(f: Filter): Boolean = toColumnOpt(f).isDefined

  def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = toColumnOpt(f)

  private def toColumnOpt(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) => for { lc <- toColumnOpt(l); rc <- toColumnOpt(r) } yield lc && rc
    case Or(l, r) => for { lc <- toColumnOpt(l); rc <- toColumnOpt(r) } yield lc || rc
    case Not(c) => toColumnOpt(c).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case _ => None
  }

  /** Extract per-dim inclusive bounds from pushable filters for
    * fragment MBR pruning. Conservative: only top-level AND-ed
    * comparisons on a single dim contribute. */
  def boundsOf(filters: Array[Filter], dims: Set[String])
      : Map[String, (Option[Any], Option[Any])] = {
    def walk(f: Filter): Seq[(String, Option[Any], Option[Any])] = f match {
      case EqualTo(a, v) if dims(a) => Seq((a, Some(v), Some(v)))
      case GreaterThan(a, v) if dims(a) => Seq((a, Some(v), None))
      case GreaterThanOrEqual(a, v) if dims(a) => Seq((a, Some(v), None))
      case LessThan(a, v) if dims(a) => Seq((a, None, Some(v)))
      case LessThanOrEqual(a, v) if dims(a) => Seq((a, None, Some(v)))
      case And(l, r) => walk(l) ++ walk(r)
      case _ => Nil
    }
    filters.flatMap(walk).groupBy(_._1).map { case (d, bs) =>
      d -> (bs.flatMap(_._2).headOption, bs.flatMap(_._3).headOption)
    }
  }
}
