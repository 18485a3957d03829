package graft.core

import org.apache.spark.sql.types._

/** Dtype lattice of the reference engine mapped onto Spark SQL types.
  *
  * Mirrors the type table of the reference's datatype registry
  * (reference: tiledb/datatypes.py:137-179) without copying it: each
  * logical dtype keeps its reference-visible name so schemas round-trip,
  * while storage/compute use the closest native Spark type. Unsigned
  * integer types widen to the next signed Spark type (Spark has no
  * unsigned integers); `uint64` maps to LongType and documents the
  * wrap-around caveat. Sub-microsecond datetime/timedelta resolutions
  * (reference: tiledb/datatypes.py:152-175) are carried as LongType with
  * the unit recorded in the dtype name, since Spark timestamps are
  * microsecond-resolution.
  */
object Dtypes {
  /** logical dtype name -> Spark storage type */
  val toSpark: Map[String, DataType] = Map(
    "bool"    -> BooleanType,
    "int8"    -> ByteType,
    "int16"   -> ShortType,
    "int32"   -> IntegerType,
    "int64"   -> LongType,
    "uint8"   -> ShortType,   // widened: Spark has no unsigned
    "uint16"  -> IntegerType,
    "uint32"  -> LongType,
    "uint64"  -> LongType,    // caveat: values > Long.MaxValue unsupported
    "float32" -> FloatType,
    "float64" -> DoubleType,
    "ascii"   -> StringType,  // var-length ASCII pseudo-dtype
    "utf8"    -> StringType,
    "char"    -> StringType,  // fixed-width strings stored native
    "blob"    -> BinaryType,
    "geom_wkb" -> BinaryType,
    "geom_wkt" -> BinaryType,
    // datetime resolutions >= microsecond map to native timestamps
    "datetime[s]"  -> TimestampType,
    "datetime[ms]" -> TimestampType,
    "datetime[us]" -> TimestampType,
    "datetime[ns]" -> TimestampType, // truncated to us by Spark
    // timezone-naive wall-clock timestamps (parquet isAdjustedToUTC=false)
    "datetime_ntz[us]" -> TimestampNTZType,
    // coarser / finer units carried as epoch counts in that unit
    "datetime[Y]"  -> LongType, "datetime[M]" -> LongType,
    "datetime[W]"  -> LongType, "datetime[D]" -> DateType,
    "datetime[h]"  -> LongType, "datetime[m]" -> LongType,
    "datetime[ps]" -> LongType, "datetime[fs]" -> LongType, "datetime[as]" -> LongType,
    "timedelta[h]" -> DayTimeIntervalType(), "timedelta[m]" -> DayTimeIntervalType(),
    "timedelta[s]" -> DayTimeIntervalType(), "timedelta[ms]" -> DayTimeIntervalType(),
    "timedelta[us]" -> DayTimeIntervalType(),
    "timedelta[ns]" -> LongType, "timedelta[ps]" -> LongType,
    "timedelta[fs]" -> LongType, "timedelta[as]" -> LongType,
  )

  /** Spark type -> default logical dtype name (for schema inference). */
  def fromSpark(dt: DataType): String = dt match {
    case BooleanType   => "bool"
    case ByteType      => "int8"
    case ShortType     => "int16"
    case IntegerType   => "int32"
    case LongType      => "int64"
    case FloatType     => "float32"
    case DoubleType    => "float64"
    case StringType    => "utf8"
    case BinaryType    => "blob"
    case TimestampType => "datetime[us]"
    case TimestampNTZType => "datetime_ntz[us]"
    case DateType      => "datetime[D]"
    case _: DayTimeIntervalType => "timedelta[us]"
    case ArrayType(e, _) => s"array[${fromSpark(e)}]"
    case other => sys.error(s"unsupported Spark type for array-table: $other")
  }

  /** fixed multi-value cells: `array[<base>,<ncells>]` (reference:
    * homogeneous record dtypes with ncells > 1,
    * tiledb/datatypes.py:34-45,79-81) */
  private val FixedArray = """array\[(.+),(\d+)\]""".r

  def sparkType(name: String): DataType = name match {
    // complex64/128 store as 2-cell float arrays (reference:
    // tiledb/datatypes.py:59,76-77,184-186). containsNull=true because
    // parquet-sourced arrays always report nullable elements — a
    // containsNull=false target would reject every cast from a scan.
    case "complex64"  => ArrayType(FloatType, containsNull = true)
    case "complex128" => ArrayType(DoubleType, containsNull = true)
    case FixedArray(base, _) => ArrayType(sparkType(base), containsNull = true)
    case n if n.startsWith("array[") =>
      ArrayType(sparkType(n.stripSuffix("]").stripPrefix("array[")), containsNull = true)
    case n => toSpark.getOrElse(n, sys.error(s"unknown dtype: $n"))
  }

  /** Fixed cell count per value, when the dtype declares one. Writes
    * validate conformance (heterogeneous / ragged cells are rejected,
    * mirroring reference: tiledb/datatypes.py:41-42). */
  def ncellsOf(name: String): Option[Int] = name match {
    case "complex64" | "complex128" => Some(2)
    case FixedArray(_, n) => Some(n.toInt)
    case _ => None
  }

  /** dtypes valid as dimensions (reference: tiledb/dimension.py:43-44:
    * integer, unsigned, float, datetime, bytes/ascii). */
  def validDimDtype(name: String): Boolean =
    name.startsWith("int") || name.startsWith("uint") ||
    name.startsWith("float") || name.startsWith("datetime") ||
    name == "ascii" || name == "utf8"
}
