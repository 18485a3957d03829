package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage filter pipelines (reference: tiledb/filter.py, 985 LoC).
  * Most reference filters are byte-level codecs that Parquet already
  * provides (or makes unnecessary); this maps each to its Spark/Parquet
  * knob, plus implements the two that are actual value transforms.
  *
  * | reference filter            | here                                  |
  * |-----------------------------|---------------------------------------|
  * | Gzip/Zstd/LZ4/Bzip2         | `compressionCodec` -> parquet option  |
  * | RLE / Dictionary / Delta    | parquet encodings (automatic)         |
  * | Bit/ByteShuffle, BitWidth,  | no parquet analogue -> schema         |
  * |   PositiveDelta, XOR        |   metadata no-op (recorded, ignored)  |
  * | ChecksumMD5/SHA256          | parquet page checksums                |
  * | FloatScale                  | [[floatScaleEncode]]/[[floatScaleDecode]] |
  * | WebP                        | out of scope (media codec)            |
  */
object Filters {

  /** filter-pipeline names that translate to a parquet write codec */
  def compressionCodec(filters: Seq[String]): Option[String] =
    filters.collectFirst {
      case "gzip" => "gzip"
      case "zstd" => "zstd"
      case "lz4" => "lz4"
      case "bzip2" => "zstd" // no parquet bzip2; closest ratio-oriented codec
    }

  /** Lossy FloatScale store: round((x - offset) / factor) as integer on
    * write (reference: FloatScaleFilter, tiledb/filter.py:581). */
  def floatScaleEncode(c: Column, factor: Double, offset: Double): Column =
    round((c - lit(offset)) / lit(factor), 0).cast("long")

  /** inverse transform on read */
  def floatScaleDecode(c: Column, factor: Double, offset: Double): Column =
    c.cast("double") * lit(factor) + lit(offset)

  /** Parquet WRITE options derived from the attribute filter
    * pipelines: file-level compression from the first codec filter,
    * and per-column parquet BLOOM FILTERS for attrs carrying the
    * "bloom" filter (beyond the reference — the 100 TB point-lookup
    * accelerator: an equality predicate pushed into parquet skips
    * every row group whose bloom excludes the value, so a needle
    * query on a petabyte array touches only the row groups that can
    * match). Takes (columnName, pipeline) pairs so enum attrs pass
    * their storage (code-column) name. */
  def writeOptions(cols: Seq[(String, Seq[String])]): Map[String, String] = {
    val codec = compressionCodec(cols.flatMap(_._2)).map("compression" -> _)
    val blooms = cols.collect { case (n, fs) if fs.contains("bloom") =>
      s"parquet.bloom.filter.enabled#$n" -> "true"
    }
    (codec.toSeq ++ blooms).toMap
  }

  /** names we accept into schema filter pipelines (everything else is
    * rejected at schema build, mirroring the reference's enum) */
  val known: Set[String] = Set("gzip", "zstd", "lz4", "bzip2", "rle",
    "dictionary", "delta", "double-delta", "bit-shuffle", "byte-shuffle",
    "bit-width-reduction", "positive-delta", "xor", "checksum-md5",
    "checksum-sha256", "float-scale", "noop", "bloom")
}
