package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import graft.core.Json._
import scala.jdk.CollectionConverters._

/** Fragment manifest statistics straight from parquet FOOTERS — row
  * counts and per-dim min/max come from row-group metadata, so writing
  * a fragment never re-scans its own data (Spark's V1 parquet path has
  * no aggregate pushdown; at 100 TB a post-write stats scan would be a
  * second full read of the dims). One small metadata read per file,
  * driver-side.
  *
  * Mirrors what the reference gets from fragment metadata
  * (non-empty domain / MBRs, reference: tiledb/fragment.py:13-270).
  */
object FooterStats {

  /** (cellCount, per-dim (min, max)) from footers; None when any dim
    * lacks usable stats (caller falls back to a scan). */
  def collect(conf: Configuration, dataDir: String, dims: Seq[String])
      : Option[(Long, Map[String, (JVal, JVal)])] = try {
    val dir = new Path(dataDir)
    val fs = dir.getFileSystem(conf)
    val files = fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
    if (files.isEmpty) return None

    var rows = 0L
    val mins = scala.collection.mutable.Map.empty[String, JVal]
    val maxs = scala.collection.mutable.Map.empty[String, JVal]
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf),
        // builder(conf, path) loads the modular-decryption properties
        // from the conf's crypto factory, so encrypted-array footers
        // (graft.storage.Encryption) read here too
        org.apache.parquet.HadoopReadOptions.builder(conf, f).build())
      try {
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        footer.getBlocks.asScala.foreach { block =>
          rows += block.getRowCount
          block.getColumns.asScala.foreach { cc =>
            val name = cc.getPath.toDotString
            if (dims.contains(name)) {
              val stats = cc.getStatistics
              if (stats == null || !stats.hasNonNullValue) return None
              val fieldIdx = schema.getFieldIndex(name)
              val ptype = schema.getType(fieldIdx).asPrimitiveType()
              val lo = decode(stats.genericGetMin.asInstanceOf[AnyRef],
                ptype.getPrimitiveTypeName, ptype.getLogicalTypeAnnotation)
              val hi = decode(stats.genericGetMax.asInstanceOf[AnyRef],
                ptype.getPrimitiveTypeName, ptype.getLogicalTypeAnnotation)
              (lo, hi) match {
                case (Some(l), Some(h)) =>
                  mins(name) = minJ(mins.get(name), l)
                  maxs(name) = maxJ(maxs.get(name), h)
                case _ => return None
              }
            }
          }
        }
      } finally reader.close()
    }
    if (dims.forall(d => mins.contains(d) && maxs.contains(d)))
      Some((rows, dims.map(d => d -> (mins(d), maxs(d))).toMap))
    else if (rows == 0L) Some((0L, dims.map(d => d -> (JNull: JVal, JNull: JVal)).toMap))
    else None
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-row-group MBRs — the analogue of the reference's per-tile MBR
    * list (reference: tiledb/fragment.py `mbrs`). One footer read per
    * file; row groups without usable stats yield empty maps. */
  def rowGroupMbrs(conf: Configuration, dataDir: String, dims: Seq[String])
      : Seq[Map[String, (JVal, JVal)]] = {
    val dir = new Path(dataDir)
    val fs = dir.getFileSystem(conf)
    val files = fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf),
        // builder(conf, path) loads the modular-decryption properties
        // from the conf's crypto factory, so encrypted-array footers
        // (graft.storage.Encryption) read here too
        org.apache.parquet.HadoopReadOptions.builder(conf, f).build())
      try {
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        footer.getBlocks.asScala.map { block =>
          block.getColumns.asScala.flatMap { cc =>
            val name = cc.getPath.toDotString
            if (!dims.contains(name)) None
            else {
              val stats = cc.getStatistics
              if (stats == null || !stats.hasNonNullValue) None
              else {
                val fieldIdx = schema.getFieldIndex(name)
                val ptype = schema.getType(fieldIdx).asPrimitiveType()
                for {
                  lo <- decode(stats.genericGetMin.asInstanceOf[AnyRef],
                    ptype.getPrimitiveTypeName, ptype.getLogicalTypeAnnotation)
                  hi <- decode(stats.genericGetMax.asInstanceOf[AnyRef],
                    ptype.getPrimitiveTypeName, ptype.getLogicalTypeAnnotation)
                } yield name -> (lo, hi)
              }
            }
          }.toMap
        }.toSeq
      } finally reader.close()
    }
  }

  private def decode(v: AnyRef, t: PrimitiveTypeName,
      logical: LogicalTypeAnnotation): Option[JVal] = (v, t) match {
    case (x: java.lang.Long, _) => Some(JLong(x))
    case (x: java.lang.Integer, _) => Some(JLong(x.longValue()))
    case (x: java.lang.Double, _) => Some(JNum(x))
    case (x: java.lang.Float, _) => Some(JNum(x.doubleValue()))
    case (x: java.lang.Boolean, _) => Some(JBool(x))
    case (b: Binary, PrimitiveTypeName.BINARY)
        if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
      Some(JStr(b.toStringUsingUTF8))
    case _ => None
  }

  private def num(v: JVal): Option[Double] = v match {
    case JLong(l) => Some(l.toDouble); case JNum(d) => Some(d); case _ => None
  }

  private def minJ(cur: Option[JVal], v: JVal): JVal = cur match {
    case None => v
    case Some(c) => (num(c), num(v)) match {
      case (Some(a), Some(b)) => if (b < a) v else c
      case _ => (c, v) match {
        case (JStr(a), JStr(b)) => if (b < a) v else c
        case _ => c
      }
    }
  }

  private def maxJ(cur: Option[JVal], v: JVal): JVal = cur match {
    case None => v
    case Some(c) => (num(c), num(v)) match {
      case (Some(a), Some(b)) => if (b > a) v else c
      case _ => (c, v) match {
        case (JStr(a), JStr(b)) => if (b > a) v else c
        case _ => c
      }
    }
  }
}
