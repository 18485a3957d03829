package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.storage.{ArrayTable, VFS}

/** A DSv2 `TableCatalog` over a directory tree of array-tables, so
  * SQL-first users address arrays without a single line of Scala:
  *
  * {{{
  *   SET spark.sql.catalog.graft=graft.sources.GraftCatalog
  *   SET spark.sql.catalog.graft.root=/data/arrays
  *
  *   CREATE TABLE graft.ml.docs (doc_id BIGINT, text STRING)
  *     TBLPROPERTIES ('dims'='doc_id')
  *   INSERT INTO graft.ml.docs SELECT ...       -- one MVCC fragment
  *   SELECT * FROM graft.ml.docs WHERE doc_id < 100
  *   SELECT * FROM graft.ml.docs VERSION AS OF '1500'   -- time travel
  *   DROP TABLE graft.ml.docs
  * }}}
  *
  * Namespaces are directories under `root`; a table is a directory
  * holding an array schema. Reads resolve through the same two paths
  * as `format("graft")`: metadata-clean arrays plan as a columnar
  * parquet `BatchScan`; arrays needing MVCC resolution are inlined by
  * [[graft.plans.ResolutionReadInline]] (requires
  * [[graft.core.GraftExtensions]] — set by `GraftSession`; without it,
  * resolution-needing tables fail loudly rather than serve rows that
  * skip shadowing/tombstones). Writes ride the `V1Write` bridge into
  * the fragment write path — `INSERT INTO` appends one immutable
  * fragment, `INSERT OVERWRITE` writes a whole-table truncation log
  * entry then the new fragment, and both keep full MVCC semantics
  * (time travel sees pre-insert states; `CALL system.consolidate` +
  * `vacuum` reclaim overwritten data).
  *
  * `VERSION AS OF '<ts>'` maps to the array's open-timestamp upper
  * bound (the native currency of fragment timestamps);
  * `TIMESTAMP AS OF` arrives as epoch-microseconds and maps onto the
  * same bound for arrays whose writers used epoch-micro timestamps.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catName: String = _
  private var root: String = _

  private def spark: SparkSession = SparkSession.active
  private def fs: VFS = VFS(spark)
  private def pathOf(ns: Seq[String], name: String): String =
    (root +: ns :+ name).mkString("/")
  /** Spark hands `ALTER TABLE .. RENAME TO` targets with the catalog
    * name still in the namespace — strip it before mapping to a path. */
  private def pathOf(ident: Identifier): String = {
    val ns = ident.namespace.toSeq match {
      case head +: rest if head == catName => rest
      case other => other
    }
    pathOf(ns, ident.name)
  }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs option spark.sql.catalog.$name.root"))
  }

  override def name(): String = catName

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = (root +: namespace.toSeq).mkString("/")
    if (!fs.isDir(dir)) throw new NoSuchNamespaceException(namespace.toSeq)
    fs.ls(dir).map(p => p.substring(p.lastIndexOf('/') + 1))
      .filter(n => ArrayTable.exists(spark, (dir + "/" + n)))
      .map(n => Identifier.of(namespace, n)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ArrayTable.exists(spark, pathOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = pathOf(ident)
    if (!ArrayTable.exists(spark, p)) throw new NoSuchTableException(ident)
    GraftTable(spark, p, None, None, viaCatalog = true)
  }

  /** SQL `VERSION AS OF '<ts>'`: the version string is the
    * open-timestamp upper bound. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    if (!ArrayTable.exists(spark, p)) throw new NoSuchTableException(ident)
    GraftTable(spark, p, None, Some(version.toLong), viaCatalog = true)
  }

  /** SQL `TIMESTAMP AS OF <ts>`: Spark hands epoch-microseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = pathOf(ident)
    if (!ArrayTable.exists(spark, p)) throw new NoSuchTableException(ident)
    GraftTable(spark, p, None, Some(timestamp), viaCatalog = true)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    val p = pathOf(ident)
    if (ArrayTable.exists(spark, p)) throw new TableAlreadyExistsException(ident)
    // loud failure like alterTable: silently dropping PARTITIONED BY
    // would hand back an unpartitioned layout with no signal
    require(partitions.isEmpty,
      "graft tables derive their physical layout from the array dims " +
        "(TBLPROPERTIES('dims'=...)); PARTITIONED BY is not supported")
    val dims = Option(properties.get("dims")).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "graft table needs TBLPROPERTIES('dims'='d1,d2,...')"))
    val dups = Option(properties.get("allowsDuplicates")).exists(_.toBoolean)
    // TBLPROPERTIES('encryption.key'='<keyId>') = the SQL surface of
    // Array.create(key=): the key NAME only — material must already be
    // registered via Encryption.enable, and create fails loudly if not
    val encKey = Option(properties.get("encryption.key")).map(_.trim).filter(_.nonEmpty)
    ArrayTable.create(spark, p,
      graft.core.ArraySchema.infer(schema, dims).copy(allowsDuplicates = dups),
      encryptionKey = encKey)
    GraftTable(spark, p, None, None, viaCatalog = true)
  }

  /** SQL schema evolution onto the array-native evolution mechanics:
    * `ALTER TABLE ... ADD COLUMN` becomes `addAttr` (new attr with an
    * optional fill — old fragments read it back as fill/null, no
    * rewrite), `DROP COLUMN` becomes `dropAttr` (projection-level, no
    * rewrite; dims can't be dropped). Anything else keeps the loud
    * unsupported error. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = pathOf(ident)
    if (!ArrayTable.exists(spark, p)) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"graft attrs are top-level; cannot add nested ${add.fieldNames.mkString(".")}")
        // getSql returns the literal AS SQL — a string default comes
        // quoted ('web'); the fill convention stores the raw value
        val fill = Option(add.defaultValue).map(_.getSql).map { sql =>
          if (sql.length >= 2 && sql.head == '\'' && sql.last == '\'')
            sql.substring(1, sql.length - 1).replace("''", "'")
          else sql
        }
        ArrayTable.addAttr(spark, p, graft.core.Attr(add.fieldNames()(0),
          graft.core.Dtypes.fromSpark(add.dataType), nullable = add.isNullable,
          fill = fill))
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          s"cannot drop nested ${del.fieldNames.mkString(".")}")
        val dropped = del.fieldNames()(0)
        // dropAttr filters attrs only — a dim name would silently no-op
        require(!ArrayTable.schemaOf(spark, p).dimNames
            .exists(_.equalsIgnoreCase(dropped)),
          s"cannot drop dimension '$dropped': cell coordinates are immutable")
        ArrayTable.dropAttr(spark, p, dropped)
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER on a graft table: $other (supported: ADD COLUMN, " +
          "DROP COLUMN; other evolution runs through the ArrayTable API)")
    }
    GraftTable(spark, p, None, None, viaCatalog = true)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = pathOf(ident)
    val existed = ArrayTable.exists(spark, p)
    if (existed) ArrayTable.deleteArray(spark, p)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = pathOf(oldIdent)
    if (!ArrayTable.exists(spark, from)) throw new NoSuchTableException(oldIdent)
    val to = pathOf(newIdent)
    if (ArrayTable.exists(spark, to)) throw new TableAlreadyExistsException(newIdent)
    fs.rename(from, to)
  }

  // -------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    if (!fs.isDir(root)) Array.empty
    else fs.ls(root).map(p => p.substring(p.lastIndexOf('/') + 1))
      .filter(n => !ArrayTable.exists(spark, root + "/" + n))
      .map(n => Array(n)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    fs.isDir((root +: namespace.toSeq).mkString("/"))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace.toSeq)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs((root +: namespace.toSeq).mkString("/"))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = (root +: namespace.toSeq).mkString("/")
    if (!fs.isDir(dir)) false
    else if (!cascade && fs.ls(dir).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    else fs.delete(dir)
  }

  // -------------------------------------------------------- procedures
  //
  // Array MAINTENANCE via SQL: `CALL cat.system.consolidate('ns.tbl')`
  // etc. — the operational verbs (compaction, vacuum, format
  // migration, fragment retention) that every long-lived array needs,
  // without leaving SQL. Each returns one status row of fragment
  // counts so operators can script on the result.

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{LongType, StringType}

  private def tableUri(arg: String): String = {
    val parts = arg.split("\\.").toSeq
    val p = pathOf(parts.init, parts.last)
    if (!ArrayTable.exists(spark, p))
      throw new NoSuchTableException(Identifier.of(parts.init.toArray, parts.last))
    p
  }

  /** One-status-row procedure: `body` runs the maintenance op and the
    * result row is (fragments_before, fragments_after). */
  private def proc(pname: String, desc: String,
      params: Seq[ProcedureParameter])(body: InternalRow => String): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = pname
        override def description(): String = desc
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[
            org.apache.spark.sql.connector.read.Scan] = {
          val before = ArrayTable.fragments(spark, tableUri(input.getString(0))).size
          val uri = body(input)
          val after = ArrayTable.fragments(spark, uri).size
          val schema = new StructType()
            .add("fragments_before", LongType).add("fragments_after", LongType)
          java.util.Collections.singletonList(
            new org.apache.spark.sql.connector.read.LocalScan {
              override def rows(): Array[InternalRow] =
                Array(InternalRow(before.toLong, after.toLong))
              override def readSchema(): StructType = schema
              override def description(): String = s"graft $pname status"
            }: org.apache.spark.sql.connector.read.Scan).iterator()
        }
      }
    }

  private def tableParam: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to this catalog, e.g. 'ns.tbl'").build()

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    Array("consolidate", "vacuum", "upgrade_version", "delete_fragments",
      "rekey", "profile", "histogram").map(n => Identifier.of(Array("system"), n))

  override def loadProcedure(ident: Identifier): UnboundProcedure = ident.name match {
    case "consolidate" => proc("consolidate",
      "rewrite all live fragments (and purge tombstoned rows) into one",
      Seq(tableParam)) { in =>
        val uri = tableUri(in.getString(0)); ArrayTable.consolidate(spark, uri); uri
      }
    case "vacuum" => proc("vacuum",
      "physically remove consolidated-away and trashed fragments",
      Seq(tableParam)) { in =>
        val uri = tableUri(in.getString(0)); ArrayTable.vacuum(spark, uri); uri
      }
    case "upgrade_version" => proc("upgrade_version",
      "rewrite fragments at the latest schema version (bakes in evolution)",
      Seq(tableParam)) { in =>
        val uri = tableUri(in.getString(0)); ArrayTable.upgradeVersion(spark, uri); uri
      }
    case "rekey" => proc("rekey",
      "re-encrypt the table under another registered key id ('' decrypts " +
        "to plaintext); offline maintenance — MVCC history is preserved",
      Seq(tableParam,
        ProcedureParameter.in("key_id", StringType).build())) { in =>
        val uri = tableUri(in.getString(0))
        ArrayTable.reencryptArray(spark, uri,
          Option(in.getString(1)).map(_.trim).filter(_.nonEmpty))
        uri
      }
    case "delete_fragments" => proc("delete_fragments",
      "trash whole fragments committed in [t0, t1]",
      Seq(tableParam,
        ProcedureParameter.in("t0", LongType).build(),
        ProcedureParameter.in("t1", LongType).build())) { in =>
        val uri = tableUri(in.getString(0))
        ArrayTable.deleteFragments(spark, uri, in.getLong(1), in.getLong(2)); uri
      }
    case "profile" => new UnboundProcedure {
      override def name(): String = "profile"
      override def description(): String =
        "incrementally sketch-profile fragments not yet profiled " +
          "(per-fragment HLL + exact-decimal sketches under __profile/)"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = "profile"
        override def description(): String = "incremental sketch profiling"
        override def parameters(): Array[ProcedureParameter] = Array(tableParam,
          ProcedureParameter.in("columns", StringType)
            .comment("comma-separated column names").build())
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[
            org.apache.spark.sql.connector.read.Scan] = {
          val uri = tableUri(input.getString(0))
          val cols = input.getString(1).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val sketched = graft.ops.Profile.writeFragmentSketches(spark, uri, cols)
          val total = ArrayTable.fragments(spark, uri).size
          val schema = new StructType()
            .add("fragments", LongType).add("sketched_new", LongType)
          java.util.Collections.singletonList(
            new org.apache.spark.sql.connector.read.LocalScan {
              override def rows(): Array[InternalRow] =
                Array(InternalRow(total.toLong, sketched.toLong))
              override def readSchema(): StructType = schema
              override def description(): String = "graft profile status"
            }: org.apache.spark.sql.connector.read.Scan).iterator()
        }
      }
    }
    case "histogram" => new UnboundProcedure {
      override def name(): String = "histogram"
      override def description(): String =
        "incrementally histogram fragments not yet histogrammed " +
          "(mergeable equi-width quantile sketches under __profile_hist/)"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = "histogram"
        override def description(): String = "incremental quantile histograms"
        override def parameters(): Array[ProcedureParameter] = Array(tableParam,
          ProcedureParameter.in("column", StringType).build(),
          ProcedureParameter.in("lo", org.apache.spark.sql.types.DoubleType).build(),
          ProcedureParameter.in("hi", org.apache.spark.sql.types.DoubleType).build(),
          ProcedureParameter.in("buckets", LongType).build())
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[
            org.apache.spark.sql.connector.read.Scan] = {
          val uri = tableUri(input.getString(0))
          val written = graft.ops.Profile.writeFragmentHistograms(spark, uri,
            input.getString(1).toString, input.getDouble(2), input.getDouble(3),
            input.getLong(4).toInt)
          val total = ArrayTable.fragments(spark, uri).size
          val schema = new StructType()
            .add("fragments", LongType).add("histogrammed_new", LongType)
          java.util.Collections.singletonList(
            new org.apache.spark.sql.connector.read.LocalScan {
              override def rows(): Array[InternalRow] =
                Array(InternalRow(total.toLong, written.toLong))
              override def readSchema(): StructType = schema
              override def description(): String = "graft histogram status"
            }: org.apache.spark.sql.connector.read.Scan).iterator()
        }
      }
    }
    case "history" => new UnboundProcedure {
      override def name(): String = "history"
      override def description(): String =
        "MVCC event log: one row per fragment write / delete / " +
          "truncation, in (ts, seq) order — metadata only, no data read"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = "history"
        override def description(): String = "array MVCC history"
        override def parameters(): Array[ProcedureParameter] = Array(tableParam)
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[
            org.apache.spark.sql.connector.read.Scan] = {
          import org.apache.spark.unsafe.types.UTF8String
          val uri = tableUri(input.getString(0))
          val writes = ArrayTable.fragments(spark, uri).map(f =>
            (f.ts, f.seq, InternalRow(UTF8String.fromString("write"), f.ts,
              f.seq, f.cellCount, UTF8String.fromString(f.name))))
          val dels = ArrayTable.deletes(spark, uri).map(d =>
            (d.ts, d.seq, InternalRow(
              UTF8String.fromString(if (d.truncate) "truncate" else "delete"),
              d.ts, d.seq, 0L, UTF8String.fromString(d.cond))))
          val events = (writes ++ dels).sortBy(e => (e._1, e._2)).map(_._3)
          val schema = new StructType()
            .add("kind", StringType).add("ts", LongType).add("seq", LongType)
            .add("rows", LongType).add("detail", StringType)
          java.util.Collections.singletonList(
            new org.apache.spark.sql.connector.read.LocalScan {
              override def rows(): Array[InternalRow] = events.toArray
              override def readSchema(): StructType = schema
              override def description(): String = "graft history"
            }: org.apache.spark.sql.connector.read.Scan).iterator()
        }
      }
    }
    case "cms" => new UnboundProcedure {
      override def name(): String = "cms"
      override def description(): String =
        "incrementally count-min-sketch fragments not yet sketched " +
          "(mergeable point-frequency cells under __profile_cms/)"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = "cms"
        override def description(): String = "incremental count-min sketches"
        override def parameters(): Array[ProcedureParameter] = Array(tableParam,
          ProcedureParameter.in("column", StringType).build(),
          ProcedureParameter.in("depth", LongType).build(),
          ProcedureParameter.in("width", LongType).build())
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[
            org.apache.spark.sql.connector.read.Scan] = {
          val uri = tableUri(input.getString(0))
          val written = graft.ops.Profile.writeFragmentCms(spark, uri,
            input.getString(1).toString, input.getLong(2).toInt,
            input.getLong(3).toInt)
          val total = ArrayTable.fragments(spark, uri).size
          val schema = new StructType()
            .add("fragments", LongType).add("sketched_new", LongType)
          java.util.Collections.singletonList(
            new org.apache.spark.sql.connector.read.LocalScan {
              override def rows(): Array[InternalRow] =
                Array(InternalRow(total.toLong, written.toLong))
              override def readSchema(): StructType = schema
              override def description(): String = "graft cms status"
            }: org.apache.spark.sql.connector.read.Scan).iterator()
        }
      }
    }
    case other => throw new RuntimeException(
      s"unknown graft procedure '$other' (have: consolidate, vacuum, " +
        "upgrade_version, delete_fragments, profile, histogram, cms, history)")
  }
}
