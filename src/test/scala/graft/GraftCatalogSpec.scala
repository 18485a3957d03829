package graft

import graft.storage.ArrayTable
import org.apache.spark.sql.functions._

class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val dir = TestSession.tmpDir("catalog-root")
    spark.conf.set("spark.sql.catalog.g", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g.root", dir)
    new java.io.File(dir).mkdirs()
    dir
  }

  test("SQL DDL + INSERT + SELECT round-trip through the catalog") {
    root
    spark.sql("CREATE NAMESPACE g.ml")
    spark.sql("CREATE TABLE g.ml.points (x BIGINT, y BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('dims'='x,y')")
    assert(spark.sql("SHOW TABLES IN g.ml").collect().map(_.getString(1)).toSeq == Seq("points"))
    spark.sql("INSERT INTO g.ml.points VALUES (1, 1, 1.5), (2, 1, 2.5), (3, 2, 3.5)")
    assert(spark.sql("SELECT sum(v) FROM g.ml.points").as[Double].collect()(0) == 7.5)
    // each INSERT is one MVCC fragment
    spark.sql("INSERT INTO g.ml.points VALUES (4, 2, 4.5)")
    assert(ArrayTable.fragments(spark, s"$root/ml/points").size == 2)
    assert(spark.sql("SELECT count(*) FROM g.ml.points WHERE x <= 2").as[Long].collect()(0) == 2)
    // INSERT OVERWRITE replaces the data but keeps the table
    spark.sql("INSERT OVERWRITE g.ml.points VALUES (9, 9, 9.0)")
    assert(spark.sql("SELECT v FROM g.ml.points").as[Double].collect().toSeq == Seq(9.0))
  }

  test("CREATE TABLE with encryption.key: SQL round-trip, ciphertext on disk") {
    root
    graft.storage.Encryption.enable(spark, "sqlkey", "S" * 32)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.enc")
    spark.sql("CREATE TABLE g.enc.t (x BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('dims'='x', 'encryption.key'='sqlkey')")
    spark.sql("INSERT INTO g.enc.t VALUES (1, 1.5), (2, 2.5)")
    assert(spark.sql("SELECT sum(v) FROM g.enc.t").as[Double].head() == 4.0)
    // data files are modular-encryption ciphertext
    val dataFiles = ArrayTable.fragments(spark, s"$root/enc/t").flatMap(f =>
      new java.io.File(s"${f.path.stripPrefix("file:")}/data").listFiles().toSeq
        .filter(_.getName.endsWith(".parquet")))
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      val b = java.nio.file.Files.readAllBytes(f.toPath)
      assert(new String(b.takeRight(4), "ISO-8859-1") == "PARE",
        s"${f.getName}: SQL-created encrypted table wrote plaintext parquet")
    }
    // an unregistered key id fails at CREATE time, not at first read
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE g.enc.bad (x BIGINT, v DOUBLE) " +
        "TBLPROPERTIES ('dims'='x', 'encryption.key'='ghost')") }
    assert(e.getMessage.contains("ghost"))
    // SQL key rotation: CALL system.rekey, then the old key can go
    graft.storage.Encryption.enable(spark, Map(
      "sqlkey" -> ("S" * 32).getBytes("UTF-8"),
      "sqlkey2" -> ("T" * 32).getBytes("UTF-8")))
    spark.sql("CALL g.system.rekey('enc.t', 'sqlkey2')")
    graft.storage.Encryption.enable(spark, "sqlkey2", "T" * 32)
    assert(spark.sql("SELECT sum(v) FROM g.enc.t").as[Double].head() == 4.0)
    assert(graft.storage.ArrayTable.encryptionKeyId(spark, s"$root/enc/t")
      .contains("sqlkey2"))
  }

  test("resolution-needing arrays read correctly through the catalog") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.res")
    val uri = s"$root/res/arr"
    val sample = (1L to 100L).map(i => (i, (i % 4).toInt, i * 1.5)).toDF("x", "y", "v")
    ArrayTable.ingest(spark, sample, uri, Seq("x", "y"), tsOpt = Some(100L), overwrite = true)
    ArrayTable.write(spark, sample.limit(5).withColumn("v", lit(0.0)), uri, Some(200L))
    ArrayTable.delete(spark, uri, "y == 1", Some(300L))
    // shadowing + tombstone: the analysis-time inline must serve this
    val got = spark.sql("SELECT x, v FROM g.res.arr WHERE x <= 10 ORDER BY x")
      .as[(Long, Double)].collect()
    val expect = (1L to 10L).filter(_ % 4 != 1)
      .map(x => (x, if (x <= 5) 0.0 else x * 1.5))
    assert(got.toSeq == expect)
    // the plan is columnar — no V1 row scan exists on the catalog path
    val plan = spark.sql("SELECT x, v FROM g.res.arr WHERE x <= 10")
      .queryExecution.executedPlan
    val opaque = plan.collect {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r
      case r: org.apache.spark.sql.execution.RDDScanExec => r
    }
    assert(opaque.isEmpty, s"catalog resolution read must stay columnar:\n$plan")
  }

  test("SQL time travel via VERSION AS OF") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.tt")
    val uri = s"$root/tt/arr"
    val df = (1L to 50L).map(i => (i, i * 1.0)).toDF("x", "v")
    ArrayTable.ingest(spark, df, uri, Seq("x"), tsOpt = Some(100L), overwrite = true)
    ArrayTable.write(spark, (51L to 80L).map(i => (i, i * 1.0)).toDF("x", "v"), uri, Some(200L))
    assert(spark.sql("SELECT count(*) FROM g.tt.arr").as[Long].collect()(0) == 80)
    assert(spark.sql("SELECT count(*) FROM g.tt.arr VERSION AS OF '150'")
      .as[Long].collect()(0) == 50)
  }

  test("rename, drop, and namespace listing") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.adm")
    spark.sql("CREATE TABLE g.adm.a (k BIGINT, v DOUBLE) TBLPROPERTIES ('dims'='k')")
    spark.sql("INSERT INTO g.adm.a VALUES (1, 1.0)")
    spark.sql("ALTER TABLE g.adm.a RENAME TO g.adm.b")
    assert(spark.sql("SELECT count(*) FROM g.adm.b").as[Long].collect()(0) == 1)
    spark.sql("DROP TABLE g.adm.b")
    assert(spark.sql("SHOW TABLES IN g.adm").count() == 0)
    assert(spark.sql("SHOW NAMESPACES IN g").collect()
      .map(_.getString(0)).toSet.contains("adm"))
  }

  test("SQL DELETE FROM writes a tombstone, MVCC-visible") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.del")
    val uri = s"$root/del/arr"
    val df = (1L to 40L).map(i => (i, (i % 4).toInt, i * 1.0)).toDF("x", "y", "v")
    ArrayTable.ingest(spark, df, uri, Seq("x", "y"), tsOpt = Some(100L), overwrite = true)
    spark.sql("DELETE FROM g.del.arr WHERE y = 1 OR x > 30")
    val kept = spark.sql("SELECT x FROM g.del.arr").as[Long].collect().toSet
    assert(kept == (1L to 30L).filter(_ % 4 != 1).toSet)
    // metadata-only: a tombstone, not a rewrite — fragment intact and
    // time travel before the delete still sees all 40 rows
    assert(ArrayTable.fragments(spark, uri).size == 1)
    assert(ArrayTable.deletes(spark, uri).size == 1)
    assert(spark.sql("SELECT count(*) FROM g.del.arr VERSION AS OF '100'")
      .as[Long].collect()(0) == 40)
    // IN-list + null-test translations
    spark.sql("DELETE FROM g.del.arr WHERE x IN (2, 4) AND v IS NOT NULL")
    assert(spark.sql("SELECT count(*) FROM g.del.arr").as[Long].collect()(0) ==
      kept.size - 2)
    // bare DELETE empties the table but keeps the schema object — via a
    // truncation log entry, NOT by trashing fragments: history survives
    spark.sql("DELETE FROM g.del.arr")
    assert(spark.sql("SELECT count(*) FROM g.del.arr").as[Long].collect()(0) == 0)
    assert(ArrayTable.fragments(spark, uri).size == 1) // fragment intact
    assert(ArrayTable.deletes(spark, uri).exists(_.truncate))
    assert(spark.sql("SELECT count(*) FROM g.del.arr VERSION AS OF '100'")
      .as[Long].collect()(0) == 40) // pre-delete state still resolves
    spark.sql("INSERT INTO g.del.arr VALUES (99, 0, 1.5)")
    assert(spark.sql("SELECT count(*) FROM g.del.arr").as[Long].collect()(0) == 1)
  }

  test("INSERT OVERWRITE preserves pre-insert history (truncation, not trash)") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.ovw")
    spark.sql("CREATE TABLE g.ovw.t (x BIGINT, v DOUBLE) TBLPROPERTIES ('dims'='x')")
    val uri = s"$root/ovw/t"
    ArrayTable.write(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("x", "v"), uri, Some(100L))
    spark.sql("INSERT OVERWRITE g.ovw.t VALUES (9, 9.0)")
    assert(spark.sql("SELECT x FROM g.ovw.t").as[Long].collect().toSeq == Seq(9L))
    // the overwritten fragment is hidden, not gone
    assert(ArrayTable.fragments(spark, uri).size == 2)
    assert(spark.sql("SELECT sum(v) FROM g.ovw.t VERSION AS OF '100'")
      .as[Double].collect()(0) == 3.0)
    // manifest-served aggregates stay available post-truncation
    assert(spark.sql("SELECT count(*) FROM g.ovw.t").as[Long].collect()(0) == 1)
    // consolidate + vacuum reclaim: only the live row survives
    spark.sql("CALL g.system.consolidate('ovw.t')")
    spark.sql("CALL g.system.vacuum('ovw.t')")
    assert(ArrayTable.fragments(spark, uri).size == 1)
    assert(spark.sql("SELECT x, v FROM g.ovw.t").as[(Long, Double)].collect().toSeq
      == Seq((9L, 9.0)))
  }

  test("spark.table(...).filter(...) MBR-prunes fragment FILES (optimizer-time inline)") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.mbr")
    spark.sql("CREATE TABLE g.mbr.t (x BIGINT, v DOUBLE) TBLPROPERTIES ('dims'='x')")
    val uri = s"$root/mbr/t"
    // six disjoint fragments + a tombstone: the full resolution path
    for (i <- 0 until 6)
      ArrayTable.write(spark,
        ((i * 10 + 1).toLong to (i * 10 + 10).toLong).map(x => (x, x * 1.0)).toDF("x", "v"),
        uri, Some(100L + i))
    ArrayTable.delete(spark, uri, "x == 3", Some(500L))
    // DataFrame-INCREMENTAL read: the filter arrives after analysis, so
    // only an optimizer-time inline can see the dim bounds
    val df = spark.table("g.mbr.t").filter($"x" <= 10)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val rootPaths = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.size
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case ps: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
            ps.fileIndex.rootPaths.size
          case _ => 0
        }
    }.sum
    assert(rootPaths == 1, s"5 of 6 fragments must MBR-prune away, saw $rootPaths:\n$plan")
    assert(df.count() == 9) // x=3 tombstoned
    // full-table read still resolves everything
    assert(spark.table("g.mbr.t").count() == 59)
    // and a SQL one-statement read prunes identically (>= 51: a `> 50`
    // bound conservatively keeps the [41,50] boundary fragment)
    val sqlPlan = spark.sql("SELECT * FROM g.mbr.t WHERE x >= 51")
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val sqlPaths = sqlPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.size
    }.sum
    assert(sqlPaths == 1, s"SQL dim-range read must prune to one fragment:\n$sqlPlan")
  }

  test("CREATE TABLE PARTITIONED BY fails loudly") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.pt")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE g.pt.bad (x BIGINT, v DOUBLE) PARTITIONED BY (v) " +
        "TBLPROPERTIES ('dims'='x')")
    }
    assert(e.getMessage.contains("PARTITIONED BY"), e.getMessage)
  }

  test("SQL UPDATE commits a shadow fragment (merge-on-read)") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.upd")
    val uri = s"$root/upd/arr"
    val df = (1L to 30L).map(i => (i, (i % 3).toInt, i * 1.0)).toDF("x", "y", "v")
    ArrayTable.ingest(spark, df, uri, Seq("x"), tsOpt = Some(100L), overwrite = true)
    spark.sql("UPDATE g.upd.arr SET v = v * 10 WHERE y = 0")
    val got = spark.sql("SELECT x, v FROM g.upd.arr ORDER BY x")
      .as[(Long, Double)].collect().toSeq
    assert(got == (1L to 30L).map(i => (i, if (i % 3 == 0) i * 10.0 else i * 1.0)))
    // merge-on-read: ONE new shadow fragment, no rewrite of the base;
    // time travel before the update sees old values
    assert(ArrayTable.fragments(spark, uri).size == 2)
    assert(spark.sql("SELECT sum(v) FROM g.upd.arr VERSION AS OF '100'")
      .as[Double].collect()(0) == (1L to 30L).map(_.toDouble).sum)
    // UPDATE with no WHERE touches every row
    spark.sql("UPDATE g.upd.arr SET y = 9")
    assert(spark.sql("SELECT count(*) FROM g.upd.arr WHERE y = 9")
      .as[Long].collect()(0) == 30)
    // assigning a dimension is rejected
    val e = intercept[Exception] { spark.sql("UPDATE g.upd.arr SET x = x + 1") }
    assert(e.getMessage.contains("immutable"), e.getMessage)
  }

  test("SQL MERGE INTO: matched updates + unmatched inserts, one fragment") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.mrg")
    val uri = s"$root/mrg/arr"
    val base = (1L to 10L).map(i => (i, i * 1.0, "old")).toDF("k", "v", "tag")
    ArrayTable.ingest(spark, base, uri, Seq("k"), tsOpt = Some(100L), overwrite = true)
    // source: updates for 3,4 (one conditioned away), inserts for 11,12
    Seq((3L, 30.0), (4L, 40.0), (11L, 110.0), (12L, 120.0))
      .toDF("sk", "sv").createOrReplaceTempView("mrg_src")
    spark.sql("""MERGE INTO g.mrg.arr t USING mrg_src s ON t.k = s.sk
      WHEN MATCHED AND s.sv < 35.0 THEN UPDATE SET v = s.sv, tag = 'upd'
      WHEN MATCHED THEN UPDATE SET v = s.sv * 2, tag = 'upd2'
      WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.sk, s.sv, 'new')""")
    val got = spark.sql("SELECT k, v, tag FROM g.mrg.arr ORDER BY k")
      .as[(Long, Double, String)].collect().toSeq
    val want = (1L to 10L).map {
      case 3L => (3L, 30.0, "upd")      // first action (sv < 35)
      case 4L => (4L, 80.0, "upd2")     // second action (sv*2)
      case i => (i, i * 1.0, "old")
    } ++ Seq((11L, 110.0, "new"), (12L, 120.0, "new"))
    assert(got == want)
    // one shadow fragment; pre-merge state time-travels
    assert(ArrayTable.fragments(spark, uri).size == 2)
    assert(spark.sql("SELECT count(*) FROM g.mrg.arr VERSION AS OF '100'")
      .as[Long].collect()(0) == 10)
    // cardinality violation is loud
    Seq((5L, 1.0), (5L, 2.0)).toDF("sk", "sv").createOrReplaceTempView("mrg_dup")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO g.mrg.arr t USING mrg_dup s ON t.k = s.sk
        WHEN MATCHED THEN UPDATE SET v = s.sv""")
    }
    assert(e.getMessage.contains("cardinality"), e.getMessage)
    // matched DELETE is rejected with guidance
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO g.mrg.arr t USING mrg_src s ON t.k = s.sk
        WHEN MATCHED THEN DELETE""")
    }
    assert(e2.getMessage.contains("DELETE FROM"), e2.getMessage)
    // NOT MATCHED BY SOURCE ... UPDATE shadows the unmatched target rows
    spark.sql("""MERGE INTO g.mrg.arr t USING mrg_src s ON t.k = s.sk
      WHEN NOT MATCHED BY SOURCE AND t.k <= 2 THEN UPDATE SET tag = 'stale'""")
    val tags = spark.sql("SELECT k, tag FROM g.mrg.arr ORDER BY k")
      .as[(Long, String)].collect().toMap
    assert(tags(1L) == "stale" && tags(2L) == "stale" && tags(5L) == "old" &&
      tags(3L) == "upd" && tags(11L) == "new", tags)
  }

  test("DESCRIBE EXTENDED / SHOW TBLPROPERTIES surface array metadata") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.meta")
    spark.sql("CREATE TABLE g.meta.t (a BIGINT, b BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('dims'='a,b')")
    spark.sql("INSERT INTO g.meta.t VALUES (1, 1, 1.0)")
    val props = spark.sql("SHOW TBLPROPERTIES g.meta.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("dims") == "a,b" && props("sparse") == "true" &&
      props("fragments") == "1", props)
  }

  test("ungrouped COUNT/MIN/MAX answer from manifests, zero files read") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.agg")
    spark.sql("CREATE TABLE g.agg.t (x BIGINT, y STRING, v DOUBLE) " +
      "TBLPROPERTIES ('dims'='x,y', 'allowsDuplicates'='true')")
    spark.sql("INSERT INTO g.agg.t VALUES (5, 'b', 1.0), (1, 'a', 2.0), (9, 'c', 3.0)")
    spark.sql("INSERT INTO g.agg.t VALUES (12, 'zz', 4.0), (3, 'aa', 5.0)")
    val df = spark.sql(
      "SELECT count(*) AS n, min(x) AS lo, max(x) AS hi, max(y) AS hs FROM g.agg.t")
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)) ==
      ((5L, 1L, 12L, "zz")))
    // the plan is a local one-row scan (Spark renders a LocalScan as
    // LocalTableScan) — no parquet scan, no aggregate exec at all
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan [count(*)"), plan)
    assert(!plan.contains("Scan parquet") && !plan.contains("HashAggregate"), plan)
    // a filtered aggregate is NOT served from manifests (falls to files)
    val filtered = spark.sql("SELECT count(*) FROM g.agg.t WHERE x > 4")
    assert(filtered.collect()(0).getLong(0) == 3L)
    assert(filtered.queryExecution.executedPlan.toString.contains("HashAggregate"))
    // COUNT(attr) is declined (nullability unknown to manifests)
    val attrCount = spark.sql("SELECT count(v) FROM g.agg.t")
    assert(attrCount.collect()(0).getLong(0) == 5L)
    assert(attrCount.queryExecution.executedPlan.toString.contains("HashAggregate"))
  }

  test("readStream.table streams committed fragments by name") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.str")
    spark.sql("CREATE TABLE g.str.t (x BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('dims'='x', 'allowsDuplicates'='true')")
    spark.sql("INSERT INTO g.str.t VALUES (1, 1.0), (2, 2.0)")
    val q = spark.readStream.table("g.str.t")
      .writeStream.outputMode("append").format("memory")
      .queryName("cat_stream_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cat_stream_out").count() == 2)
      // a new INSERT (one fragment) lands in the stream
      spark.sql("INSERT INTO g.str.t VALUES (3, 3.0)")
      q.processAllAvailable()
      assert(spark.table("cat_stream_out").select("x").as[Long].collect().toSet ==
        Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("CALL procedures: consolidate + vacuum + delete_fragments via SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.proc")
    spark.sql("CREATE TABLE g.proc.t (x BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('dims'='x', 'allowsDuplicates'='true')")
    spark.sql("INSERT INTO g.proc.t VALUES (1, 1.0)")
    spark.sql("INSERT INTO g.proc.t VALUES (2, 2.0)")
    spark.sql("INSERT INTO g.proc.t VALUES (3, 3.0)")
    val st = spark.sql("CALL g.system.consolidate('proc.t')").collect()(0)
    assert((st.getLong(0), st.getLong(1)) == ((3L, 1L)), st)
    spark.sql("CALL g.system.vacuum('proc.t')")
    val uri = s"$root/proc/t"
    assert(ArrayTable.fragments(spark, uri).size == 1)
    assert(spark.sql("SELECT sum(v) FROM g.proc.t").as[Double].collect()(0) == 6.0)
    // delete_fragments with an explicit window
    val ts = ArrayTable.fragments(spark, uri).head.ts
    spark.sql(s"CALL g.system.delete_fragments('proc.t', ${ts}L, ${ts}L)")
    assert(spark.sql("SELECT count(*) FROM g.proc.t").as[Long].collect()(0) == 0)
    // procedures are discoverable
    val procs = spark.sql("SHOW PROCEDURES IN g.system").collect().map(_.toString)
    assert(procs.exists(_.contains("consolidate")), procs.toSeq)
  }

  test("CALL system.profile: incremental fragment sketches via SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.prof")
    spark.sql("CREATE TABLE g.prof.t (x BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('dims'='x', 'allowsDuplicates'='true')")
    spark.sql("INSERT INTO g.prof.t VALUES (1, 1.0), (2, 2.0)")
    spark.sql("INSERT INTO g.prof.t VALUES (3, 3.0)")
    def call() = {
      val r = spark.sql("CALL g.system.profile('prof.t', 'v')").collect()(0)
      (r.getLong(0), r.getLong(1)) // (fragments, sketched_new)
    }
    assert(call() == ((2L, 2L)))
    // second call is a no-op; a new fragment sketches incrementally
    assert(call() == ((2L, 0L)))
    spark.sql("INSERT INTO g.prof.t VALUES (4, 4.0)")
    assert(call() == ((3L, 1L)))
    val prof = graft.ops.Profile.mergedSketchProfile(spark, s"$root/prof/t")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof("v").getAs[Long]("n") == 4L)
    assert(prof("v").getAs[java.math.BigDecimal]("sum").doubleValue() == 10.0)
  }

  test("CALL system.histogram: incremental mergeable quantile sketches via SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.hist")
    spark.sql("CREATE TABLE g.hist.t (x BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('dims'='x', 'allowsDuplicates'='true')")
    spark.sql("INSERT INTO g.hist.t VALUES (1, 5.0), (2, 15.0)")
    spark.sql("INSERT INTO g.hist.t VALUES (3, 25.0), (4, 35.0)")
    def call() = {
      val r = spark.sql(
        "CALL g.system.histogram('hist.t', 'v', 0.0D, 40.0D, 4L)").collect()(0)
      (r.getLong(0), r.getLong(1)) // (fragments, histogrammed_new)
    }
    assert(call() == ((2L, 2L)))
    assert(call() == ((2L, 0L)), "second call is a no-op")
    val hist = graft.ops.Profile.mergedHistogram(spark, s"$root/hist/t", "v")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    assert(hist == Seq((0, 1L), (1, 1L), (2, 1L), (3, 1L)))
    val est = graft.ops.Profile.histogramQuantile(hist, 0.0, 40.0, 4, 0.5)
    assert(math.abs(est - 15.0) <= 10.0)
  }

  test("CALL system.cms: incremental mergeable count-min sketches via SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.cms")
    spark.sql("CREATE TABLE g.cms.t (x BIGINT, v BIGINT) TBLPROPERTIES " +
      "('dims'='x', 'allowsDuplicates'='true')")
    spark.sql("INSERT INTO g.cms.t VALUES (1, 7), (2, 7)")
    spark.sql("INSERT INTO g.cms.t VALUES (3, 7), (4, 9)")
    def call() = {
      val r = spark.sql("CALL g.system.cms('cms.t', 'v', 4L, 256L)").collect()(0)
      (r.getLong(0), r.getLong(1)) // (fragments, sketched_new)
    }
    assert(call() == ((2L, 2L)))
    assert(call() == ((2L, 0L)), "second call is a no-op")
    val est = graft.ops.Profile.cmsEstimates(spark, s"$root/cms/t", "v",
      Seq(7L, 9L, 11L).toDF("v"), "v")
      .as[(Long, Long)].collect().toMap
    assert(est(7L) >= 3L && est(9L) >= 1L, est)
    assert(est(7L) + est(9L) + est(11L) <= 8L, est) // mass-bounded
  }

  test("CALL system.history: MVCC event log in (ts, seq) order, metadata only") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.hst")
    spark.sql("CREATE TABLE g.hst.t (x BIGINT, v DOUBLE) TBLPROPERTIES ('dims'='x')")
    spark.sql("INSERT INTO g.hst.t VALUES (1, 1.0), (2, 2.0)")
    spark.sql("INSERT INTO g.hst.t VALUES (3, 3.0)")
    spark.sql("DELETE FROM g.hst.t WHERE v >= 3.0")
    val h = spark.sql("CALL g.system.history('hst.t')")
      .select($"kind", $"rows").as[(String, Long)].collect().toSeq
    assert(h.map(_._1) == Seq("write", "write", "delete"), h)
    assert(h.map(_._2) == Seq(2L, 1L, 0L), h)
    // a truncation (bare DELETE) shows up as its own event kind
    spark.sql("DELETE FROM g.hst.t")
    val kinds = spark.sql("CALL g.system.history('hst.t')")
      .select($"kind").as[String].collect().toSeq
    assert(kinds.count(_ == "truncate") == 1, kinds)
  }

  test("DELETE keeps NULL-predicate rows; NOT IN with NULL never mass-deletes") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.nul")
    val uri = s"$root/nul/arr"
    val df = Seq((1L, Some(10.0)), (2L, None), (3L, Some(2000.0)))
      .toDF("x", "v")
    ArrayTable.ingest(spark, df, uri, Seq("x"), tsOpt = Some(100L), overwrite = true)
    // SQL deletes rows where the predicate is TRUE; x=2 has v = NULL,
    // the predicate evaluates NULL there, and the row must SURVIVE
    spark.sql("DELETE FROM g.nul.arr WHERE v < 1000.0")
    assert(spark.sql("SELECT x FROM g.nul.arr ORDER BY x").as[Long].collect().toSeq ==
      Seq(2L, 3L))
    // NOT IN with a NULL element is never true in SQL: the translation
    // must refuse it (analysis error) — silently dropping the NULL
    // would delete every x != 3 instead of nothing
    val before = spark.sql("SELECT count(*) FROM g.nul.arr").as[Long].collect()(0)
    try {
      spark.sql("DELETE FROM g.nul.arr WHERE x NOT IN (3, NULL)")
      assert(spark.sql("SELECT count(*) FROM g.nul.arr").as[Long].collect()(0) ==
        before, "NOT IN (.., NULL) deleted rows — SQL semantics delete none")
    } catch { case _: Exception => () } // refusing loudly is also correct
    // predicates with no grammar form (LIKE) are refused at analysis,
    // never guessed at
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM g.nul.arr WHERE CAST(x AS STRING) LIKE '1%'")
    }
    assert(e.getMessage.toLowerCase.contains("delete"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM g.nul.arr").as[Long].collect()(0) == before)
  }

  test("ALTER TABLE ADD/DROP COLUMN evolve the array schema in place") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.evo")
    spark.sql("CREATE TABLE g.evo.t (x BIGINT, v DOUBLE) TBLPROPERTIES ('dims'='x')")
    spark.sql("INSERT INTO g.evo.t VALUES (1, 1.0), (2, 2.0)")
    spark.sql("ALTER TABLE g.evo.t ADD COLUMN bonus BIGINT DEFAULT 42")
    // pre-evolution fragments read the fill; no rewrite happened
    val got = spark.sql("SELECT x, v, bonus FROM g.evo.t ORDER BY x")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 1.0, 42L), (2L, 2.0, 42L)))
    assert(ArrayTable.fragments(spark, s"$root/evo/t").size == 1)
    spark.sql("INSERT INTO g.evo.t VALUES (3, 3.0, 7)")
    assert(spark.sql("SELECT bonus FROM g.evo.t WHERE x = 3")
      .as[Long].collect()(0) == 7L)
    spark.sql("ALTER TABLE g.evo.t DROP COLUMN bonus")
    assert(spark.table("g.evo.t").columns.toSeq == Seq("x", "v"))
    // a STRING default arrives SQL-quoted from Spark; the fill must be
    // the raw value, not 'quoted'
    spark.sql("ALTER TABLE g.evo.t ADD COLUMN tag STRING DEFAULT 'web'")
    assert(spark.sql("SELECT tag FROM g.evo.t WHERE x = 1")
      .as[String].collect()(0) == "web")
    // dropping a dimension is loudly refused, not silently ignored
    val e = intercept[Exception] { spark.sql("ALTER TABLE g.evo.t DROP COLUMN x") }
    assert(e.getMessage.contains("immutable"), e.getMessage)
    assert(spark.table("g.evo.t").columns.contains("x"))
  }

  test("catalog errors: missing table, missing dims property") {
    root
    assertThrows[Exception] { spark.sql("SELECT * FROM g.ml.nope").collect() }
    assertThrows[Exception] {
      spark.sql("CREATE TABLE g.ml.nodims (x BIGINT) ").collect()
    }
  }
}
