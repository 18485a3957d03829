package graft

import graft.core._
import graft.core.Json._
import graft.storage.{ArrayTable, Group, VFS}
import org.apache.spark.sql.functions._

class ArrayTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshUri(name: String): String = TestSession.tmpDir(name)

  private def sample = Seq(
    (1L, 1, 10.0, "a"),
    (1L, 2, 20.0, "b"),
    (2L, 1, 30.0, "c"),
    (5L, 1, 50.0, "d"),
  ).toDF("x", "y", "v", "s")

  private val dims = Seq("x", "y")

  test("create / schema round-trip through JSON") {
    val uri = freshUri("schema")
    val schema = ArraySchema(
      dims = Seq(Dim("x", "int64", Some(("0", "100")), Some(10L)), Dim("y", "int32")),
      attrs = Seq(
        Attr("v", "float64", fill = Some("-1")),
        Attr("s", "utf8", nullable = true, isVar = true),
        Attr("cat", "utf8", enumLabel = Some("colors"))),
      enums = Seq(Enumeration("colors", Seq("red", "green", "blue"))),
      capacity = 5000, allowsDuplicates = true)
    ArrayTable.create(spark, uri, schema)
    val back = ArrayTable.schemaOf(spark, uri)
    assert(back == schema.copy(version = 1))
    assert(Group.objectType(spark, uri) == "array")
  }

  test("write / read round-trip preserves rows and types") {
    val uri = freshUri("rt")
    ArrayTable.ingest(spark, sample, uri, dims, tsOpt = Some(10L), overwrite = true)
    val back = ArrayTable.read(spark, uri)
    assert(back.schema.fieldNames.toSeq == Seq("x", "y", "v", "s"))
    assert(back.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
      .toSet == sample.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet)
  }

  test("time travel: reads at a timestamp see only earlier fragments") {
    val uri = freshUri("tt")
    ArrayTable.ingest(spark, sample.filter($"x" === 1), uri, dims, tsOpt = Some(100L), overwrite = true)
    ArrayTable.write(spark, sample.filter($"x" =!= 1), uri, Some(200L))
    assert(ArrayTable.read(spark, uri).count() == 4)
    assert(ArrayTable.read(spark, uri, at = Some((0L, 150L))).count() == 2)
    assert(ArrayTable.read(spark, uri, at = Some((150L, 300L))).count() == 2)
    assert(ArrayTable.read(spark, uri, at = Some((0L, 50L))).count() == 0)
  }

  test("shadowing: later fragment wins at same coordinates") {
    val uri = freshUri("shadow")
    ArrayTable.ingest(spark, sample, uri, dims, tsOpt = Some(100L), overwrite = true)
    val upd = Seq((1L, 1, 99.0, "A")).toDF("x", "y", "v", "s")
    ArrayTable.write(spark, upd, uri, Some(200L))
    val got = ArrayTable.read(spark, uri).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got((1L, 1)) == 99.0)
    assert(got.size == 4)
    // time travel before the update sees the original value
    val old = ArrayTable.read(spark, uri, at = Some((0L, 150L))).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(old((1L, 1)) == 10.0)
  }

  test("allows_duplicates keeps coordinate duplicates") {
    val uri = freshUri("dups")
    ArrayTable.ingest(spark, sample, uri, dims, tsOpt = Some(100L), overwrite = true,
      allowsDuplicates = true)
    ArrayTable.write(spark, sample.filter($"x" === 1), uri, Some(200L))
    assert(ArrayTable.read(spark, uri).count() == 6)
  }

  test("conditional delete tombstones; time travel sees pre-delete state") {
    val uri = freshUri("del")
    ArrayTable.ingest(spark, sample, uri, dims, tsOpt = Some(100L), overwrite = true)
    ArrayTable.delete(spark, uri, "v >= 30.0", Some(150L))
    assert(ArrayTable.read(spark, uri).count() == 2)
    assert(ArrayTable.read(spark, uri, at = Some((0L, 120L))).count() == 4)
    // rows written AFTER the delete are not affected by it
    ArrayTable.write(spark, Seq((9L, 9, 90.0, "z")).toDF("x", "y", "v", "s"), uri, Some(200L))
    assert(ArrayTable.read(spark, uri).count() == 3)
  }

  test("delete validates the condition against the schema") {
    val uri = freshUri("delbad")
    ArrayTable.ingest(spark, sample, uri, dims, overwrite = true)
    assertThrows[IllegalArgumentException] {
      ArrayTable.delete(spark, uri, "nosuch > 1")
    }
  }

  test("delete_fragments drops a timestamp range; vacuum clears trash") {
    val uri = freshUri("delfrag")
    ArrayTable.ingest(spark, sample.filter($"x" === 1), uri, dims, tsOpt = Some(100L), overwrite = true)
    ArrayTable.write(spark, sample.filter($"x" =!= 1), uri, Some(200L))
    ArrayTable.deleteFragments(spark, uri, 150L, 250L)
    assert(ArrayTable.read(spark, uri).count() == 2)
    ArrayTable.vacuum(spark, uri)
    assert(!VFS(spark).exists(s"$uri/__trash"))
  }

  test("consolidate merges fragments, applies deletes, vacuum cleans") {
    val uri = freshUri("consol")
    ArrayTable.ingest(spark, sample.filter($"x" === 1), uri, dims, tsOpt = Some(100L), overwrite = true)
    ArrayTable.write(spark, sample.filter($"x" =!= 1), uri, Some(200L))
    ArrayTable.delete(spark, uri, "s == 'c'", Some(150L))
    val before = ArrayTable.read(spark, uri).collect().toSet
    ArrayTable.consolidate(spark, uri)
    assert(ArrayTable.fragments(spark, uri).size == 1)
    assert(ArrayTable.deletes(spark, uri).isEmpty) // purged
    assert(ArrayTable.read(spark, uri).collect().toSet == before)
    ArrayTable.vacuum(spark, uri)
  }

  test("schema evolution: added attr fills old fragments; dropped attr disappears") {
    val uri = freshUri("evolve")
    ArrayTable.ingest(spark, sample, uri, dims, tsOpt = Some(100L), overwrite = true)
    ArrayTable.addAttr(spark, uri, Attr("w", "int64", fill = Some("7")))
    val withW = ArrayTable.read(spark, uri)
    assert(withW.columns.contains("w"))
    assert(withW.select("w").as[Long].collect().forall(_ == 7L))
    // new fragment carries real w values
    ArrayTable.write(spark,
      Seq((8L, 8, 80.0, "h", 42L)).toDF("x", "y", "v", "s", "w"), uri, Some(200L))
    val all = ArrayTable.read(spark, uri).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("w"))).toMap
    assert(all(8L) == 42L && all(1L) == 7L)
    ArrayTable.dropAttr(spark, uri, "s")
    assert(!ArrayTable.read(spark, uri).columns.contains("s"))
  }

  test("enumerations: encode on write, decode on read, extend") {
    val uri = freshUri("enum")
    val schema = ArraySchema(
      dims = Seq(Dim("x", "int64")),
      attrs = Seq(Attr("color", "utf8", enumLabel = Some("colors"))),
      enums = Seq(Enumeration("colors", Seq("red", "green", "blue"))))
    ArrayTable.create(spark, uri, schema)
    val data = Seq((1L, "red"), (2L, "blue"), (3L, "green")).toDF("x", "color")
    ArrayTable.write(spark, ArrayTable.encodeEnums(data, schema), uri, Some(100L))
    val back = ArrayTable.read(spark, uri).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(back == Map(1L -> "red", 2L -> "blue", 3L -> "green"))
    ArrayTable.extendEnum(spark, uri, "colors", Seq("black"))
    val s2 = ArrayTable.schemaOf(spark, uri)
    assert(s2.enumeration("colors").values == Seq("red", "green", "blue", "black"))
    assertThrows[IllegalArgumentException] {
      Enumeration("colors", Seq("red")).extend(Seq("red"))
    }
  }

  test("nonempty domain from manifests, no data scan") {
    val uri = freshUri("ned")
    ArrayTable.ingest(spark, sample, uri, dims, tsOpt = Some(100L), overwrite = true)
    val ned = ArrayTable.nonemptyDomain(spark, uri)
    assert(ned("x") == (JLong(1L), JLong(5L)))
    assert(ned("y") == (JLong(1L), JLong(2L)))
  }

  test("MBR pruning skips non-intersecting fragments") {
    val uri = freshUri("mbr")
    ArrayTable.ingest(spark, sample.filter($"x" <= 2), uri, dims, tsOpt = Some(100L), overwrite = true)
    ArrayTable.write(spark, sample.filter($"x" > 2), uri, Some(200L))
    // range x in [4,9] intersects only fragment 2
    val df = ArrayTable.read(spark, uri, ranges = Map("x" -> (Some(4L), Some(9L))))
    assert(df.count() == 1)
    // the scan only references one fragment path
    val scanned = df.queryExecution.executedPlan.toString()
    assert(!scanned.contains("f_0000000000100"))
  }

  test("many non-overlapping fragments collapse to ONE multi-path scan") {
    val uri = freshUri("manyfrags")
    val first = Seq((0L, 0, 0.0, "z")).toDF("x", "y", "v", "s")
    ArrayTable.ingest(spark, first, uri, dims, tsOpt = Some(1L), overwrite = true)
    (1 until 20).foreach { i =>
      val df = Seq((i * 100L, 1, i * 1.0, s"s$i"), (i * 100L + 1, 1, i * 2.0, s"t$i"))
        .toDF("x", "y", "v", "s")
      ArrayTable.write(spark, df, uri, Some(i + 1L))
    }
    val read = ArrayTable.read(spark, uri)
    assert(read.count() == 39)
    val scans = read.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected 1 multi-path scan, got ${scans.size}")
    // MBR pruning still applies per fragment on the fast path
    val pruned = ArrayTable.read(spark, uri, ranges = Map("x" -> (Some(500L), Some(501L))))
    assert(pruned.count() == 2)
    val prunedScan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(prunedScan.relation.location.rootPaths.size == 1)
  }

  test("array metadata KV") {
    val uri = freshUri("meta")
    ArrayTable.ingest(spark, sample, uri, dims, overwrite = true)
    ArrayTable.putMeta(spark, uri, "owner", JStr("graft"))
    ArrayTable.putMeta(spark, uri, "version", JLong(3L))
    assert(ArrayTable.getMeta(spark, uri, "owner").contains(JStr("graft")))
    ArrayTable.putMeta(spark, uri, "owner", JStr("other"))
    assert(ArrayTable.getMeta(spark, uri, "owner").contains(JStr("other")))
    ArrayTable.deleteMeta(spark, uri, "owner")
    assert(ArrayTable.getMeta(spark, uri, "owner").isEmpty)
    assert(ArrayTable.getMeta(spark, uri, "version").contains(JLong(3L)))
  }

  test("groups: create/add/ls/walk/remove/object_type") {
    val g = freshUri("grp")
    val sub = s"$g/sub"
    val arr = freshUri("grparr")
    ArrayTable.ingest(spark, sample, arr, dims, overwrite = true)
    Group.create(spark, g)
    Group.create(spark, sub)
    Group.add(spark, g, sub, Some("sub"))
    Group.add(spark, g, arr, Some("data"))
    Group.add(spark, sub, arr, Some("data2"))
    assert(Group.members(spark, g).map(_.objectType).sorted == Seq("array", "group"))
    assert(Group.walk(spark, g).size == 3)
    Group.remove(spark, g, arr)
    assert(Group.members(spark, g).size == 1)
    assert(Group.objectType(spark, g) == "group")
    assert(Group.objectType(spark, freshUri("nothing")) == "invalid")
  }
}
