package graft

import graft.core.{ArraySchema, Attr, Dim}
import graft.query.MultiIndex.{Point, RangeIncl}
import graft.storage.{ArrayTable, Dense, DimLabels}
import org.apache.spark.sql.functions._

class DenseLabelsSpec extends SparkSpec {
  import spark.implicits._

  test("dense read completes unwritten cells with fill values") {
    val uri = TestSession.tmpDir("dense")
    val schema = ArraySchema(
      dims = Seq(Dim("x", "int64", Some(("0", "9")))),
      attrs = Seq(Attr("v", "float64", fill = Some("-1")),
        Attr("s", "utf8", nullable = true, isVar = true)),
      sparse = false)
    ArrayTable.create(spark, uri, schema)
    ArrayTable.write(spark, Seq((2L, 4.0, "b"), (5L, 25.0, "e")).toDF("x", "v", "s"),
      uri, Some(100L))
    val full = Dense.read(spark, uri).orderBy("x").collect()
    assert(full.length == 10)
    assert(full(2).getDouble(1) == 4.0 && full(2).getString(2) == "b")
    assert(full(0).getDouble(1) == -1.0) // fill
    assert(full(0).isNullAt(2))          // no fill declared -> null
    // sub-box
    val box = Dense.read(spark, uri, Map("x" -> (4L, 6L))).orderBy("x").collect()
    assert(box.map(_.getLong(0)).toSeq == Seq(4L, 5L, 6L))
    assert(box(1).getDouble(1) == 25.0)
  }

  test("dense read with condition: non-matching cells filled, shape kept") {
    val uri = TestSession.tmpDir("densec")
    val schema = ArraySchema(
      dims = Seq(Dim("x", "int64", Some(("0", "4")))),
      attrs = Seq(Attr("v", "float64", fill = Some("-1"))),
      sparse = false)
    ArrayTable.create(spark, uri, schema)
    ArrayTable.write(spark, (0L to 4L).map(i => (i, i * 10.0)).toDF("x", "v"), uri, Some(100L))
    val got = Dense.read(spark, uri, cond = Some("v >= 20.0")).orderBy("x")
      .select("v").as[Double].collect()
    assert(got.toSeq == Seq(-1.0, -1.0, 20.0, 30.0, 40.0))
  }

  test("readDirect returns row-major values") {
    val uri = TestSession.tmpDir("rdirect")
    val schema = ArraySchema(
      dims = Seq(Dim("x", "int64", Some(("0", "2")))),
      attrs = Seq(Attr("v", "int64", fill = Some("0"))),
      sparse = false)
    ArrayTable.create(spark, uri, schema)
    ArrayTable.write(spark, Seq((0L, 7L), (2L, 9L)).toDF("x", "v"), uri, Some(100L))
    assert(Dense.readDirect(spark, uri, "v").toSeq == Seq(7L, 0L, 9L))
  }

  test("dimension labels: attach, list, two-phase label slice") {
    val uri = TestSession.tmpDir("dlab")
    val df = (1L to 20L).map(i => (i, i * 1.0)).toDF("x", "v")
    ArrayTable.ingest(spark, df, uri, Seq("x"), tsOpt = Some(100L), overwrite = true)
    // increasing label: date-like strings keyed by x
    val labels = (1L to 20L).map(i => (i, f"2024-01-$i%02d")).toDF("x", "day")
    DimLabels.addLabel(spark, uri, "day", "x", labels)
    assert(DimLabels.labels(spark, uri) == Seq("day"))
    val got = DimLabels.labelIndex(spark, uri, "day",
      RangeIncl(Some("2024-01-05"), Some("2024-01-08")))
      .select("x").as[Long].collect().sorted
    assert(got.toSeq == Seq(5L, 6L, 7L, 8L))
    val pt = DimLabels.labelIndex(spark, uri, "day", Point("2024-01-11"))
      .select("x").as[Long].collect()
    assert(pt.toSeq == Seq(11L))
  }

  test("non-monotonic labels are rejected") {
    val uri = TestSession.tmpDir("dlab2")
    ArrayTable.ingest(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("x", "v"), uri,
      Seq("x"), overwrite = true)
    val bad = Seq((1L, "b"), (2L, "a")).toDF("x", "lab")
    assertThrows[IllegalArgumentException] {
      DimLabels.addLabel(spark, uri, "lab", "x", bad)
    }
  }
}
