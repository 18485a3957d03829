package graft

import graft.query.MultiIndex
import graft.query.MultiIndex._
import org.apache.spark.sql.functions._

class MultiIndexSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1L to 100L).map(i => (i, i % 7, i * 1.5)).toDF("x", "y", "v")

  test("point, inclusive range, point list, range list; AND across dims") {
    assert(MultiIndex(df, Map("x" -> Point(5L))).count() == 1)
    assert(MultiIndex(df, Map("x" -> RangeIncl(Some(10L), Some(20L)))).count() == 11)
    assert(MultiIndex(df, Map("x" -> RangeIncl(None, Some(10L)))).count() == 10)
    assert(MultiIndex(df, Map("x" -> RangeIncl(Some(91L), None))).count() == 10)
    assert(MultiIndex(df, Map("x" -> Points(Seq(1L, 2L, 200L)))).count() == 2)
    assert(MultiIndex(df, Map("x" -> Ranges(Seq(
      RangeIncl(Some(1L), Some(5L)), RangeIncl(Some(50L), Some(54L))))))
      .count() == 10)
    assert(MultiIndex(df, Map(
      "x" -> RangeIncl(Some(1L), Some(50L)),
      "y" -> Points(Seq(0L, 1L)))).count() == 15)
  }

  test("large point lists switch to broadcast semi-join, same result") {
    val pts = (1L to 5000L by 3L).toSeq // > isinThreshold
    assert(pts.size > MultiIndex.isinThreshold)
    val got = MultiIndex(df, Map("x" -> Points(pts))).count()
    val expected = (1L to 100L).count(i => pts.contains(i))
    assert(got == expected)
  }

  test("dense slice normalization: half-open, negative wrap, steps") {
    val domain = (1L, 100L)
    // [10, 20) -> 10..19
    assert(df.filter(denseSlicePred($"x", DenseSlice(Some(10L), Some(20L)), domain)).count() == 10)
    // negative start wraps against hi+1: -10 -> 91, yielding 91..100
    assert(df.filter(denseSlicePred($"x", DenseSlice(Some(-10L), None), domain)).count() == 10)
    // step 3 on [1, 10): 1,4,7
    val stepped = df.filter(denseSlicePred($"x", DenseSlice(Some(1L), Some(10L), 3L), domain))
      .select("x").as[Long].collect().sorted
    assert(stepped.toSeq == Seq(1L, 4L, 7L))
    // negative step anchors at the subarray TOP (reference positional
    // v[::step], dense_array.py:283-287): [1,10) step -3 -> 9,6,3
    val revStepped = df.filter(denseSlicePred($"x", DenseSlice(Some(1L), Some(10L), -3L), domain))
      .select("x").as[Long].collect().sorted
    assert(revStepped.toSeq == Seq(3L, 6L, 9L))
    // step -1 over the full domain selects everything (order is the
    // caller's concern; the cell set is the whole subarray)
    assert(df.filter(denseSlicePred($"x", DenseSlice(None, None, -1L), domain)).count() == 100)
    // [-10, None] step -4: subarray 91..100, anchor 100 -> 100,96,92
    val wrapRev = df.filter(denseSlicePred($"x", DenseSlice(Some(-10L), None, -4L), domain))
      .select("x").as[Long].collect().sorted
    assert(wrapRev.toSeq == Seq(92L, 96L, 100L))
    assertThrows[IllegalArgumentException] { DenseSlice(None, None, 0L) }
  }

  test("nonempty_domain and unique_dim_values") {
    val ned = MultiIndex.nonemptyDomain(df, Seq("x", "y")).collect()(0)
    assert(ned.getAs[Long]("x_min") == 1L && ned.getAs[Long]("x_max") == 100L)
    assert(MultiIndex.uniqueDimValues(df, "y").count() == 7)
  }

  test("label_index: label range resolves to dim coordinates") {
    val labels = Seq((10L, "a"), (20L, "b"), (30L, "c"), (40L, "d"))
      .toDF("x", "lab")
    val got = MultiIndex.labelIndex(df, labels, "lab", "x",
      RangeIncl(Some("b"), Some("c")))
      .select("x").as[Long].collect().sorted
    assert(got.toSeq == Seq(20L, 30L))
  }
}
