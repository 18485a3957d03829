package graft

import graft.query.Aggregates
import org.apache.spark.sql.Row

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, 2.5, Some(10L)),
    (2L, 3.5, None),
    (3L, 4.0, Some(30L)),
  ).toDF("i", "f", "n")

  test("sum upcasts: int -> long, float -> double") {
    val r = Aggregates.agg(df, Map("i" -> Seq("sum"), "f" -> Seq("sum"))).collect()(0)
    assert(r.getAs[Long]("i_sum") == 6L)
    assert(r.getAs[Double]("f_sum") == 10.0)
  }

  test("mean is double; count is long") {
    val r = Aggregates.agg(df, Map("f" -> Seq("mean", "count"))).collect()(0)
    assert(math.abs(r.getAs[Double]("f_mean") - 10.0 / 3) < 1e-12)
    assert(r.getAs[Long]("f_count") == 3L)
  }

  test("null_count counts nulls; count counts cells read") {
    val r = Aggregates.agg(df, Map("n" -> Seq("null_count", "count"))).collect()(0)
    assert(r.getAs[Long]("n_null_count") == 1L)
    assert(r.getAs[Long]("n_count") == 3L)
  }

  test("null_count on a non-nullable attr errors (reference rule)") {
    assertThrows[IllegalArgumentException] {
      Aggregates.agg(df, Map("i" -> Seq("null_count")))
    }
  }

  test("nulls excluded from sum/min/max/mean") {
    val r = Aggregates.agg(df, Map("n" -> Seq("sum", "min", "max", "mean"))).collect()(0)
    assert(r.getAs[Long]("n_sum") == 40L)
    assert(r.getAs[Long]("n_min") == 10L)
    assert(r.getAs[Long]("n_max") == 30L)
    assert(math.abs(r.getAs[Double]("n_mean") - 20.0) < 1e-12)
  }

  test("empty selection: min/max null for ints, NaN for floats, sum 0") {
    val empty = df.filter($"i" < 0)
    val r = Aggregates.agg(empty,
      Map("i" -> Seq("min", "sum", "count"), "f" -> Seq("min", "max", "sum"))).collect()(0)
    assert(r.isNullAt(r.fieldIndex("i_min")))
    assert(r.getAs[Long]("i_sum") == 0L)
    assert(r.getAs[Long]("i_count") == 0L)
    assert(r.getAs[Double]("f_min").isNaN)
    assert(r.getAs[Double]("f_max").isNaN)
    assert(r.getAs[Double]("f_sum") == 0.0)
    val m = Aggregates.agg(empty, Map("f" -> Seq("mean"))).collect()(0)
    assert(m.getAs[Double]("f_mean").isNaN)
  }
}
