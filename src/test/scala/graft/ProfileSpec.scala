package graft

import graft.ops.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one-pass long-form stats, numeric and string columns") {
    val df = Seq(
      (1L, "alpha", Some(10.0)),
      (2L, "beta", Some(20.0)),
      (3L, "beta", None),
      (4L, "gamma!", Some(40.0)),
    ).toDF("id", "name", "score")
    val p = Profile.profile(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(p(("id", "count")) == 4.0 && p(("id", "nulls")) == 0.0)
    assert(p(("id", "distinct")) == 4.0)
    assert(p(("id", "min")) == 1.0 && p(("id", "max")) == 4.0)
    assert(p(("id", "mean")) == 2.5 && p(("id", "p50")) == 2.5)
    assert(p(("name", "distinct")) == 3.0)
    assert(p(("name", "min_len")) == 4.0 && p(("name", "max_len")) == 6.0)
    assert(p(("score", "count")) == 3.0) // count(col) excludes nulls
    assert(p(("score", "nulls")) == 1.0)
    assert(p(("score", "p50")) == 20.0)
    // interpolated quartile: rank 0.25*(3-1)=0.5 between 10 and 20
    assert(p(("score", "p25")) == 15.0)
  }

  test("profile: single aggregate pass (one scan in the plan)") {
    val df = (1L to 100L).map(i => (i, s"s$i")).toDF("a", "b")
    val plan = Profile.profile(df).queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"profile must stay a single-pass aggregate:\n$plan")
  }

  test("profile: column names containing '__' label correctly") {
    val df = Seq((1L, 2L), (3L, 4L)).toDF("a__b", "a")
    val p = Profile.profile(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(p(("a__b", "count")) == 2.0 && p(("a__b", "max")) == 3.0)
    assert(p(("a", "count")) == 2.0 && p(("a", "max")) == 4.0)
    // no mislabeled ("a", "b__count")-style keys
    assert(!p.keySet.exists(_._2.contains("__")))
  }
}
