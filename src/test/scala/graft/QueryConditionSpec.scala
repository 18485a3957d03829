package graft

import graft.query.QueryCondition
import graft.query.QueryCondition._
import graft.core.{ArraySchema, Attr, Dim}

class QueryConditionSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, 10.0, "A", Some(5.0)),
    (2L, 20.0, "B", None),
    (3L, 30.0, "A", Some(7.0)),
    (4L, 40.0, "C", None),
  ).toDF("k", "v", "flag", "opt")

  private def keys(cond: String): Set[Long] =
    df.filter(QueryCondition.compile(cond)).select("k").as[Long].collect().toSet

  test("comparisons, all six operators") {
    assert(keys("v < 25.0") == Set(1L, 2L))
    assert(keys("v <= 20.0") == Set(1L, 2L))
    assert(keys("v > 25.0") == Set(3L, 4L))
    assert(keys("v >= 30.0") == Set(3L, 4L))
    assert(keys("v == 20.0") == Set(2L))
    assert(keys("v != 20.0") == Set(1L, 3L, 4L))
  }

  test("constant-side reversal: 25.0 > v means v < 25.0") {
    assert(keys("25.0 > v") == Set(1L, 2L))
    assert(keys("25.0 <= v") == Set(3L, 4L))
  }

  test("and/or with python and bitwise spellings; and binds tighter") {
    assert(keys("v < 25.0 and flag == 'A'") == Set(1L))
    assert(keys("v < 25.0 & flag == 'A'") == Set(1L))
    assert(keys("v < 15.0 or flag == 'C'") == Set(1L, 4L))
    assert(keys("v < 15.0 | flag == 'C'") == Set(1L, 4L))
    // a or b and c == a or (b and c)
    assert(keys("flag == 'C' or v < 25.0 and flag == 'A'") == Set(1L, 4L))
  }

  test("not") {
    assert(keys("not (flag == 'A')") == Set(2L, 4L))
    assert(keys("not v < 25.0") == Set(3L, 4L))
  }

  test("membership in / not in, list and tuple spellings") {
    assert(keys("flag in ['A', 'B']") == Set(1L, 2L, 3L))
    assert(keys("flag in ('A', 'B')") == Set(1L, 2L, 3L))
    assert(keys("flag not in ['A']") == Set(2L, 4L))
    assert(keys("k in [1, 3]") == Set(1L, 3L))
  }

  test("chained comparison expands to AND") {
    assert(keys("15.0 < v <= 30.0") == Set(2L, 3L))
  }

  test("attr()/dim()/val() escapes") {
    assert(keys("attr('v') < 25.0") == Set(1L, 2L))
    assert(keys("dim(\"k\") == 3") == Set(3L))
    assert(keys("v < val(25.0)") == Set(1L, 2L))
  }

  test("None comparison is a null test") {
    assert(keys("opt == None") == Set(2L, 4L))
    assert(keys("opt != None") == Set(1L, 3L))
  }

  test("schema validation rejects unknown columns") {
    val schema = ArraySchema(Seq(Dim("k", "int64")), Seq(Attr("v", "float64")))
    assertThrows[IllegalArgumentException] {
      QueryCondition.compile("nope < 3", Some(schema))
    }
    QueryCondition.compile("v < 3.0 and k == 1", Some(schema)) // ok
  }

  test("parse errors are reported") {
    assertThrows[IllegalArgumentException] { QueryCondition.parse("v <") }
    assertThrows[IllegalArgumentException] { QueryCondition.parse("") }
  }

  test("ordered-enum inequality compares by enumeration order, not lexicographically") {
    import graft.core.Enumeration
    // index order LOW < MID < HIGH; LEXICOGRAPHIC order would be
    // HIGH < LOW < MID, so a lex compare would wrongly keep HIGH rows
    val schema = ArraySchema(
      dims = Seq(Dim("k", "int64")),
      attrs = Seq(Attr("level", "utf8", enumLabel = Some("levels")),
        Attr("tag", "utf8", enumLabel = Some("tags"))),
      enums = Seq(Enumeration("levels", Seq("LOW", "MID", "HIGH"), ordered = true),
        Enumeration("tags", Seq("x", "y"))))
    val data = Seq((1L, "LOW", "x"), (2L, "MID", "y"), (3L, "HIGH", "x"))
      .toDF("k", "level", "tag")
    def sel(cond: String): Set[Long] =
      data.filter(QueryCondition.compile(cond, Some(schema)))
        .select("k").as[Long].collect().toSet
    assert(sel("level <= 'MID'") == Set(1L, 2L))     // lex would give Set(2,3)... and 1
    assert(sel("level > 'LOW'") == Set(2L, 3L))
    assert(sel("'HIGH' > level") == Set(1L, 2L))     // constant-side reversal
    assert(sel("level == 'HIGH'") == Set(3L))        // equality stays label-based
    // inequality on an UNORDERED enumeration is rejected
    assertThrows[IllegalArgumentException] { sel("tag < 'y'") }
    // unknown label in an ordered comparison is rejected
    assertThrows[IllegalArgumentException] { sel("level < 'EXTREME'") }
  }

  test("dense semantics: non-matching cells become fill values") {
    val schema = ArraySchema(Seq(Dim("k", "int64")),
      Seq(Attr("v", "float64", fill = Some("-1"))))
    val out = QueryCondition.denseApply(df.select("k", "v"), "v < 25.0", schema)
    val got = out.as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0, 2L -> 20.0, 3L -> -1.0, 4L -> -1.0))
  }

  test("fromFilter: null literal comparisons refuse; only null-safe forms translate") {
    import org.apache.spark.sql.sources._
    // SQL `c = NULL` is never-true — translating to `c == None` (IS
    // NULL) would delete every NULL row; must refuse instead
    assert(QueryCondition.fromFilter(EqualTo("v", null)).isEmpty)
    assert(QueryCondition.fromFilter(GreaterThan("v", null)).isEmpty)
    assert(QueryCondition.fromFilter(LessThanOrEqual("v", null)).isEmpty)
    // explicit null-safe forms DO mean the null test
    assert(QueryCondition.fromFilter(EqualNullSafe("v", null)).contains("v == None"))
    assert(QueryCondition.fromFilter(IsNull("v")).contains("v == None"))
    assert(QueryCondition.fromFilter(IsNotNull("v")).contains("v != None"))
  }
}
