package graft

import graft.query.MultiIndex
import graft.query.MultiIndex._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for range semantics — the port of the reference's
  * Hypothesis `ranged_slices` strategy (reference:
  * tiledb/tests/strategies.py:8-15, test_multi_index-hp.py). */
class SliceProperties extends SparkSpec {
  import spark.implicits._

  private val n = 60L
  private lazy val df = (0L until n).map(i => (i, i * 2.0)).toDF("x", "v").cache()

  private def checkProp(p: Prop, tests: Int = 25): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(res.passed, res.status.toString)
  }

  private val bound = Gen.option(Gen.choose(-5L, n + 5))

  test("inclusive range filter matches scala reference semantics") {
    checkProp(Prop.forAll(bound, bound) { (lo, hi) =>
      val got = MultiIndex(df, Map("x" -> RangeIncl(lo, hi))).count()
      val expect = (0L until n).count(i =>
        lo.forall(i >= _) && hi.forall(i <= _))
      got == expect
    })
  }

  test("multi-range union (OR) matches reference counting") {
    val rangeGen = for { a <- Gen.choose(-5L, n + 5); len <- Gen.choose(0L, 20L) }
      yield RangeIncl(Some(a), Some(a + len))
    checkProp(Prop.forAll(Gen.nonEmptyListOf(rangeGen)) { rs =>
      val got = MultiIndex(df, Map("x" -> Ranges(rs))).count()
      val expect = (0L until n).count(i => rs.exists(r =>
        r.lo.forall(v => i >= v.asInstanceOf[Long]) &&
          r.hi.forall(v => i <= v.asInstanceOf[Long])))
      got == expect
    })
  }

  test("dense slice with steps matches numpy-style half-open semantics") {
    val startGen = Gen.option(Gen.choose(-n, n - 1))
    val stopGen = Gen.option(Gen.choose(-n, n))
    val stepGen = Gen.oneOf(Gen.choose(1L, 7L), Gen.choose(-7L, -1L))
    checkProp(Prop.forAll(startGen, stopGen, stepGen) { (start, stop, step) =>
      val domain = (0L, n - 1)
      val got = df.filter(MultiIndex.denseSlicePred($"x",
        DenseSlice(start, stop, step), domain)).count()
      // independent model of the reference semantics: subarray bounds
      // ignore the step's sign; the step applies positionally, so a
      // negative step anchors at the subarray's LAST index
      def wrap(v: Long) = if (v < 0) v + n else v
      val lo = start.map(wrap).getOrElse(0L).max(0L)
      val hiEx = stop.map(wrap).getOrElse(n).min(n)
      val expect =
        if (step > 0) (lo until hiEx).count(i => (i - lo) % step == 0)
        else (lo until hiEx).count(i => (hiEx - 1 - i) % (-step) == 0)
      got == expect
    })
  }

  test("stepped cell set equals materialize-then-v[::step] (reference model)") {
    // the strongest form of the contract: enumerate the subarray like
    // the reference's dense read buffer, apply python-style v[::step]
    // positionally, compare the SET of selected coordinates
    val startGen = Gen.option(Gen.choose(-n, n - 1))
    val stopGen = Gen.option(Gen.choose(-n, n))
    val stepGen = Gen.oneOf(Gen.choose(1L, 5L), Gen.choose(-5L, -1L))
    checkProp(Prop.forAll(startGen, stopGen, stepGen) { (start, stop, step) =>
      val domain = (0L, n - 1)
      val got = df.filter(MultiIndex.denseSlicePred($"x",
        DenseSlice(start, stop, step), domain))
        .select("x").as[Long].collect().toSet
      def wrap(v: Long) = if (v < 0) v + n else v
      val lo = start.map(wrap).getOrElse(0L).max(0L)
      val hiEx = stop.map(wrap).getOrElse(n).min(n)
      val buffer = (lo until hiEx).toVector // the materialized subarray
      val sliced = // python buffer[::step]
        if (step > 0) buffer.indices.by(step.toInt).map(buffer)
        else buffer.indices.reverse.by(step.toInt).map(buffer)
      got == sliced.toSet
    })
  }
}
