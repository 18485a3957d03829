package graft

import graft.ops.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._
  import graft.storage.ArrayTable

  test("fragment sketches: incremental writes, exact merges, HLL ndv in bounds") {
    val uri = TestSession.tmpDir("profile-sketch")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_suppkey")
    val lo = li.filter($"l_orderkey" % 2 === 0)
    val hi = li.filter($"l_orderkey" % 2 =!= 0)
    ArrayTable.ingest(spark, lo, uri, Seq("l_orderkey", "l_linenumber"),
      tsOpt = Some(1000L), overwrite = true, allowsDuplicates = true)
    ArrayTable.ingest(spark, hi, uri, Seq("l_orderkey", "l_linenumber"),
      tsOpt = Some(2000L), allowsDuplicates = true)
    val cols = Seq("l_quantity", "l_suppkey")
    // first pass sketches both fragments; second is a no-op (incremental)
    assert(graft.ops.Profile.writeFragmentSketches(spark, uri, cols) == 2)
    assert(graft.ops.Profile.writeFragmentSketches(spark, uri, cols) == 0)
    val prof = graft.ops.Profile.mergedSketchProfile(spark, uri)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = li.agg(
      count($"l_quantity"), min($"l_quantity"), max($"l_quantity"),
      sum($"l_quantity".cast("decimal(32,6)")),
      countDistinct($"l_suppkey")).collect()(0)
    val q = prof("l_quantity")
    assert(q.getAs[Long]("n") == exact.getLong(0))
    assert(q.getAs[Double]("min") == exact.getDouble(1))
    assert(q.getAs[Double]("max") == exact.getDouble(2))
    assert(q.getAs[java.math.BigDecimal]("sum").compareTo(
      exact.getAs[java.math.BigDecimal](3)) == 0, "merged decimal sum is exact")
    // HLL estimate within 5% of exact distinct (lgConfigK=12 rsd ~1.6%)
    val ndv = prof("l_suppkey").getAs[Long]("ndv_estimate").toDouble
    val ed = exact.getLong(4).toDouble
    assert(math.abs(ndv - ed) / ed < 0.05, s"ndv $ndv vs exact $ed")
    // a third fragment sketches incrementally and shifts the merge
    val extra = Seq((9999999L, 1, 99.0, 42L))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_suppkey")
      .select(li.columns.map(col): _*)
    ArrayTable.ingest(spark, extra, uri, Seq("l_orderkey", "l_linenumber"),
      tsOpt = Some(3000L), allowsDuplicates = true)
    assert(graft.ops.Profile.writeFragmentSketches(spark, uri, cols) == 1)
    val q2 = graft.ops.Profile.mergedSketchProfile(spark, uri)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(q2("l_quantity").getAs[Long]("n") == exact.getLong(0) + 1)
    assert(q2("l_quantity").getAs[Double]("max") == 99.0)
  }

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

  test("histogram quantiles: exact merges, bounded error at every q, pinned bounds") {
    val uri = TestSession.tmpDir("profile-hist")
    // values 0..999 split across two fragments by parity
    val all = (0 until 1000).map(i => (i.toLong, i.toDouble))
    val df = all.toDF("id", "v")
    ArrayTable.ingest(spark, df.filter($"id" % 2 === 0), uri, Seq("id"),
      tsOpt = Some(1000L), overwrite = true)
    ArrayTable.ingest(spark, df.filter($"id" % 2 =!= 0), uri, Seq("id"),
      tsOpt = Some(2000L))
    val (lo, hi, nb) = (0.0, 1000.0, 40)
    assert(Profile.writeFragmentHistograms(spark, uri, "v", lo, hi, nb) == 2)
    assert(Profile.writeFragmentHistograms(spark, uri, "v", lo, hi, nb) == 0,
      "second pass must be a no-op")
    // different bounds must refuse (merging mixed bounds = garbage)
    intercept[IllegalArgumentException](
      Profile.writeFragmentHistograms(spark, uri, "v", lo, 999.0, nb))
    val hist = Profile.mergedHistogram(spark, uri, "v")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(hist.map(_._2).sum == 1000L)
    // merged counts equal a direct whole-data histogram
    assert(hist.sortBy(_._1) == (0 until nb).map(b => (b, 25L)))
    val width = (hi - lo) / nb
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = Profile.histogramQuantile(hist, lo, hi, nb, q)
      val exact = df.agg(percentile($"v", lit(q))).head().getDouble(0)
      assert(math.abs(est - exact) <= width,
        s"q=$q est=$est exact=$exact width=$width")
    }
    // incremental: a third fragment shifts the merge by exactly its counts
    ArrayTable.ingest(spark, Seq((5000L, 999.5)).toDF("id", "v"), uri,
      Seq("id"), tsOpt = Some(3000L))
    assert(Profile.writeFragmentHistograms(spark, uri, "v", lo, hi, nb) == 1)
    val hist2 = Profile.mergedHistogram(spark, uri, "v")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(hist2(nb - 1) == 26L && hist2.values.sum == 1001L)
  }

  test("histogram drift: windowed sidecar merges, TV distance, planted shift") {
    val uri = TestSession.tmpDir("profile-drift")
    // window 1: uniform 0..99; window 2 adds a mass spike at 90..99
    val w1 = (0 until 1000).map(i => (i.toLong, (i % 100).toDouble))
    val w2 = (0 until 500).map(i => (5000L + i, 90.0 + (i % 10)))
    ArrayTable.ingest(spark, w1.toDF("id", "v"), uri, Seq("id"),
      tsOpt = Some(1000L), overwrite = true)
    ArrayTable.ingest(spark, w2.toDF("id", "v"), uri, Seq("id"),
      tsOpt = Some(2000L))
    val (lo, hi, nb) = (0.0, 100.0, 10)
    assert(Profile.writeFragmentHistograms(spark, uri, "v", lo, hi, nb) == 2)
    def hist(at: Option[(Long, Long)]) =
      Profile.mergedHistogram(spark, uri, "v", at)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val h1 = hist(Some((0L, 1500L)))
    val hAll = hist(None)
    assert(h1.map(_._2).sum == 1000L && hAll.map(_._2).sum == 1500L)
    // closed form: window 1 uniform (p=0.1/bucket); full corpus has
    // bucket 9 at (100+500)/1500 = 0.4, others at 100/1500
    val drift = Profile.histogramDrift(h1, hAll)
    val want = 0.5 * (9 * math.abs(0.1 - 100.0 / 1500) + math.abs(0.1 - 600.0 / 1500))
    assert(math.abs(drift - want) < 1e-12, (drift, want))
    // identical windows drift 0; empty-vs-nonempty drifts 1
    assert(Profile.histogramDrift(h1, h1) == 0.0)
    assert(Profile.histogramDrift(Nil, h1) == 1.0)
  }

  test("count-min sketch: exact merges, domination, pinned params, point probes") {
    val uri = TestSession.tmpDir("profile-cms")
    // skewed counts: value i appears i+1 times, split across fragments
    val all = (0 until 50).flatMap(i => Seq.fill(i + 1)(i.toLong))
      .zipWithIndex.map { case (v, j) => (j.toLong, v) }
    val df = all.toDF("id", "v")
    ArrayTable.ingest(spark, df.filter($"id" % 2 === 0), uri, Seq("id"),
      tsOpt = Some(1000L), overwrite = true)
    ArrayTable.ingest(spark, df.filter($"id" % 2 =!= 0), uri, Seq("id"),
      tsOpt = Some(2000L))
    assert(Profile.writeFragmentCms(spark, uri, "v", depth = 4, width = 1024) == 2)
    assert(Profile.writeFragmentCms(spark, uri, "v", depth = 4, width = 1024) == 0,
      "second pass must be a no-op")
    intercept[IllegalArgumentException](
      Profile.writeFragmentCms(spark, uri, "v", depth = 4, width = 512))
    // fragment merge == one-shot sketch of the whole data, cell for cell
    val merged = Profile.mergedCms(spark, uri, "v")
    val oneShot = Profile.cmsCells(df, "v", depth = 4, width = 1024)
    assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty)
    // every depth row carries the full mass
    val mass = merged.groupBy("d").agg(sum("cnt").as("m"))
      .select($"m").as[Long].collect().toSeq
    assert(mass == Seq.fill(4)(all.size.toLong), mass)
    // probes: est >= true for every present value; 50 values in 1024
    // buckets x 4 rows make an overestimate vanishingly unlikely, and
    // a value never seen estimates 0 unless all 4 buckets collide
    val probes = (0 until 50).map(_.toLong).toDF("v")
    val est = Profile.cmsEstimates(spark, uri, "v", probes, "v")
      .as[(Long, Long)].collect().toMap
    (0 until 50).foreach(i => assert(est(i.toLong) >= i + 1L, s"v=$i"))
    val ghost = Profile.cmsEstimates(spark, uri, "v",
      Seq(777L).toDF("v"), "v").as[(Long, Long)].collect().head
    assert(ghost._2 <= all.size, "ghost estimate is still bounded by mass")
  }
}
