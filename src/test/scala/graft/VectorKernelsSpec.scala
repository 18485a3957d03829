package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.functions.{DotF, SimHash64, VecSignBits}

/** The native vector kernels must be BIT-identical to the declarative
  * higher-order-function formulations they replaced (embedding_neardups
  * is oracle-hash-checked; the simhash/hyperplane bands feed
  * deterministic gates). The HOF reference formulations live here,
  * verbatim from the pre-kernel implementations. */
class VectorKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def hofSketch(vec: Column, nBits: Int, seedOffset: Int): Column = {
    val projs = transform(sequence(lit(seedOffset), lit(seedOffset + nBits - 1)), bit =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, j) => v.cast("double") *
            ((xxhash64(bit, j) % 1000L).cast("double") / 1000.0)),
        lit(0.0), (acc, x) => acc + x))
    aggregate(reverse(projs), lit(0L),
      (acc, p) => acc * 2L + when(p > 0, 1L).otherwise(0L))
  }

  private def hofSimhash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val bitSums = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, b) => a + when(getbit(h, b.cast("long")) === 1, 1).otherwise(-1)))
    def pack(bits: Column): Column =
      aggregate(bits, lit(0L), (acc, s) => acc * 2L + when(s > 0, 1L).otherwise(0L))
    val hi = pack(reverse(slice(bitSums, 33, 32)))
    val lo = pack(reverse(slice(bitSums, 1, 32)))
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  private def vecs = (0 until 200).map(i =>
    (i.toLong, Array.tabulate(24)(j => (math.sin(i * 7.3 + j * 1.9) * 3).toFloat)))
    .toDF("id", "v")

  test("DotF == HOF dot, bit-exact, incl. self-dot (norm path)") {
    val paired = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.id") < col("b.id")).limit(500)
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    val diff = paired.select(
      DotF(col("va"), col("vb")).as("k"), hofDot(col("va"), col("vb")).as("h"),
      DotF(col("va"), col("va")).as("ks"), hofDot(col("va"), col("va")).as("hs"))
      .filter(col("k") =!= col("h") || col("ks") =!= col("hs")).count()
    assert(diff == 0)
    // double arrays (the centroid-literal side) too
    val d = Seq((Array(1.5, -2.25, 3.0), Array(0.5, 4.0, -1.0))).toDF("a", "b")
      .select(DotF(col("a"), col("b")).as("k"), hofDot(col("a"), col("b")).as("h"))
      .collect()(0)
    assert(d.getDouble(0) == d.getDouble(1))
    // length mismatch and null element -> null, like the poisoned HOF sum
    val edge = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
      .select(DotF(col("a"), col("b")).as("k")).collect()(0)
    assert(edge.isNullAt(0))
  }

  test("VecSignBits == HOF hyperplane sketch for every band's seed offset") {
    val checks = (0 until 4).map(band =>
      (VecSignBits(col("v"), 16, band * 1000) ===
        hofSketch(col("v"), 16, band * 1000)).as(s"b$band"))
    val bad = vecs.select(checks: _*)
      .filter(not(checks.indices.map(i => col(s"b$i")).reduce(_ && _))).count()
    assert(bad == 0)
  }

  test("LaneMatches == HOF zip_with lane compare; SortedLongJaccard == set ops") {
    val sigs = (0 until 300).map { i =>
      val a = Array.tabulate(64)(j => ((i * 31 + j * 7) % 13).toLong)
      val b = Array.tabulate(64)(j => ((i * 17 + j * 7) % 13).toLong)
      (a, b)
    }.toDF("sa", "sb")
    val laneBad = sigs.select(
      graft.functions.LaneMatches(col("sa"), col("sb")).as("k"),
      size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), m => m)).as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(laneBad == 0)
    // sorted-distinct sets, incl. disjoint, identical, and empty sides
    val sets = ((0 until 300).map { i =>
      val a = (0 until 40).map(j => (i * 3 + j * 5).toLong).distinct.sorted.toArray
      val b = (0 until 40).map(j => (i * 2 + j * 7 + 1).toLong).distinct.sorted.toArray
      (a, b)
    } ++ Seq(
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array(1L, 2L), Array(5L, 9L)),
      (Array.empty[Long], Array(1L)))).toDF("sa", "sb")
    val jBad = sets.select(
      graft.functions.SortedLongJaccard(col("sa"), col("sb")).as("k"),
      (size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb"))).cast("double")).as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(jBad == 0)
    // both-empty -> NaN, like 0.0/0.0
    val nan = Seq((Array.empty[Long], Array.empty[Long])).toDF("sa", "sb")
      .select(graft.functions.SortedLongJaccard(col("sa"), col("sb"))).collect()(0)
    assert(nan.getDouble(0).isNaN)
  }

  test("SimHash64 == HOF simhash, incl. empty and single-token arrays") {
    val texts = (0 until 200).map(i =>
      (i.toLong, s"tok${i % 7} alpha beta${i % 13} gamma delta${i % 3} " * (1 + i % 5)))
      .toDF("id", "t")
      .select(col("id"), split(trim(col("t")), "\\s+").as("toks"))
    val bad = texts.select(SimHash64(col("toks")).as("k"), hofSimhash(col("toks")).as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(bad == 0)
    val edge = Seq(Tuple1(Array.empty[String]), Tuple1(Array("x")))
      .toDF("toks")
      .select(SimHash64(col("toks")).as("k"), hofSimhash(col("toks")).as("h"))
      .collect()
    edge.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  // --- PQ kernels: reference formulations verbatim from the pre-kernel
  //     Similarity.pqEncode / adcScore ---------------------------------

  private def hofPqEncode(vec: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    graft.ops.TextAnalysis.once(vec) { v =>
      val dsub = cb.head.head.size
      val codes = cb.zipWithIndex.map { case (cents, s) =>
        val table = typedLit(cents)
        val c2 = typedLit(cents.map(c => c.map(x => x * x).sum))
        graft.ops.TextAnalysis.once(slice(v, s * dsub + 1, dsub)) { sub =>
          array_min(transform(sequence(lit(0), lit(cents.size - 1)), j =>
            struct((element_at(c2, j + 1) - lit(2.0) *
              DotF(sub, element_at(table, j + 1))).as("d"), j.as("j"))))
            .getField("j")
        }
      }
      array(codes: _*)
    }

  private def hofAdc(lut: Column, codes: Column, m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
      acc + element_at(element_at(lut, s + 1),
        element_at(codes, s + 1).cast("int") + 1))

  test("PqEncodeK == HOF struct-min encode; AdcScore == HOF lookup sum") {
    import graft.ops.Similarity
    val df = vecs.toDF("id", "v")
      .withColumn("u", Similarity.unitNorm(col("v"))).cache()
    val cb = Similarity.trainPq(df, "id", "v", m = 4, ksub = 8)
    val enc = df.select(
      graft.functions.PqEncodeK(col("u"), cb).as("k"),
      hofPqEncode(col("u"), cb).as("h")).collect()
    enc.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
    val withLut = df
      .withColumn("codes", graft.functions.PqEncodeK(col("u"), cb))
      .withColumn("lut", Similarity.pqLut(col("u"), cb))
    val adc = withLut.select(
      graft.functions.AdcScore(col("lut"), col("codes")).as("k"),
      hofAdc(col("lut"), col("codes"), cb.size).as("h")).collect()
    adc.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  private def hofWordEntropy(text: Column): Column = {
    val toks = sort_array(graft.ops.TextAnalysis.tokens(text))
    val n = size(toks).cast("double")
    def contrib(run: Column): Column =
      (run.cast("double") / n) * log(2.0, n / run.cast("double"))
    val walked = aggregate(
      sequence(lit(2), size(toks)),
      struct(lit(1L).as("run"), lit(0.0).as("h")),
      (st, i) =>
        when(element_at(toks, i) === element_at(toks, i - 1),
          struct((st.getField("run") + 1L).as("run"), st.getField("h").as("h")))
          .otherwise(struct(lit(1L).as("run"),
            (st.getField("h") + contrib(st.getField("run"))).as("h"))),
      st => st.getField("h") + contrib(st.getField("run")))
    when(size(toks) <= 1, lit(0.0)).otherwise(walked)
  }

  test("WordEntropyK == HOF sorted run-length fold (1-ulp log slack)") {
    // Spark's Logarithm evaluates log through a different JDK path
    // than math.log (observed 1-ulp drift on log2(3)), so the pin is
    // <1e-12 per doc, not bitwise — the text_entropy oracle contract
    // is round-6, 6 orders looser.
    val docs = (0 until 100).map(i =>
      ((0 to i % 17).map(j => s"w${(i * j) % 7}").mkString(" ")) +
        (if (i % 3 == 0) "  extra   pad " else "")).toDF("t")
    val rows = docs.select(
      graft.functions.WordEntropyK(graft.ops.TextAnalysis.tokens(col("t"))).as("k"),
      hofWordEntropy(col("t")).as("h")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
      s"kernel ${r.getDouble(0)} != hof ${r.getDouble(1)}"))
  }

  test("AssignCellK == HOF array_min assignment, incl. exact ties and floats") {
    import graft.ops.Similarity
    // centroid ids deliberately NOT 0..k-1 ordered (tie rule is by id,
    // not table position); one duplicated centroid direction forces a
    // genuine score tie between ids 7 and 3 -> must pick 3
    val cents: Seq[(Long, Seq[Double])] = Seq(
      7L -> Seq(1.0, 0.0, 0.0, 0.0),
      3L -> Seq(2.0, 0.0, 0.0, 0.0), // same direction as 7 after unit norm
      1L -> Seq(0.0, 1.0, 0.0, 0.0),
      9L -> Seq(0.0, 0.0, -1.0, 2.0),
      5L -> Seq(0.0, 0.0, 0.0, 0.0)) // zero-norm: kept as-is
    val vecsF = (0 until 500).map(i =>
      (i.toLong, Array.tabulate(4)(j => math.sin(i * 17 + j * 31).toFloat)))
      .toDF("id", "v")
    val vecsD = (0 until 500).map(i =>
      (i.toLong, Array.tabulate(4)(j => math.cos(i * 13 + j * 37))))
      .toDF("id", "v")
    for (df <- Seq(vecsF, vecsD)) {
      val diff = df.select(
          Similarity.assignNarrow(col("v"), cents).as("k"),
          Similarity.assignHof(col("v"), cents).as("h"))
        .filter(col("k") =!= col("h") || col("k").isNull =!= col("h").isNull)
      assert(diff.count() == 0, diff.collect().mkString(", "))
    }
    // the planted tie: a vector exactly along the duplicated direction
    val tie = Seq((0L, Array(5.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")
      .select(Similarity.assignNarrow(col("v"), cents)).head().getLong(0)
    assert(tie == 3L, s"tie must go to the smaller id, got $tie")
    // non-finite inputs: an Inf component makes SOME scores NaN (the
    // zero-norm centroid's 0*Inf) and others ±Inf — the kernel must
    // follow Double.compare ordering (NaN greatest) exactly like the
    // HOF struct-min, never let a NaN first entry win
    val weird = Seq(
      (0L, Array(Float.PositiveInfinity, 1.0f, 0.0f, 0.0f)),
      (1L, Array(Float.NaN, 1.0f, 1.0f, 1.0f)),
      (2L, Array(Float.NegativeInfinity, 0.0f, 1.0f, 0.0f))).toDF("id", "v")
    val wd = weird.select(
        Similarity.assignNarrow(col("v"), cents).as("k"),
        Similarity.assignHof(col("v"), cents).as("h"))
      .filter(col("k") =!= col("h") || col("k").isNull =!= col("h").isNull)
    assert(wd.count() == 0, wd.collect().mkString(", "))
    // nulls: null vector nulls the row
    val nv = Seq((0L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
      .select(Similarity.assignNarrow(col("v"), cents)).head()
    assert(nv.isNullAt(0))
  }

  test("ProbeCellsK == HOF array_sort probe at every nprobe, ties and floats") {
    import graft.ops.Similarity
    val cents: Seq[(Long, Seq[Double])] = Seq(
      7L -> Seq(1.0, 0.0, 0.0, 0.0),
      3L -> Seq(2.0, 0.0, 0.0, 0.0), // tie with 7 after unit norm
      1L -> Seq(0.0, 1.0, 0.0, 0.0),
      9L -> Seq(0.0, 0.0, -1.0, 2.0),
      5L -> Seq(0.0, 0.0, 0.0, 0.0)) // zero-norm
    val vecsF = (0 until 400).map(i =>
      (i.toLong, Array.tabulate(4)(j => math.sin(i * 17 + j * 31).toFloat)))
      .toDF("id", "v")
    val vecsD = (0 until 400).map(i =>
      (i.toLong, Array.tabulate(4)(j => math.cos(i * 13 + j * 37))))
      .toDF("id", "v")
    for (df <- Seq(vecsF, vecsD); np <- Seq(1, 2, 4, 5, 9)) {
      // nprobe > k: HOF slice returns all k, kernel must too
      val diff = df.select(
          Similarity.probeNarrow(col("v"), cents, np).as("k"),
          Similarity.probeHof(col("v"), cents, np).as("h"))
        .filter(col("k") =!= col("h") || col("k").isNull =!= col("h").isNull)
      assert(diff.count() == 0, s"nprobe=$np: ${diff.collect().mkString(", ")}")
    }
    // the probe's driver-side twin must agree with the kernel too
    // (partition pruning is decided driver-side from the same order)
    val v0 = Seq(0.3, -0.7, 0.2, 0.9)
    val fromKernel = Seq(Tuple1(v0.toArray)).toDF("v")
      .select(Similarity.probeNarrow(col("v"), cents, 3)).head().getSeq[Long](0)
    assert(Similarity.probeDriver(v0, cents, 3) == fromKernel)
  }

  test("HierProbeK == HOF two-level probe at every (nprobeCoarse, nfine); " +
    "degenerates to flat ProbeCellsK at nprobeCoarse=m") {
    import graft.ops.Similarity
    val fine: Seq[(Long, Seq[Double])] = (0 until 24).map(c =>
      c.toLong -> Seq.tabulate(8)(j => math.sin(c * 5 + j * 3)))
    val (coarse, members) = Similarity.trainCoarse(fine, 4, spark)
    val vecsF = (0 until 400).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 11 + j * 7).toFloat)))
      .toDF("id", "v")
    val vecsD = (0 until 400).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 13 + j * 17))))
      .toDF("id", "v")
    for (df <- Seq(vecsF, vecsD); npc <- Seq(1, 2, 4); nf <- Seq(1, 3, 8, 40)) {
      // nfine > candidate count: HOF slice returns all, kernel must too
      val diff = df.select(
          graft.functions.HierProbeK(col("v"), fine, coarse, members, npc, nf).as("k"),
          Similarity.hierProbeHof(col("v"), fine, coarse, members, npc, nf).as("h"))
        .filter(col("k") =!= col("h") || col("k").isNull =!= col("h").isNull)
      assert(diff.count() == 0,
        s"npc=$npc nf=$nf: ${diff.collect().mkString(", ")}")
    }
    // probing every group must equal the FLAT top-nfine selection
    for (nf <- Seq(1, 4, 24)) {
      val degen = vecsF.select(
          graft.functions.HierProbeK(col("v"), fine, coarse, members,
            coarse.size, nf).as("h"),
          Similarity.probeNarrow(col("v"), fine, nf).as("f"))
        .filter(col("h") =!= col("f"))
      assert(degen.count() == 0, s"nf=$nf: ${degen.collect().mkString(", ")}")
    }
    // null vector nulls the row
    val nv = Seq((0L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
      .select(graft.functions.HierProbeK(col("v"), fine, coarse, members, 2, 4))
      .head()
    assert(nv.isNullAt(0))
  }

  test("HierAssignK == HOF two-level assignment; degenerates to flat at nprobe=m") {
    import graft.ops.Similarity
    // 24 fine centroids trained from deterministic vectors, coarse m=4
    val fine: Seq[(Long, Seq[Double])] = (0 until 24).map(c =>
      c.toLong -> Seq.tabulate(8)(j => math.sin(c * 5 + j * 3)))
    val (coarse, members) = Similarity.trainCoarse(fine, 4, spark)
    val vecsF = (0 until 400).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 11 + j * 7).toFloat)))
      .toDF("id", "v")
    for (np <- Seq(1, 2, 4)) {
      val diff = vecsF.select(
          Similarity.assignHierarchical(col("v"), fine, coarse, members, np).as("k"),
          Similarity.assignHierHof(col("v"), fine, coarse, members, np).as("h"))
        .filter(col("k") =!= col("h") || col("k").isNull =!= col("h").isNull)
      assert(diff.count() == 0, s"nprobe=$np: ${diff.collect().mkString(", ")}")
    }
    // nprobe = m probes every group: must equal the FLAT assignment
    val degen = vecsF.select(
        Similarity.assignHierarchical(col("v"), fine, coarse, members,
          coarse.size).as("h"),
        Similarity.assignNarrow(col("v"), fine).as("f"))
      .filter(col("h") =!= col("f"))
    assert(degen.count() == 0, degen.collect().mkString(", "))
  }
}
