package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear (softmax) classification over embedding columns — the
  * "quality / domain / topic classifier" stage of a training-data
  * pipeline (fastText-style linear probes over document embeddings are
  * the standard corpus-curation classifier shape).
  *
  * Scale split, mirroring [[TextAnalysis.trainBpe]] and
  * [[Similarity.trainCentroids]]:
  *
  *  - TRAINING state is sample-bounded, not corpus-bounded: one
  *    distributed pass takes a deterministic hash-ordered sample
  *    (`TakeOrderedAndProject` — per-partition top-n, no global sort),
  *    and the gradient-descent epochs run driver-side over that sample
  *    (labeled training sets for curation classifiers are small by
  *    nature; the cut is logged when the corpus exceeds it — the "no
  *    silent caps" rule).
  *  - INFERENCE is corpus-scale and NARROW: the trained weights embed
  *    as literals in a per-row codegen'd expression (dot products +
  *    argmax over a literal struct array) — zero shuffle, zero UDF, so
  *    scoring 100 TB is one pass that pipelines into whatever filter
  *    consumes the label.
  */
object Classify {

  /** Train multinomial logistic regression (softmax + L2) by
    * full-batch gradient descent. Returns one weight row per class:
    * `dim` coefficients then the bias, i.e. `weights(c) = w_c :+ b_c`.
    *
    * Deterministic end-to-end: the sample is hash-of-id ordered (ties
    * by id are impossible — ids are unique by contract), zero-init
    * weights, fixed epoch count, driver-side summation in sample
    * order. */
  def trainSoftmax(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, numClasses: Int, sampleSize: Int = 100000,
      epochs: Int = 200, lr: Double = 0.5, l2: Double = 1e-4): Seq[Seq[Double]] = {
    val taken = df
      .select(col(labelCol).cast("int").as("__y"),
        transform(col(vecCol), v => v.cast("double")).as("__x"),
        col(idCol).as("__id"))
      .orderBy(xxhash64(col("__id"))).limit(sampleSize)
      .select(col("__y"), col("__x")).collect()
    if (taken.length == sampleSize) {
      val total = df.count()
      if (total > sampleSize)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          f"trainSoftmax: sampleSize=$sampleSize cut dropped ${total - sampleSize} " +
            f"of $total labeled rows (${(total - sampleSize).toDouble / total * 100}%.2f%%)")
    }
    // Flattened layouts (r20 verdict item 8): ONE contiguous
    // (dim+1)-strided weight/gradient array and one row-major sample
    // matrix instead of arrays-of-arrays — same FLOPs in the SAME
    // order (every += below is applied to the same values in the same
    // sequence as the old nested-array loops, so the trained weights
    // are bit-identical; pinned by ClassifySpec), but without the
    // per-row pointer chase and with JIT-friendly unit-stride inner
    // loops. Measured ~2x on the 1000-epoch gate trainer.
    val n = taken.length
    require(n > 0, "trainSoftmax: empty training sample")
    val dim = taken(0).getSeq[Double](1).length
    val stride = dim + 1
    val xsFlat = new Array[Double](n * dim)
    val ys = new Array[Int](n)
    var r = 0
    while (r < n) {
      val row = taken(r)
      ys(r) = row.getInt(0)
      val v = row.getSeq[Double](1)
      var j = 0
      while (j < dim) { xsFlat(r * dim + j) = v(j); j += 1 }
      r += 1
    }
    val w = new Array[Double](numClasses * stride)
    val scores = new Array[Double](numClasses)
    val grad = new Array[Double](numClasses * stride)
    var epoch = 0
    while (epoch < epochs) {
      java.util.Arrays.fill(grad, 0.0)
      var i = 0
      while (i < n) {
        val xo = i * dim
        var mx = Double.NegativeInfinity
        var c = 0
        while (c < numClasses) {
          val wo = c * stride
          var s = w(wo + dim)
          var j = 0
          while (j < dim) { s += w(wo + j) * xsFlat(xo + j); j += 1 }
          scores(c) = s; if (s > mx) mx = s
          c += 1
        }
        var z = 0.0
        c = 0
        while (c < numClasses) { scores(c) = math.exp(scores(c) - mx); z += scores(c); c += 1 }
        c = 0
        while (c < numClasses) {
          val err = scores(c) / z - (if (ys(i) == c) 1.0 else 0.0)
          val go = c * stride
          var j = 0
          while (j < dim) { grad(go + j) += err * xsFlat(xo + j); j += 1 }
          grad(go + dim) += err
          c += 1
        }
        i += 1
      }
      var c = 0
      while (c < numClasses) {
        val wo = c * stride
        var j = 0
        while (j <= dim) {
          val reg = if (j < dim) l2 * w(wo + j) else 0.0 // bias unregularized
          w(wo + j) -= lr * (grad(wo + j) / n + reg)
          j += 1
        }
        c += 1
      }
      epoch += 1
    }
    (0 until numClasses).map(c => w.slice(c * stride, (c + 1) * stride).toSeq)
  }

  /** Per-class raw scores `dot(vec, w_c) + b_c` as a literal-backed
    * struct array whose ascending sort order is best-class-first
    * (max score, tie -> min class id) — same negated-struct idiom as
    * the IVF centroid argmin. The weight table embeds as two compact
    * `typedlit` literals with a `transform` loop, not per-class
    * `array(lit...)` trees — O(1) expression nodes at any class count
    * (the k*dim literal-tree form fell off codegen at a few hundred
    * rows in the centroid argmin; a domain classifier can have
    * thousands of classes). */
  private def classScores(vec: Column, weights: Seq[Seq[Double]]): Column = {
    val coefs = typedLit(weights.map(_.init))
    val biases = typedLit(weights.map(_.last))
    transform(sequence(lit(0), lit(weights.size - 1)), c =>
      struct(
        negate(Similarity.dot(vec, element_at(coefs, c + 1)) +
          element_at(biases, c + 1)).as("ns"),
        c.cast("int").as("cls")))
  }

  /** Predicted class id — narrow codegen'd expression, corpus-scale. */
  def predictSoftmax(vec: Column, weights: Seq[Seq[Double]]): Column =
    array_min(classScores(vec, weights)).getField("cls")

  /** Softmax probability of the predicted (best) class — a calibrated
    * keep/drop knob for curation filters ("keep docs the classifier is
    * >0.9 sure about"). Same literal scores, still narrow. */
  def predictConfidence(vec: Column, weights: Seq[Seq[Double]]): Column = {
    val s = classScores(vec, weights)
    val best = negate(array_min(s).getField("ns"))
    val z = aggregate(s, lit(0.0d),
      (acc, e) => acc + exp(negate(e.getField("ns")) - best))
    round(lit(1.0) / z, 6)
  }

  /** Persist trained weights as a JSON sidecar (the train-once /
    * score-many production shape — scoring jobs load the model and
    * never see the training data). Doubles round-trip exactly through
    * the JSON layer (same codec as the IVF centroid sidecar). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, uri: String,
      weights: Seq[Seq[Double]]): Unit = {
    import graft.core.Json._
    val json = JObj(Seq("weights" -> JArr(weights.map(r => JArr(r.map(JNum(_))))))).render
    graft.storage.VFS(spark).writeString(s"$uri/model.json", json)
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession,
      uri: String): Seq[Seq[Double]] = {
    import graft.core.Json._
    graft.core.Json.parse(graft.storage.VFS(spark).readString(s"$uri/model.json"))
      .obj("weights").get.arr.map(_.arr.map(_.dbl))
  }
}
