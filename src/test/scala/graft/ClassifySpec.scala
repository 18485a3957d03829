package graft

import graft.ops.Classify
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  test("softmax trainer: linearly separable 2-class toy converges to 100%") {
    // class 0 around (+1, +1), class 1 around (-1, -1) — separable
    val rows = (0 until 40).map { i =>
      val c = i % 2
      val sign = if (c == 0) 1.0f else -1.0f
      val eps = (i % 5) * 0.05f
      (i.toLong, Array(sign + eps, sign - eps), c)
    }
    val df = rows.toDF("id", "vec", "label")
    val w = Classify.trainSoftmax(df, "id", "vec", "label",
      numClasses = 2, epochs = 100)
    assert(w.size == 2 && w.head.size == 3) // dim 2 + bias
    val acc = df.withColumn("pred", Classify.predictSoftmax(col("vec"), w))
      .filter(col("pred") === col("label")).count() / 40.0
    assert(acc == 1.0, s"toy accuracy $acc")
  }

  test("trainer is deterministic: same data -> bit-identical weights") {
    val e = embeddings
    val w1 = Classify.trainSoftmax(e, "vec_id", "embedding", "label",
      numClasses = 10, epochs = 30)
    val w2 = Classify.trainSoftmax(e, "vec_id", "embedding", "label",
      numClasses = 10, epochs = 30)
    assert(w1 == w2)
  }

  test("held-out accuracy on centroid pseudo-labels (cluster distillation)") {
    // the synthetic embeddings' `label` column is noise w.r.t. the
    // vectors (measured: held-out accuracy at chance for any linear
    // model), so the learnability gate distills a DERIVED target with
    // real decision structure: the IVF centroid assignment — nearest-
    // centroid regions are linearly separable by construction.
    val e = embeddings
    val cents = graft.ops.Similarity.trainCentroids(e, "vec_id", "embedding", 8)
    val labeled = e.withColumn("cls",
      graft.ops.Similarity.assignNarrow(col("embedding"), cents).cast("int"))
    val train = labeled.filter(col("vec_id") % 5 =!= 0)
    val test = labeled.filter(col("vec_id") % 5 === 0)
    val w = Classify.trainSoftmax(train, "vec_id", "embedding", "cls",
      numClasses = 8, epochs = 1000, lr = 2.0)
    def acc(df: org.apache.spark.sql.DataFrame): Double = {
      val scored = df.withColumn("pred",
        Classify.predictSoftmax(col("embedding"), w))
      scored.filter(col("pred") === col("cls")).count().toDouble / scored.count()
    }
    val (trainAcc, testAcc) = (acc(train), acc(test))
    assert(trainAcc >= 0.9, s"train accuracy $trainAcc")
    assert(testAcc >= 0.65, s"held-out accuracy $testAcc")
  }

  test("flattened trainer equals the nested-array reference bit-exactly") {
    // the r21 flattened-weights layout claims the SAME floating-point
    // operations in the SAME order as the old arrays-of-arrays loops;
    // this replays the old implementation verbatim on the identically
    // sampled rows and requires bit equality (== on doubles)
    val (numClasses, epochs, lr, l2, sampleSize) = (10, 40, 0.5, 1e-4, 100000)
    val e = embeddings
    val w = Classify.trainSoftmax(e, "vec_id", "embedding", "label",
      numClasses = numClasses, epochs = epochs)
    val taken = e
      .select(col("label").cast("int").as("__y"),
        transform(col("embedding"), v => v.cast("double")).as("__x"),
        col("vec_id").as("__id"))
      .orderBy(xxhash64(col("__id"))).limit(sampleSize)
      .select(col("__y"), col("__x")).collect()
    val xs = taken.map(r => r.getSeq[Double](1).toArray)
    val ys = taken.map(_.getInt(0))
    val n = xs.length
    val dim = xs(0).length
    val wRef = Array.fill(numClasses, dim + 1)(0.0)
    val scores = new Array[Double](numClasses)
    val grad = Array.fill(numClasses, dim + 1)(0.0)
    var epoch = 0
    while (epoch < epochs) {
      var c = 0
      while (c < numClasses) { java.util.Arrays.fill(grad(c), 0.0); c += 1 }
      var i = 0
      while (i < n) {
        val x = xs(i)
        var mx = Double.NegativeInfinity
        c = 0
        while (c < numClasses) {
          var s = wRef(c)(dim)
          var j = 0
          while (j < dim) { s += wRef(c)(j) * x(j); j += 1 }
          scores(c) = s; if (s > mx) mx = s
          c += 1
        }
        var z = 0.0
        c = 0
        while (c < numClasses) { scores(c) = math.exp(scores(c) - mx); z += scores(c); c += 1 }
        c = 0
        while (c < numClasses) {
          val err = scores(c) / z - (if (ys(i) == c) 1.0 else 0.0)
          val g = grad(c)
          var j = 0
          while (j < dim) { g(j) += err * x(j); j += 1 }
          g(dim) += err
          c += 1
        }
        i += 1
      }
      c = 0
      while (c < numClasses) {
        var j = 0
        while (j <= dim) {
          val reg = if (j < dim) l2 * wRef(c)(j) else 0.0
          wRef(c)(j) -= lr * (grad(c)(j) / n + reg)
          j += 1
        }
        c += 1
      }
      epoch += 1
    }
    assert(w == wRef.map(_.toSeq).toSeq,
      "flattened trainer drifted from the nested-array reference")
  }

  test("model save/load round-trips weights exactly") {
    val e = embeddings
    val w = Classify.trainSoftmax(e, "vec_id", "embedding", "label",
      numClasses = 10, epochs = 20)
    val uri = TestSession.tmpDir("classify-model")
    Classify.saveModel(spark, uri, w)
    val back = Classify.loadModel(spark, uri)
    assert(back == w, "weights must round-trip bit-exactly through JSON")
  }

  test("confidence is a probability and matches the argmax class") {
    val e = embeddings.limit(50)
    val w = Classify.trainSoftmax(embeddings, "vec_id", "embedding", "label",
      numClasses = 10, epochs = 50)
    val r = e.select(
      Classify.predictConfidence(col("embedding"), w).as("p")).collect()
    r.foreach { row =>
      val p = row.getDouble(0)
      // argmax prob of 10 classes is at least 1/10
      assert(p >= 0.1 - 1e-9 && p <= 1.0 + 1e-9, s"confidence $p")
    }
  }
}
