package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * one narrow pass over the corpus, per-query top-k via window. The dot
  * product is a codegen'd higher-order `aggregate(zip_with(...))`, no
  * UDF.
  *
  * Scale path: IVF — a deterministic coarse quantizer (centroids chosen
  * by hash-sampling the corpus, refined by one Lloyd step) partitions
  * the corpus by nearest centroid; queries probe only `nprobe` cells.
  * At 100 TB the corpus side stays partitioned/bucketed by centroid id,
  * so a probe touches a small fraction of files.
  */
object Similarity {

  /** dot(a, b) over array<float|double> columns */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** `nBits` sign bits of pseudo-random hyperplane projections packed
    * into a long. Hyperplane component for (bit i, dim j) is derived
    * from xxhash64(i, j) mapped to [-1, 1] — deterministic, no stored
    * model. */
  def hyperplaneSketch(vec: Column, nBits: Int = 16, seedOffset: Int = 0): Column = {
    val projs = transform(sequence(lit(seedOffset), lit(seedOffset + nBits - 1)), bit =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, j) => v.cast("double") *
            ((xxhash64(bit, j) % 1000L).cast("double") / 1000.0)),
        lit(0.0), (acc, x) => acc + x))
    // pack sign bits: acc*2 + (proj>0)
    aggregate(reverse(projs), lit(0L),
      (acc, p) => acc * 2L + when(p > 0, 1L).otherwise(0L))
  }

  /** Exact per-key top-k WITHOUT shuffling the full scored set: a
    * bounded per-partition heap (memory = |keys seen in partition| * k)
    * cuts each partition's contribution to <= k rows per key, then ONE
    * small aggregation (map-side partial, <= nPartitions*k rows per key
    * in flight) merges the partials. This replaces the
    * `row_number().over(partitionBy(key))` formulation, which shuffles
    * every scored row — the scale-killer when |corpus| x |queries| is
    * large. Expects columns (keyCol, idCol, scoreCol); ids must be
    * Comparable for deterministic tie-breaks (score desc, id asc). */
  def topKPerKey(scored: DataFrame, keyCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val proj = scored.select(col(keyCol), col(idCol), col(scoreCol).cast("double"))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(proj.schema)
    def cmpIds(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    // PQ dequeues its max; order so the WORST candidate (lowest score,
    // then largest id) is the max.
    val worstFirst: Ordering[(Double, Any)] = new Ordering[(Double, Any)] {
      def compare(x: (Double, Any), y: (Double, Any)): Int = {
        val c = java.lang.Double.compare(y._1, x._1)
        if (c != 0) c else cmpIds(x._2, y._2)
      }
    }
    val reduced = proj.mapPartitions { rows =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.PriorityQueue[(Double, Any)]]
      rows.foreach { r =>
        val heap = heaps.getOrElseUpdate(r.get(0),
          scala.collection.mutable.PriorityQueue.empty[(Double, Any)](worstFirst))
        heap.enqueue((r.getDouble(2), r.get(1)))
        if (heap.size > k) heap.dequeue()
      }
      heaps.iterator.flatMap { case (key, heap) =>
        heap.iterator.map(e => org.apache.spark.sql.Row(key, e._2, e._1))
      }
    }
    // merge partials: sort-truncate inside an aggregate (partial agg
    // applies map-side), then explode ranks. negate(score) makes the
    // struct's natural ascending sort = (score desc, id asc).
    reduced
      .groupBy(col(keyCol))
      .agg(slice(array_sort(collect_list(
        struct(negate(col(scoreCol).cast("double")).as("__ns"), col(idCol)))),
        1, k).as("__top"))
      .select(col(keyCol), posexplode(col("__top")))
      .select(col(keyCol), col("col.*"), (col("pos") + 1).cast("long").as("rank"))
      .select(col(keyCol), col(idCol), negate(col("__ns")).as(scoreCol), col("rank"))
  }

  /** Brute-force cosine top-k: for each row of `queries`, the k nearest
    * corpus rows. Queries are broadcast (small side); the corpus side
    * never shuffles — per-partition bounded heaps reduce the scored set
    * to <= nPartitions*k rows per query before the final tiny merge. */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String, k: Int = 10): DataFrame = {
    // norms computed once per row (NOT once per pair)
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val scored = c.join(broadcast(q))
      .withColumn("cosine", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    topKPerKey(scored, "query_id", "neighbor_id", "cosine", k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Deterministic IVF coarse quantizer: centroids = hash-ordered
    * corpus sample. `orderBy(hash).limit(n)` plans as a distributed
    * TakeOrderedAndProject (per-partition top-n + driver merge) — no
    * global sort, unlike a row_number window, so it holds at corpus
    * scale. Centroid ids are assigned driver-side (n is small by
    * definition). Returns (centroid_id, centroid_vec). */
  def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int): DataFrame = {
    val spark = corpus.sparkSession
    val sampled = corpus.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol))).limit(nCentroids)
      .select(col(vecCol)).collect()
    val rows = sampled.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(i.toLong, r.get(0)) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("centroid_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        corpus.schema(vecCol).copy(name = "centroid_vec"))))
  }

  /** Assign each (id, vec) row to its nearest centroid: broadcast join
    * + min_by aggregation keyed on the id — one shuffle on the id, no
    * window sort. */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val joined = df.join(broadcast(centroids))
      .withColumn("__sim", cosine(col(vecCol), col("centroid_vec")))
    joined.groupBy(col(idCol))
      .agg(
        min_by(col("centroid_id"), struct((col("__sim") * -1).as("s"), col("centroid_id")))
          .as("centroid_id"),
        first(col(vecCol)).as(vecCol))
  }

  /** IVF top-k: probe the `nprobe` closest centroids per query; exact
    * cosine within probed cells only. Approximate (recall < 1) but the
    * corpus-side work drops by ~nCentroids/nprobe. */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 10, nCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = sampleCentroids(corpus, corpusId, corpusVec, nCentroids).cache()
    val corpusCells = assign(
      corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv")),
      "neighbor_id", "__cv", cents)
    val qCells = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .join(broadcast(cents))
      .withColumn("__sim", cosine(col("__qv"), col("centroid_vec")))
    val wq = Window.partitionBy("query_id").orderBy(col("__sim").desc, col("centroid_id"))
    val probes = qCells.withColumn("__rk", row_number().over(wq))
      .filter(col("__rk") <= nprobe)
      .select(col("query_id"), col("__qv"), col("centroid_id"))
    val scored = probes.join(corpusCells, Seq("centroid_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    topKPerKey(scored, "query_id", "neighbor_id", "cosine", k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
