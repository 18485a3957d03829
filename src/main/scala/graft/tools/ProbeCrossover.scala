package graft.tools

import org.apache.spark.sql.functions._

/** Point-vs-scan probe crossover in the IO-BOUND regime — the one
  * measurement the r17–r19 probe saga never produced: the scan model's
  * per-probe tier pass GROWING with tier size while the point path
  * ([[graft.storage.PointIndex]]) stays flat, on a tier that does NOT
  * fit the page cache available to the reader.
  *
  * The r19 matrix ran at 100× where the narrow tier is ~40 MB —
  * page-cache-tiny — so point ≈ warm scan there and the point path's
  * headline (flat where the scan cannot be) stayed structural
  * extrapolation. This tool isolates the probe's base-tier term at
  * tier sizes that exceed a cgroup-capped page cache:
  *
  *  - `gen`: synthesize a bucket tier of N rows in the dedup index's
  *    exact v2 narrow layout — (band int, bucket long, id long),
  *    bucket = xxhash64(id) (uniform, the adversarial pushdown case),
  *    range-partitioned and sorted by (band, bucket) like
  *    `DedupIndex.writeCapped`;
  *  - `scan`: the scan model's saturated probe shape verbatim from
  *    `candidatePairsImpl`'s fallback — the batch's distinct buckets
  *    broadcast-semi-joined into a plain parquet pass of the tier
  *    (no TierCache: the regime under test is tier ≫ cache, where the
  *    InMemoryRelation spills and the scan hits storage anyway);
  *  - `point`: `PointIndex.bucketRows` — build the generation maps
  *    once (timed separately: the per-flip cost), then steady-state
  *    probes that touch ZERO tier bytes;
  *  - `keysweep`: point probes across batch sizes at one tier — the
  *    O(batch keys) axis (the reference's asv point-lookup spec shape,
  *    tiledb/tests/perf/benchmarks/indexing.py:8-45, k ∈ 10..10⁵).
  *
  * Probe keys are computed, never read from the tier (no warming side
  * channel): hits are (xxhash64(i), i%16) for i < K/2 — exactly the
  * tier's own rows — misses hash ids ≥ N. The cgroup placement and
  * cache drops live in scripts/crossover.sh; results land in
  * BASELINE.md's r20 crossover section.
  *
  * Usage: runMain graft.tools.ProbeCrossover <mode> <rows> [keys] [runs]
  *   mode ∈ gen | scan | point | keysweep; tier at
  *   target/xover/tier_<rows> (override dir with SPARK_GRAFT_XOVER_DIR).
  */
object ProbeCrossover {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val rows = args(1).toLong
    val keys = if (args.length > 2) args(2).toInt else 32768
    val runs = if (args.length > 3) args(3).toInt else 5
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_XOVER_DIR",
      "/root/repo/target/xover")
    val tierPath = s"$baseDir/tier_$rows"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def tierBytes(): Long =
      try graft.storage.VFS(spark).du(tierPath) catch { case _: Throwable => 0L }

    /** K distinct (bucket, band) probe keys: first half present in the
      * tier (ids 0..K/2), second half absent (ids ≥ rows) — the
      * steady-state batch mix, computed without touching the tier. */
    def probeKeys(k: Int) = spark.range(k).select(
      xxhash64(when(col("id") < k / 2, col("id"))
        .otherwise(col("id") + rows)).as("bucket"),
      (when(col("id") < k / 2, col("id"))
        .otherwise(col("id") + rows) % 16).cast("int").as("band"))
      .localCheckpoint(true)

    mode match {
      case "gen" =>
        graft.storage.VFS(spark).delete(tierPath)
        // the v2 narrow layout: 16 bands × 4 files per band, sorted by
        // (band, bucket) within files — writeCapped's shape
        spark.range(rows).select(
            (col("id") % 16).cast("int").as("band"),
            xxhash64(col("id")).as("bucket"),
            col("id"))
          .repartitionByRange(64, col("band"), col("bucket"))
          .sortWithinPartitions("band", "bucket")
          .write.parquet(tierPath)
        println(s"[xover] gen rows=$rows bytes=${tierBytes()}")

      case "scan" =>
        val ks = probeKeys(keys).select("bucket").distinct()
          .localCheckpoint(true)
        val ts = (0 until runs).map { i =>
          val (n, t) = time(spark.read.parquet(tierPath)
            .join(broadcast(ks), Seq("bucket"), "left_semi").count())
          println(f"[xover] scan rows=$rows keys=$keys run$i $t%.3f s (matched=$n)")
          t
        }.sorted
        println(f"[xover] RESULT scan rows=$rows bytes=${tierBytes()} " +
          f"keys=$keys median=${ts(ts.size / 2)}%.3f s")

      case "point" =>
        val kdf = probeKeys(keys)
        val slot = s"xover#$rows"
        val (n0, tBuild) = time(graft.storage.PointIndex
          .bucketRows(spark, slot, tierPath, kdf).get.count())
        val mapBytes = graft.storage.PointIndex.mapFootprint(spark, slot)
          .getOrElse(0L)
        println(f"[xover] point rows=$rows build+probe $tBuild%.3f s " +
          f"(matched=$n0, map_bytes=$mapBytes)")
        val ts = (0 until runs).map { i =>
          val lease = graft.storage.PointIndex.lease(spark)
          val (n, t) = time(graft.storage.PointIndex
            .bucketRows(spark, slot, tierPath, kdf, Some(lease)).get.count())
          lease.release()
          println(f"[xover] point rows=$rows keys=$keys run$i $t%.3f s (matched=$n)")
          t
        }.sorted
        println(f"[xover] RESULT point rows=$rows bytes=${tierBytes()} " +
          f"keys=$keys build=$tBuild%.3f median=${ts(ts.size / 2)}%.3f s")

      case "keysweep" =>
        val slot = s"xover#$rows"
        // warm the maps once, outside every clock
        graft.storage.PointIndex
          .bucketRows(spark, slot, tierPath, probeKeys(16)).get.count()
        Seq(1000, 10000, 100000, 1000000).foreach { k =>
          val kdf = probeKeys(k)
          val ts = (0 until runs).map { _ =>
            val lease = graft.storage.PointIndex.lease(spark)
            val (_, t) = time(graft.storage.PointIndex
              .bucketRows(spark, slot, tierPath, kdf, Some(lease)).get.count())
            lease.release()
            t
          }.sorted
          println(f"[xover] RESULT keysweep rows=$rows keys=$k " +
            f"median=${ts(ts.size / 2)}%.3f s")
        }

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
