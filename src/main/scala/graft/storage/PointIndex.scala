package graft.storage

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Executor-resident POINT-LOOKUP serving structures for the immutable
  * base generations of the persisted dedup index — the piece the scan
  * model cannot provide.
  *
  * Why this exists (the r17/r18 measured dead end): a steady-state
  * dedup-index probe is a batch of point lookups on UNIFORM hash keys
  * (LSH buckets; candidate doc ids). Every interval-family pushdown
  * vehicle saturates on uniform keys — the r18 matrix measured 512
  * span-minimal BETWEEN ranges still covering 90.42%/95.01% of tier
  * rows at 24k/51k probe keys — so under the scan model every probe
  * pays one full pass of the narrow tier, a cost that tracks CORPUS
  * size, not batch size. [[TierCache]] moves that pass from disk to
  * block-manager memory, which changes the constant but not the shape.
  *
  * What changes the shape: hash each base tier ONCE per generation
  * into per-partition hash maps and serve probes as O(batch) lookups.
  *
  *  - build: one pass of the base tier, hash-partitioned on the key
  *    (`HashPartitioner(S)`), each partition folded into ONE
  *    `HashMap[key → packed matches]`, persisted `MEMORY_AND_DISK`.
  *    Registered per RESOLVED GENERATION PATH — a maintenance flip
  *    changes the path, so the next probe unpersists the stale RDD and
  *    builds against the new generation (same invalidation discipline
  *    as [[TierCache]]);
  *  - probe: the batch's keys are shuffled with the SAME partitioner
  *    (one batch-scale shuffle, no driver collect, no literal plans)
  *    and zipped partition-wise against the map RDD — each task
  *    performs pure hash lookups for its key slice. Cost is O(batch
  *    keys), independent of tier size: the property the scan model
  *    provably cannot reach on uniform keys.
  *
  * At cluster scale this is the idiomatic Spark serving shape: the map
  * partitions live in aggregate executor memory (the dedup bucket tier
  * is ~0.5% of corpus bytes, the sig tier ~512 B/doc; in-memory maps
  * ~2–3× raw), `zipPartitions` tasks inherit locality preferences from
  * the persisted partitions, and `MEMORY_AND_DISK` makes eviction a
  * spill, never an OOM and never a wrong answer. Shard count scales
  * with tier bytes (~[[targetShardBytes]] per shard), so one shard is
  * always task-sized no matter the corpus.
  *
  * Two served shapes, both from the dedup index's v2 layout:
  *  - [[bucketRows]]: (band, bucket, id) rows keyed by bucket — the
  *    candidate stage's exact (band, bucket) matches;
  *  - [[sigRows]]: (id, sig) rows keyed by id — the candidate ids'
  *    signature fetch (previously a broadcast semi-join that scanned
  *    the WHOLE sigs tier per probe: a semi join carries no file
  *    pruning, so its cost also tracked the corpus).
  *
  * Scope guards: only LONG keys are served (the standard layout); any
  * other schema returns None and the caller keeps its scan path — as
  * does `graft.index.pointProbe=false`, the session opt-out.
  */
object PointIndex {

  /** bucket → interleaved (band, id) pairs. One map per partition. */
  private type BucketMap = java.util.HashMap[java.lang.Long, Array[Long]]
  /** id → its signature rows (>1 only for changed-text re-appends,
    * which keep surfacing per the unique-id contract). */
  private type SigMap = java.util.HashMap[java.lang.Long, Array[Array[Long]]]

  private case class Entry(path: String, rdd: RDD[_ <: AnyRef], parts: Int,
      session: SparkSession)

  private val MaxEntries = 32
  private val targetShardBytes = 64L << 20
  /** Probes with ≤ this many DISTINCT keys ride the broadcast lookup
    * (one map-side stage, no shuffle); above it — a giant backfill
    * batch — keys shuffle with the shard partitioner instead. Mode
    * selection collects distinct keys with `limit(cap+1)` (the same
    * distinct+limit+collect discipline the scan path's isin switch
    * used), so the driver transient is bounded at ~cap rows
    * (~16 MB packed) at ANY batch size. */
  private val BroadcastKeyCap = 1 << 20

  /** Bumped by [[invalidate]]/[[clear]]; [[serve]] re-checks it at
    * registration so a build() that invalidates DURING an in-flight
    * probe's tier read can never be overwritten by that probe's
    * now-stale map (in-place rebuilds land at the IDENTICAL legacy
    * path, so path comparison alone cannot catch this). */
  private var invalidationEpoch = 0L

  /** (session, slot) → served generation, LRU-bounded (mirrors
    * [[TierCache]]: session itself in the key — reference equality —
    * never an identity hash). */
  private val entries =
    new java.util.LinkedHashMap[(SparkSession, String), Entry](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), Entry]): Boolean =
        size() > MaxEntries && {
          try e.getValue.rdd.unpersist(blocking = false)
          catch { case _: Throwable => () }
          true
        }
    }

  /** Session opt-out: `graft.index.pointProbe=false` keeps every probe
    * on the scan path (defensive parse — only an explicit "false"
    * opts out). */
  def enabled(spark: SparkSession): Boolean =
    !spark.conf.getOption("graft.index.pointProbe")
      .exists(_.trim.equalsIgnoreCase("false"))

  // ---- bucket tier ---------------------------------------------------

  private val bucketSchema = StructType(Seq(
    StructField("band", IntegerType, nullable = true),
    StructField("bucket", LongType, nullable = true),
    StructField("id", LongType, nullable = true)))

  /** Exact (band, bucket) matches of `keys` against the base bucket
    * tier at `path`, as rows with the tier's (band, bucket, id) schema
    * — a drop-in replacement for the scan path's filtered tier frame,
    * computed by hash lookup instead of a tier pass.
    *
    * Two lookup modes, picked by probe size:
    *  - ≤ [[BroadcastKeyCap]] distinct keys (every steady-state batch):
    *    the keys are collected (bounded — the scan path collected up
    *    to maxProbeKeys the same way), packed primitive, broadcast,
    *    and looked up in ONE map-side stage over the cached shards —
    *    no shuffle, no extra stage, locality from the persisted
    *    partitions;
    *  - above the cap (giant backfill batches): the keys shuffle with
    *    the shard partitioner (batch-scale) and zip partition-wise —
    *    no driver collect at any batch size.
    *
    * `keys` must carry (bucket long, band int) columns. None — caller
    * falls back to the scan — when disabled or the tier's schema is
    * not the served (int, long, long) shape. */
  def bucketRows(spark: SparkSession, slot: String, path: String,
      keys: DataFrame): Option[DataFrame] = {
    if (!enabled(spark)) return None
    serve(spark, slot, path) { tier =>
      val f = tier.schema.fields
      val servable = f.length == 3 &&
        f(0).name == "band" && f(0).dataType == IntegerType &&
        f(1).name == "bucket" && f(1).dataType == LongType &&
        f(2).name == "id" && f(2).dataType == LongType
      if (!servable) None
      else Some(tier.select("bucket", "band", "id").na.drop()
        .rdd.map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))))
    } { it =>
      val tmp = new java.util.HashMap[java.lang.Long,
        scala.collection.mutable.ArrayBuffer[Long]]()
      it.foreach { case (bucket, (band, id)) =>
        var b = tmp.get(bucket)
        if (b == null) {
          b = new scala.collection.mutable.ArrayBuffer[Long](4)
          tmp.put(bucket, b)
        }
        b += band.toLong
        b += id
      }
      val m: BucketMap = new java.util.HashMap(math.max(16, tmp.size() * 2))
      tmp.forEach((k, v) => m.put(k, v.toArray))
      m
    }.map { e =>
      val maps = e.rdd.asInstanceOf[RDD[BucketMap]]
      val kr = keys.select(col("bucket"), col("band")).na.drop()
      // distinct BEFORE the limit+collect: bounds the driver transient
      // at ~cap DISTINCT rows for any batch size (raw rows are
      // docs × bands — unbounded)
      val raw = kr.distinct().limit(BroadcastKeyCap + 1).collect()
      val out: RDD[Row] =
        if (raw.length > BroadcastKeyCap) {
          // shuffle mode: co-partition the keys with the shards;
          // duplicates dedup inside the lookup task
          val keyRdd = kr.rdd.map(r => (r.getLong(0), r.getInt(1)))
            .partitionBy(new HashPartitioner(e.parts))
          maps.zipPartitions(keyRdd) { (ms, ks) =>
            if (!ms.hasNext) Iterator.empty
            else {
              val m = ms.next()
              // exact pair-dedup (no packed-long tricks: a 64-bit
              // bucket XOR-mixed with a band CAN collide across
              // distinct pairs and silently drop a probe key)
              val seen = scala.collection.mutable.HashSet.empty[(Long, Int)]
              ks.flatMap { case (bucket, band) =>
                if (!seen.add((bucket, band))) Iterator.empty
                else bucketHits(m, bucket, band)
              }
            }
          }
        } else {
          // broadcast mode: pack the (already distinct) keys primitive
          // and probe every shard in one map-side stage
          val buf = new Array[Long](raw.length * 2)
          var w = 0
          raw.foreach { r =>
            buf(w) = r.getLong(0); buf(w + 1) = r.getInt(1).toLong; w += 2
          }
          val packed = spark.sparkContext.broadcast(buf)
          val parts = e.parts
          maps.mapPartitionsWithIndex { (idx, ms) =>
            if (!ms.hasNext) Iterator.empty
            else {
              val m = ms.next()
              val arr = packed.value
              Iterator.range(0, arr.length, 2).flatMap { i =>
                val bucket = arr(i)
                // must match HashPartitioner on a boxed Long exactly
                val mod = { val h = bucket.hashCode % parts
                  if (h < 0) h + parts else h }
                if (mod != idx) Iterator.empty
                else bucketHits(m, bucket, arr(i + 1).toInt)
              }
            }
          }
        }
      spark.createDataFrame(out, bucketSchema)
    }
  }

  private def bucketHits(m: BucketMap, bucket: Long, band: Int): Iterator[Row] = {
    val packed = m.get(bucket)
    if (packed == null) Iterator.empty
    else {
      val b = new scala.collection.mutable.ArrayBuffer[Row](4)
      var i = 0
      while (i < packed.length) {
        if (packed(i) == band.toLong) b += Row(band, bucket, packed(i + 1))
        i += 2
      }
      b.iterator
    }
  }

  // ---- sig tier ------------------------------------------------------

  private val sigSchema = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("sig", ArrayType(LongType, containsNull = false),
      nullable = true)))

  /** The (id, sig) rows of `ids` against the base sigs tier at `path`
    * — the candidate stage's signature fetch as hash lookups, same two
    * lookup modes as [[bucketRows]] (candidate sets are pair-scale, so
    * the broadcast mode is the one that ever runs in practice). `ids`
    * must carry an (id long) column. None → caller falls back to the
    * scan-with-semi-join path. */
  def sigRows(spark: SparkSession, slot: String, path: String,
      ids: DataFrame): Option[DataFrame] = {
    if (!enabled(spark)) return None
    serve(spark, slot, path) { tier =>
      val f = tier.schema.fields
      val servable = f.length == 2 &&
        f(0).name == "id" && f(0).dataType == LongType &&
        f(1).name == "sig" &&
        f(1).dataType.isInstanceOf[ArrayType] &&
        f(1).dataType.asInstanceOf[ArrayType].elementType == LongType
      if (!servable) None
      else Some(tier.na.drop(Seq("id"))
        .rdd.map(r => (r.getLong(0),
          if (r.isNullAt(1)) null
          else r.getSeq[Long](1).toArray)))
    } { it =>
      val tmp = new java.util.HashMap[java.lang.Long,
        scala.collection.mutable.ArrayBuffer[Array[Long]]]()
      it.foreach { case (id, sig) =>
        var b = tmp.get(id)
        if (b == null) {
          b = new scala.collection.mutable.ArrayBuffer[Array[Long]](1)
          tmp.put(id, b)
        }
        b += sig
      }
      val m: SigMap = new java.util.HashMap(math.max(16, tmp.size() * 2))
      tmp.forEach((k, v) => m.put(k, v.toArray))
      m
    }.map { e =>
      val maps = e.rdd.asInstanceOf[RDD[SigMap]]
      val kr = ids.select(col("id")).na.drop()
      val raw = kr.distinct().limit(BroadcastKeyCap + 1).collect()
      val out: RDD[Row] =
        if (raw.length > BroadcastKeyCap) {
          val keyRdd = kr.rdd.map(r => (r.getLong(0), ()))
            .partitionBy(new HashPartitioner(e.parts))
          maps.zipPartitions(keyRdd) { (ms, ks) =>
            if (!ms.hasNext) Iterator.empty
            else {
              val m = ms.next()
              val seen = scala.collection.mutable.HashSet.empty[Long]
              ks.flatMap { case (id, _) =>
                if (!seen.add(id)) Iterator.empty else sigHits(m, id)
              }
            }
          }
        } else {
          val packed = spark.sparkContext.broadcast(raw.map(_.getLong(0)))
          val parts = e.parts
          maps.mapPartitionsWithIndex { (idx, ms) =>
            if (!ms.hasNext) Iterator.empty
            else {
              val m = ms.next()
              packed.value.iterator.flatMap { id =>
                val mod = { val h = id.hashCode % parts
                  if (h < 0) h + parts else h }
                if (mod != idx) Iterator.empty else sigHits(m, id)
              }
            }
          }
        }
      spark.createDataFrame(out, sigSchema)
    }
  }

  private def sigHits(m: SigMap, id: Long): Iterator[Row] = {
    val sigs = m.get(id)
    if (sigs == null) Iterator.empty
    else sigs.iterator.map(s => Row(id, s))
  }

  // ---- shared registry ----------------------------------------------

  /** The generation's map RDD, built once per (session, slot, path):
    * `toKeyed` projects the tier to (key, payload) rows or None when
    * the schema is unservable; `fold` turns one co-partitioned slice
    * into its hash map. None is NOT cached — an unservable tier
    * re-checks its schema per probe (one footer read, fallback-path
    * cost only). */
  private def serve[P: scala.reflect.ClassTag](
      spark: SparkSession, slot: String, path: String)
      (toKeyed: DataFrame => Option[RDD[(Long, P)]])
      (fold: Iterator[(Long, P)] => AnyRef): Option[Entry] = {
    val key = (spark, slot)
    // retried when an invalidation lands mid-build: an in-place
    // rebuild rewrites the IDENTICAL legacy path, so an in-flight
    // build over the pre-rebuild files must never register (path
    // comparison alone cannot catch it — hence the epoch)
    while (true) {
      val epoch0 = entries.synchronized {
        sweepStopped()
        val old = entries.get(key)
        if (old != null && old.path == path) {
          graft.core.Stats.counter(spark, "pointindex.hits").add(1L)
          return Some(old)
        }
        invalidationEpoch
      }
      // plan construction + listing OUTSIDE the lock (real I/O against
      // an object store): a cold miss on one index must not serialize
      // every other session's probes JVM-wide
      val tier = spark.read.parquet(path)
      val keyed = toKeyed(tier) match {
        case None => return None
        case Some(k) => k
      }
      val bytes = try VFS(spark).du(path) catch { case _: Throwable => 0L }
      val parts = math.max(spark.sparkContext.defaultParallelism,
        math.min(1 << 14, (bytes / targetShardBytes).toInt + 1))
      val rdd = keyed
        .partitionBy(new HashPartitioner(parts))
        .mapPartitions(it => Iterator.single(fold(it)),
          preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
      rdd.setName(s"graft.pointindex:$slot")
      val registered = entries.synchronized {
        if (invalidationEpoch != epoch0) {
          // an invalidate raced our tier read — our files may predate
          // the rebuild; drop and re-resolve from scratch
          rdd.unpersist(blocking = false)
          None
        } else {
          val again = entries.get(key)
          if (again != null && again.path == path) {
            // another thread registered the same generation while we
            // listed: keep theirs, drop ours
            rdd.unpersist(blocking = false)
            graft.core.Stats.counter(spark, "pointindex.hits").add(1L)
            Some(again)
          } else {
            graft.core.Stats.counter(spark,
              if (again == null) "pointindex.misses" else "pointindex.refreshes")
              .add(1L)
            if (again != null) again.rdd.unpersist(blocking = false)
            val e = Entry(path, rdd, parts, spark)
            entries.put(key, e)
            Some(e)
          }
        }
      }
      registered match {
        case Some(e) => return Some(e)
        case None => () // epoch moved: retry with fresh listing
      }
    }
    sys.error("unreachable")
  }

  private def sweepStopped(): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val stopped =
        try e.getValue.session.sparkContext.isStopped
        catch { case _: Throwable => true }
      if (stopped) {
        try e.getValue.rdd.unpersist(blocking = false)
        catch { case _: Throwable => () }
        it.remove()
      }
    }
  }

  /** Unpersist and forget everything (tests; session teardown). */
  def clear(): Unit = entries.synchronized {
    invalidationEpoch += 1
    val it = entries.values().iterator()
    while (it.hasNext) {
      try it.next().rdd.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
    entries.clear()
  }

  /** Unpersist and forget one index's slots (path-boundary prefix,
    * matching [[TierCache.invalidate]]'s discipline). */
  def invalidate(prefix: String): Unit = entries.synchronized {
    invalidationEpoch += 1
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._2.startsWith(prefix)) {
        try e.getValue.rdd.unpersist(blocking = false)
        catch { case _: Throwable => () }
        it.remove()
      }
    }
  }
}
