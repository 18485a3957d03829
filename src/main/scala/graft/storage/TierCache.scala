package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Generation-keyed executor-memory cache for the IMMUTABLE base
  * tiers of the persisted indexes (dedup bucket/sig tables, BM25
  * postings, IVF cells).
  *
  * Why this exists: a steady-state index probe is a batch of point
  * lookups on HASH keys (LSH buckets, candidate doc ids). Hash keys
  * are uniformly distributed, so every min/max-based pushdown vehicle
  * — isin literals (converted to a [min,max] range above the parquet
  * In threshold), coalesced BETWEEN range batches, footer stats — has
  * ~zero selectivity once the probe carries more keys than the tier
  * has row groups: the ranges cover the whole domain (measured: the
  * r17 sig-fetch isin experiment regressed 66–86%, and the r18 range
  * matrix below BASELINE.md's probe section shows 512 span-minimal
  * ranges still covering 90.42%/95.01% of tier rows at 24k/51k probe
  * keys). The scan itself is the cost,
  * and no predicate shape removes it.
  *
  * What DOES remove it: the tiers are immutable between maintenance
  * flips ([[VersionedDir]] generations), so the repeated narrow scans
  * belong in the block manager, not on disk. Each (index uri,
  * component) slot memoizes one persisted DataFrame keyed by its
  * RESOLVED generation path; a maintenance flip changes the path, so
  * the next read unpersists the stale entry and re-registers the new
  * generation. Probe filters still prune inside the cache:
  * InMemoryTableScan keeps per-batch column stats, and the tiers are
  * written key-sorted, so batch pruning matches the parquet row-group
  * pruning it replaces.
  *
  * At cluster scale this is the standard serving shape for index
  * probes: the narrow tier (~0.5% of corpus bytes for the dedup
  * index) rides aggregate executor memory, probes run at memory
  * bandwidth, and `MEMORY_AND_DISK` keeps the worst case (tier >
  * aggregate memory) a spill, never an OOM. Opt out per session with
  * `graft.index.cacheBase=false` (every cached read falls back to the
  * plain parquet scan).
  *
  * Only BASE generations belong here. Inc tiers change on every
  * append and are bounded by the minor-fold cadence — they stay fresh
  * parquet scans. And only NARROW tiers qualify: the dedup index's
  * bucket/sig tables are ~0.5% of corpus bytes, so aggregate executor
  * memory holds them at any corpus size. BM25 postings (≈ the token
  * stream) and IVF cells (the vectors themselves) are corpus-sized —
  * pinning them would evict everything else for a scan that path
  * selection (postings tb= dirs) or partition pruning (probed cells)
  * already bounds; they deliberately do NOT ride this cache.
  */
object TierCache {

  private case class Entry(path: String, df: DataFrame, session: SparkSession)

  private val MaxEntries = 64

  /** (session, slot) → cached generation, LRU-bounded: an
    * app (or test run) that touches many indexes must not pin every
    * tier it ever probed — the eldest slot is unpersisted and dropped
    * past [[MaxEntries]]. The key holds the SparkSession ITSELF
    * (reference equality — SparkSession doesn't override equals), not
    * an identity hash: two live sessions can collide on a hash, and a
    * collision would hand session A's cached plan to session B.
    * Access is synchronized on the map: this is plan-level traffic
    * (once per probe), never per-row. */
  private val entries =
    new java.util.LinkedHashMap[(SparkSession, String), Entry](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), Entry]): Boolean =
        size() > MaxEntries && {
          try e.getValue.df.unpersist(blocking = false)
          catch { case _: Throwable => () }
          true
        }
    }

  /** Session opt-out: `graft.index.cacheBase=false` restores plain
    * parquet scans everywhere a reader consults this cache. Entries
    * cached BEFORE the opt-out still apply (Spark's CacheManager
    * substitutes a registered InMemoryRelation into any matching scan)
    * — call [[clear]] to drop them too. */
  def enabled(spark: SparkSession): Boolean =
    // defensive parse: only an explicit "false" opts out — a malformed
    // value ("off", "") must not turn every subsequent probe into an
    // IllegalArgumentException
    !spark.conf.getOption("graft.index.cacheBase")
      .exists(_.trim.equalsIgnoreCase("false"))

  /** The memoized persisted scan of `path` for `slot` (e.g.
    * `"<indexUri>#data"`). `read` builds the plain scan; it runs once
    * per generation. When `path` differs from the cached entry's (a
    * maintenance flip), the stale DataFrame is unpersisted
    * (non-blocking — in-flight probes that already planned against it
    * keep their partitions until they finish) and the new generation
    * takes the slot. Caching is lazy: persist() marks the plan, the
    * first probe's scan populates the blocks. */
  def scan(spark: SparkSession, slot: String, path: String)
      (read: => DataFrame): DataFrame = {
    if (!enabled(spark)) return read
    val key = (spark, slot)
    entries.synchronized {
      sweepStopped()
      val old = entries.get(key)
      if (old != null && old.path == path) {
        graft.core.Stats.counter(spark, "tiercache.hits").add(1L)
        return old.df
      }
      // counted, never silent: `refreshes` separates flip-driven
      // re-registration from cold misses when reading a probe loop's
      // stats dump
      graft.core.Stats.counter(spark,
        if (old == null) "tiercache.misses" else "tiercache.refreshes")
        .add(1L)
    }
    // the relation build (file listing, schema resolution — real I/O
    // against an object store) and the persist registration run
    // OUTSIDE the lock: a cold miss on one index must not serialize
    // every other session's cached probes JVM-wide
    val fresh = read.persist(StorageLevel.MEMORY_AND_DISK)
    entries.synchronized {
      val again = entries.get(key)
      if (again != null && again.path == path) {
        // another thread registered the same generation while we
        // listed: keep theirs, drop ours
        fresh.unpersist(blocking = false)
        again.df
      } else {
        if (again != null) again.df.unpersist(blocking = false)
        entries.put(key, Entry(path, fresh, spark))
        fresh
      }
    }
  }

  /** Drop entries whose session's context is stopped (stop/recreate
    * patterns would otherwise pin dead generations until LRU churn —
    * and with < MaxEntries slots touched, forever). Called under the
    * entries lock; ≤ MaxEntries iterations. Sessions replaced WITHOUT
    * stopping share a live context and need an explicit [[clear]]. */
  private def sweepStopped(): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val stopped =
        try e.getValue.session.sparkContext.isStopped
        catch { case _: Throwable => true }
      if (stopped) {
        try e.getValue.df.unpersist(blocking = false)
        catch { case _: Throwable => () }
        it.remove()
      }
    }
  }

  /** Unpersist and forget ONE session's slot — called when the slot's
    * generation registers executor-resident point maps
    * ([[PointIndex]]): the maps supersede the cached scan for probe
    * traffic, and keeping both pins ~4× the tier bytes where ~3×
    * serves. Scoped to the session (another session without point maps
    * keeps its cache) and idempotent. */
  private[storage] def release(spark: SparkSession, slot: String): Unit =
    entries.synchronized {
      val e = entries.remove((spark, slot))
      if (e != null) {
        try e.df.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }

  /** Unpersist and forget every cached generation (tests; session
    * teardown). */
  def clear(): Unit = entries.synchronized {
    val it = entries.values().iterator()
    while (it.hasNext) {
      try it.next().df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session already stopped
    }
    entries.clear()
  }

  /** Unpersist and forget the slots of one index uri (e.g. after
    * deleting or rebuilding the index in place). */
  def invalidate(prefix: String): Unit = entries.synchronized {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._2.startsWith(prefix)) {
        try e.getValue.df.unpersist(blocking = false)
        catch { case _: Throwable => () }
        it.remove()
      }
    }
  }
}
