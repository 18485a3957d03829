package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.storage.VFS

/** Persisted MinHash-LSH dedup index for INCREMENTAL near-duplicate
  * detection: build the banded index over the corpus ONCE, then probe
  * each arriving batch against it without touching the corpus again.
  *
  * At 100 TB, re-running LSH over corpus ∪ batch per ingest batch is
  * the difference between a pipeline and a science project: the corpus
  * pass alone dominates every batch. This index makes the steady-state
  * cost proportional to the BATCH, not the corpus:
  *
  *  - layout (v2, round 9): NARROW bucket rows `data/(band, bucket,
  *    id)` (~24 B/row) range-partitioned and sorted by (band, bucket)
  *    for footer-stat pruning, plus a separate signature table
  *    `sigs/(id, sig)` written once per doc. Signatures do NOT ride
  *    the bucket rows: a 64-lane sig is ~20× the row's key width, and
  *    once a large batch's probe buckets saturate the row-group
  *    [min,max] ranges (uniform hashes do, at a few thousand probe
  *    keys) the probe degrades to one map-side pass of the bucket
  *    table — which must therefore be as narrow as possible. Measured
  *    at the 100× rehearsal (500k docs): the v1 fat layout read ~4 GB
  *    of mostly-discarded sigs per saturated probe; v2 reads ~200 MB
  *    of keys plus candidate-scale sig lookups;
  *  - probe: the batch's bucket hashes are collected (bounded: bands ×
  *    batch rows, capped by `maxProbeKeys`) and pushed into the bucket
  *    scan as an `isin` filter — row groups prune when the probe set
  *    is small, and the fallback full pass is narrow. Candidate PAIRS
  *    are formed and deduped first (bucket-cap bounded); only then are
  *    the candidates' corpus sigs fetched by one broadcast-semi-join
  *    pass of `sigs/`. Batch side broadcast everywhere: the index
  *    never shuffles, never sorts, is never collected;
  *  - decision: signature-estimated Jaccard (`LaneMatches/numHashes`)
  *    against the fetched 64-lane signatures — no corpus text access.
  *    Pass `verifyWith` (id → text over the corpus) to add the exact
  *    hashed-shingle verification for est-borderline pairs, same
  *    two-stage shape as [[Dedup.minhashNearDups]];
  *  - maintenance: `append` adds new docs' banded rows as additional
  *    sorted files (cheap, batch-sized); bucket-range overlap between
  *    appended files and the base degrades pruning slowly — `build`
  *    again to re-cluster (the analogue of consolidation).
  *
  * Banding math is identical to the batch path
  * ([[Dedup.lshCandidates]]), so index probes find exactly the pairs
  * the one-shot run would. Reference semantics anchor: near-dup LSH
  * banding as in the batch dedup surface; the persisted form is our
  * scale extension (no reference counterpart).
  */
object DedupIndex {

  /** Index parameters, persisted as `_params.json` and re-checked on
    * probe so an index built with one (k, numHashes, bands) is never
    * silently probed with another. `maxBucket` mirrors
    * [[Dedup.bucketedPairs]]: buckets larger than it are dropped AT
    * BUILD TIME, so a degenerate bucket (a million boilerplate
    * near-copies that exact dedup should have removed first) can never
    * make a probe quadratic — and probe results match what the
    * one-shot batch path would emit under the same cap. */
  case class Params(k: Int, numHashes: Int, bands: Int, maxBucket: Int)

  private def paramsPath(uri: String) = s"$uri/_params.json"
  private def dataPath(uri: String) = s"$uri/data"
  private def sigsPath(uri: String) = s"$uri/sigs"
  /** live sigs dir — same [[graft.storage.VersionedDir]] flip as the
    * bucket table: [[compact]] coalesces the per-append sig files
    * (every probe opens EVERY sigs file for its map-side semi-join
    * pass, so file count — 1 per append — is probe-cost growth the
    * streaming rehearsal measured; legacy unversioned dirs resolve as
    * generation 0). */
  private[graft] def liveSigsPath(spark: SparkSession, uri: String): String =
    graft.storage.VersionedDir.resolve(VFS(spark), uri, "sigs")
  /** live bucket-table dir — [[compact]] flips generations via
    * [[graft.storage.VersionedDir]], so probes concurrent with (or
    * crashed) compacts always resolve a complete directory. */
  private[graft] def liveDataPath(spark: SparkSession, uri: String): String =
    graft.storage.VersionedDir.resolve(VFS(spark), uri, "data")

  /** INC tier (r16): [[append]] writes into `data_inc`/`sigs_inc`
    * (their own [[graft.storage.VersionedDir]] bases) instead of the
    * base generation dirs. The split is what makes streaming
    * maintenance BOUNDED: [[minorCompact]] folds only the inc tier —
    * O(appends since the last major compact), never a rewrite of the
    * base corpus — while [[compact]] (major) folds base ∪ inc into a
    * new base generation and resets the inc tier. Readers take base ∪
    * inc in ONE multi-path flat scan (both tiers are plain sorted
    * parquet files — same pushdowns, one listing each, no per-tier
    * union legs). Pre-r16 indexes have no inc dirs and read
    * identically (existence-filtered). */
  private[graft] def liveDataIncPath(spark: SparkSession, uri: String): String =
    graft.storage.VersionedDir.resolve(VFS(spark), uri, "data_inc")
  private[graft] def liveSigsIncPath(spark: SparkSession, uri: String): String =
    graft.storage.VersionedDir.resolve(VFS(spark), uri, "sigs_inc")

  private def readFlatMulti(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val fs = VFS(spark)
    // base always exists and carries schema-bearing files (build writes
    // both tables even over an empty corpus), so no empty fallback here
    spark.read.parquet(paths.filter(fs.exists): _*)
  }

  /** base ∪ inc rows with the BASE leg riding
    * [[graft.storage.TierCache]]: the base generation is immutable
    * until a major flip, so steady-state probes scan it from executor
    * memory instead of re-reading the whole narrow tier from disk per
    * batch — the one probe cost that tracked corpus size (no pushdown
    * vehicle can prune uniformly-hashed probe keys; see TierCache).
    * The INC leg stays a fresh parquet scan: it changes per append and
    * is bounded by the minor-fold cadence. Probe filters still prune
    * the cached leg (InMemoryTableScan batch stats over the key-sorted
    * tier) and push into the inc leg's parquet scan as before. With
    * `graft.index.cacheBase=false` this is exactly the r17 one-scan
    * multi-path read. */
  private def readTiered(spark: SparkSession, uri: String, slot: String,
      inc: String, basePath: String): DataFrame = {
    val fs = VFS(spark)
    if (!graft.storage.TierCache.enabled(spark))
      return readFlatMulti(spark, Seq(inc, basePath))
    // existence-guard the base leg exactly as readFlatMulti does: a
    // crash state with no committed generation and no legacy dir
    // (VersionedDir falls back to the nonexistent legacy path) must
    // degrade to the inc tier, not throw AnalysisException
    if (!fs.exists(basePath)) return readFlatMulti(spark, Seq(inc))
    // double-residency guard (r20): when this generation's POINT maps
    // are live ([[graft.storage.PointIndex]] serves the probe traffic),
    // a fold/maintenance read takes the plain parquet scan instead of
    // pinning a SECOND in-memory tier copy here — maps ~2–3× raw plus
    // an InMemoryRelation ~1× raw is ~4× aggregate memory where ~3×
    // serves. Maintenance reads run once per cadence, so the cold scan
    // is the right trade. Conditioned on point serving being ENABLED:
    // with `pointProbe=false` the scan path IS the probe path (the
    // cache is its serving structure), even if stale maps linger from
    // before the opt-out — and with the maps evicted, hasLive is false
    // and the cache path is unchanged.
    val base =
      if (graft.storage.PointIndex.enabled(spark) &&
          graft.storage.PointIndex.hasLive(spark, s"$uri#$slot", basePath))
        spark.read.parquet(basePath)
      else graft.storage.TierCache.scan(spark, s"$uri#$slot", basePath)(
        spark.read.parquet(basePath))
    // data-file check, not bare exists: a freshly-reset empty inc
    // generation lists only its commit marker, and a parquet scan of a
    // data-file-less dir dies on schema inference
    val incLive = fs.exists(inc) &&
      graft.storage.VersionedDir.hasDataFiles(fs.lsFilesRecursive(inc).toSet)
    if (incLive) spark.read.parquet(inc).unionByName(base) else base
  }

  /** base ∪ inc bucket rows — every reader's view of the index.
    *
    * INC resolved FIRST, deliberately: a read racing a major compact's
    * base-flip → inc-reset window then pairs the OLD inc (grace copy,
    * still on disk) with the NEW base — appended rows appear TWICE
    * (transient, healed by the probe's pair distinct). Base-first
    * resolution would pair the OLD base with the NEW reset-empty inc —
    * appended rows transiently VANISH, which for a dedup probe means a
    * real duplicate can slip through as a survivor. Duplicates are the
    * benign direction; order the resolutions for it. */
  private[graft] def readDataAll(spark: SparkSession, uri: String): DataFrame = {
    val inc = liveDataIncPath(spark, uri)
    // race injection: a full maintenance flip can be forced HERE —
    // after the inc resolution, before the base's (FlipRaceSpec pins
    // the duplicates-not-vanishing contract deterministically)
    graft.storage.FlipHooks.at("dedup.read.betweenResolves")
    readTiered(spark, uri, "data", inc, liveDataPath(spark, uri))
  }

  /** base ∪ inc signature rows (inc resolved first — see
    * [[readDataAll]]). */
  private[graft] def readSigsAll(spark: SparkSession, uri: String): DataFrame = {
    val inc = liveSigsIncPath(spark, uri)
    readTiered(spark, uri, "sigs", inc, liveSigsPath(spark, uri))
  }

  private def writeParams(spark: SparkSession, uri: String, p: Params): Unit = {
    import graft.core.Json._
    graft.storage.Encryption.dirJsonWrite(spark, uri, paramsPath(uri),
      render(JObj(Seq(
        "k" -> JLong(p.k), "numHashes" -> JLong(p.numHashes),
        "bands" -> JLong(p.bands), "maxBucket" -> JLong(p.maxBucket),
        "layout" -> JLong(2)))))
  }

  def readParams(spark: SparkSession, uri: String): Params = {
    import graft.core.Json._
    val o = parse(graft.storage.Encryption.dirJsonRead(spark, uri, paramsPath(uri))).obj
    def i(k: String) = o(k).getOrElse(sys.error(s"index params missing $k")).long.toInt
    require(o("layout").exists(_.long == 2L),
      s"dedup index at $uri predates the v2 split-signature layout — " +
        "rebuild it with DedupIndex.build")
    Params(i("k"), i("numHashes"), i("bands"), i("maxBucket"))
  }

  private def normHashes(c: Column, k: Int) = graft.functions.ShingleHashes(
    lower(regexp_replace(trim(c), TextAnalysis.WsClass + "+", " ")), k)

  /** (id, sig) rows — one per doc. */
  private def sigRows(df: DataFrame, idCol: String, textCol: String,
      p: Params): DataFrame =
    df.select(col(idCol).as("id"),
      Dedup.minhashSignatureFromHashes(
        normHashes(col(textCol), p.k), p.numHashes).as("sig"))

  /** (id, sig, band, bucket) rows from (id, sig) rows — the banding is
    * bit-identical to [[Dedup.lshCandidates]] (band-seeded xxhash64 of
    * the signature slice). */
  private def bandedFromSigs(sigs: DataFrame, p: Params): DataFrame = {
    val rowsPerBand = p.numHashes / p.bands
    sigs.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(p.bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
  }

  private def bandedRows(df: DataFrame, idCol: String, textCol: String,
      p: Params): DataFrame = bandedFromSigs(sigRows(df, idCol, textCol, p), p)

  /** Build (or rebuild) the index at `uri` from the corpus. One corpus
    * TEXT pass writes `sigs/`; banding then derives from the written
    * sigs (a narrow second pass — the text is never re-read).
    * `filesPerBand` sizes the bucket-table range partitioning: total
    * files ≈ bands × filesPerBand, each covering ~1/filesPerBand of
    * one band's bucket space. */
  def build(df: DataFrame, idCol: String, textCol: String, uri: String,
      k: Int = 5, numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = 64, filesPerBand: Int = 4,
      encryptionKey: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val p = Params(k, numHashes, bands, maxBucket)
    val fs = VFS(spark)
    fs.delete(uri)
    // an in-place rebuild lands at the SAME legacy generation paths
    // ($uri/data, $uri/sigs) — drop any cached generation keyed to
    // them or probes would keep serving the pre-rebuild rows
    graft.storage.TierCache.invalidate(s"$uri#")
    graft.storage.PointIndex.invalidate(s"$uri#")
    // signatures/buckets are derived from corpus text — an encrypted
    // corpus needs its dedup index encrypted too; appends/compacts
    // inherit the key from the dir marker
    encryptionKey.foreach(id => graft.storage.Encryption.markDir(spark, uri, id))
    sigRows(df, idCol, textCol, p).write.mode("overwrite")
      .options(graft.storage.Encryption.dirWriteOptions(spark, uri))
      .parquet(sigsPath(uri))
    writeCapped(bandedFromSigs(spark.read.parquet(sigsPath(uri)), p),
      uri, p, filesPerBand, "overwrite", dataPath(uri))
    writeParams(spark, uri, p)
  }

  /** Drop over-cap (band, bucket) groups, then write the NARROW bucket
    * rows (band, bucket, id) range-partitioned and bucket-sorted. The
    * group-size pass aggregates 12-byte keys (partial map-side
    * combine), so the extra shuffle ships no more than the bucket rows
    * themselves. */
  private def writeCapped(banded: DataFrame, uri: String, p: Params,
      filesPerBand: Int, mode: String, target: String): Unit = {
    val sizes = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > p.maxBucket)
      .select("band", "bucket")
    banded.join(sizes, Seq("band", "bucket"), "left_anti")
      .select("band", "bucket", "id")
      .repartitionByRange(math.max(1, p.bands * filesPerBand),
        col("band"), col("bucket"))
      .sortWithinPartitions("band", "bucket")
      .write.mode(mode)
      .options(graft.storage.Encryption.dirWriteOptions(banded.sparkSession, uri))
      .parquet(target)
  }

  /** Incrementally add `df`'s docs to the index: batch-sized work, no
    * corpus re-read. New sig and bucket files land in the INC tier
    * (`sigs_inc`/`data_inc`) — one batch-sized file each; probes keep
    * pruning per-file, so steady-state probe cost grows with the inc
    * FILE COUNT over the probed ranges, not corpus size. Run
    * [[minorCompact]] to fold the inc files (bounded — never touches
    * the base), [[compact]] to fold everything. */
  def append(df: DataFrame, idCol: String, textCol: String, uri: String,
      filesPerBand: Int = 1): Unit = {
    val spark = df.sparkSession
    val p = readParams(spark, uri)
    // batch-scale: checkpoint the sigs once, write them, band from them
    val sigs = sigRows(df, idCol, textCol, p).localCheckpoint(true)
    // empty batch = nothing to index: skip BOTH writes. An idle stream
    // (all-duplicate batches) would otherwise drip zero-row parquet
    // files into the inc tiers, and every cadence fold would rewrite
    // and flip an empty generation for nothing — needless generation
    // churn the minor fold's zero-row guard below also defends against
    // (for files written before this skip existed)
    if (sigs.isEmpty) return
    sigs.write.mode("append")
      .options(graft.storage.Encryption.dirWriteOptions(spark, uri))
      .parquet(liveSigsIncPath(spark, uri))
    // the cap is enforced within the appended batch only; groups that
    // exceed maxBucket across base+appends are re-capped at probe time
    // exactly (candidatePairs) and at rest on the next major compact
    writeCapped(bandedFromSigs(sigs, p), uri, p, filesPerBand, "append",
      liveDataIncPath(spark, uri))
  }

  /** Probe: near-duplicate matches of `batch` docs against the indexed
    * corpus. Returns (id, match_id, est [, jaccard]) — one row per
    * (batch doc, matched corpus doc) with estimate ≥ `threshold`
    * (exact-verified ≥ threshold when `verifyWith` is given).
    *
    * DEFAULT path (r19): the base tiers are served by POINT LOOKUP
    * ([[graft.storage.PointIndex]]) — the batch's distinct (band,
    * bucket) keys probe executor-resident per-generation hash maps,
    * O(batch keys) with ZERO base-tier bytes scanned; the candidates'
    * signatures fetch the same way by id. Only the fold-cadence-
    * bounded INC tiers are scanned, with the probe buckets pushed as
    * an isin literal below `maxProbeKeys` (footer-stat pruning) and a
    * broadcast semi-join above it. Opt out with
    * `graft.index.pointProbe=false` (also automatic for non-long id
    * tiers), which restores the r18 SCAN model end-to-end: the probe
    * buckets push into one base ∪ inc tier scan — isin below
    * `maxProbeKeys` (a bigger In-literal is a plan bomb long before
    * 10⁶ literals), broadcast semi-join above it (no driver collect,
    * map-side drop, only footer pruning lost) — and the sig fetch is
    * a whole-tier broadcast semi-join. Either way: never a
    * corpus-text pass. */
  def probe(batch: DataFrame, idCol: String, textCol: String, uri: String,
      threshold: Double = 0.7, maxProbeKeys: Int = 1 << 15,
      verifyWith: Option[DataFrame] = None): DataFrame = {
    val spark = batch.sparkSession
    val p = readParams(spark, uri)
    val banded = bandedRows(batch, idCol, textCol, p).localCheckpoint(true)
    // candidate pairs materialize EAGERLY (pair-scale): they feed both
    // the sig fetch and the estimate join, and without the checkpoint
    // the broadcast subtree would re-run the bucket-table scan;
    // materialize=true makes the whole candidate stage ONE tier pass,
    // and the probed-rows cache is dropped the moment the pair set
    // lands in the checkpoint
    // per-probe broadcast lifecycle (r20): the point path's packed-key
    // broadcasts are leased and DESTROYED the moment the stage that
    // consumed them materializes — a streaming loop probing every
    // micro-batch must not accumulate up-to-16 MB broadcast blocks
    // between ContextCleaner GC cycles (same explicit discipline as
    // prunedHandle below).
    val leaseA = graft.storage.PointIndex.lease(spark)
    // finally-released: a failed checkpoint job must not leak the
    // tracked broadcasts until ContextCleaner GC (release is
    // idempotent and swallows already-destroyed)
    val candidates = try {
      val (cand0, prunedHandle) =
        candidatePairsImpl(banded, uri, p, maxProbeKeys, materialize = true,
          lease = Some(leaseA))
      val c = cand0.localCheckpoint(true)
      prunedHandle.foreach(_.unpersist(blocking = false))
      c
    } finally leaseA.release()
    // candidates' corpus signatures: point lookups on the base sigs
    // generation (the broadcast semi-join carries NO file pruning, so
    // the scan fallback reads the whole sigs tier per probe — the
    // second corpus-tracking term the point path removes); inc sigs
    // stay a fresh semi-joined scan. Either way the result is
    // candidate-scale, so forcing it broadcast is safe and keeps the
    // estimate join shuffle-free. Checkpointed EAGERLY (pair-scale):
    // it bounds the sig broadcast's lifetime to this probe call (the
    // lease destroys it here, not when the caller eventually consumes
    // the lazy result) and keeps a caller that runs two actions on the
    // returned frame from paying the sig fetch twice.
    val mids = candidates.select(col("__mid").as("id")).distinct()
    val leaseB = graft.storage.PointIndex.lease(spark)
    val corpusSigs = try {
      pointSigFetch(spark, uri, mids, Some(leaseB))
        .getOrElse(readSigsAll(spark, uri)
          .join(broadcast(mids), Seq("id"), "left_semi"))
        .select(col("id").as("__mid"), col("sig").as("__msig"))
        .localCheckpoint(true)
    } finally leaseB.release()
    // recomputed narrow (one row per doc by construction) rather than
    // deduped out of `banded` — a dropDuplicates would ship the sig
    // arrays through a shuffle for nothing
    val batchSigs = sigRows(batch, idCol, textCol, p)
      .select(col("id").as("__qid"), col("sig").as("__qsig"))
    val est = graft.functions.LaneMatches(col("__qsig"), col("__msig"))
      .cast("double") / p.numHashes.toDouble
    val estimates = candidates
      .join(broadcast(batchSigs), Seq("__qid"))
      .join(broadcast(corpusSigs), Seq("__mid"))
      .withColumn("est", round(est, 6))
      .select(col("__qid"), col("__mid"), col("est"))
    // final distinct is pair-scale and guards against duplicate
    // (id, sig) rows in sigs/ (an id re-appended with the same text
    // would otherwise emit its match pairs once per duplicate row;
    // ids re-appended with CHANGED text violate the unique-id
    // contract and surface as distinct est values)
    verifyWith match {
      case None =>
        estimates.filter(col("est") >= threshold)
          .select(col("__qid").as("id"), col("__mid").as("match_id"), col("est"))
          .distinct()
      case Some(corpus) =>
        // exact verify on hashed shingle sets: batch side recomputed
        // (narrow), corpus side joined against the pair-scale survivor
        // set. The corpus hash frame must never be BROADCAST whole —
        // its shingle projection is exactly the bogus-small-estimated
        // array frame the 100x rehearsal caught Catalyst broadcasting
        // in minhashNearDups — so ride the same honest-input-size gate:
        // below the threshold (bench scale) the r9 plan stands
        // unchanged (AQE broadcasts the pair-scale survivors, the
        // corpus frame is streamed, not shuffled); above it the corpus
        // side pins a shuffle-on-key merge join, the always-safe
        // 100 TB shape. No checkpoint, no double compute.
        val survivors = estimates.filter(col("est") >= threshold - 0.15)
        val qh = batch.select(col(idCol).as("__qid"),
          normHashes(col(textCol), p.k).as("__qh"))
        val corpusSide = Dedup.corpusJoinSide(corpus)
        // prune the corpus BEFORE shingle-hashing it: only candidate
        // mids can survive the join below, so the same broadcast
        // semi-join the sig fetch rides keeps the expensive
        // normHashes pass candidate-scale instead of corpus-scale
        // (profiled: the un-pruned pass was the bulk of probe cost —
        // a full corpus text scan + hashing for a pair-scale join)
        val mh = corpusSide(corpus
          .join(broadcast(mids.withColumnRenamed("id", idCol)),
            Seq(idCol), "left_semi")
          .select(col(idCol).as("__mid"),
            normHashes(col(textCol), p.k).as("__mh")))
        survivors.join(qh, "__qid").join(mh, "__mid")
          .withColumn("jaccard", Dedup.hashedJaccard(col("__qh"), col("__mh")))
          .filter(col("jaccard") >= threshold)
          .select(col("__qid").as("id"), col("__mid").as("match_id"),
            col("est"), round(col("jaccard"), 6).as("jaccard"))
          .distinct()
    }
  }

  /** Re-cluster the bucket table after many appends WITHOUT re-reading
    * any corpus text: the narrow (band, bucket, id) rows are re-range-
    * partitioned and re-sorted into `filesPerBand` files per band, and
    * the corpus∪appends bucket cap is re-enforced (append only caps
    * within its own batch). The SIGS table coalesces in the same pass
    * (~250k rows ≈ 130 MB per file, id-range-clustered): append leaves
    * one sig file per batch, and every probe's map-side semi-join
    * opens every sigs file — the per-batch latency growth the 10x
    * streaming rehearsal measured was mostly this file-count tax.
    * This is the cheap maintenance verb between appends and a full
    * [[build]] — one pass of the ~24 B/row key table plus one pass of
    * the sig rows, independent of text size. Maintenance is
    * single-writer, and since r16 the contract is CHECKED, not just
    * documented: each table's flip re-lists its live generation and
    * ABORTS loudly if files appeared during the compaction pass (a
    * concurrent append — its rows are not in the new generation and
    * would otherwise be silently dropped at retirement). Concurrent
    * PROBES remain safe throughout — generation flip. */
  def compact(spark: SparkSession, uri: String, filesPerBand: Int = 4): Unit = {
    val p = readParams(spark, uri)
    val fs = VFS(spark)
    // zero sig rows == zero indexed docs (build and append write both
    // tables together): nothing to compact, and flipping EITHER table
    // to a generation written from an empty frame would rest on writer
    // internals for the next read's schema (the build-over-empty
    // streaming bootstrap keeps its schema-bearing original files)
    val nSigs = readSigsAll(spark, uri).count()
    if (nSigs == 0) return
    // inc listings FIRST (the guard basis for the resets below): an
    // append lands in the inc tier, so the single-writer check moved
    // there with the appends; the base dirs only change via compacts
    val dataIncBefore = graft.storage.VersionedDir.liveListing(fs, uri, "data_inc")
    val sigsIncBefore = graft.storage.VersionedDir.liveListing(fs, uri, "sigs_inc")
    val dataBefore = graft.storage.VersionedDir.liveListing(fs, uri, "data")
    val next = graft.storage.VersionedDir.next(fs, uri, "data")
    // distinct() FIRST: heals exact row duplicates from replayed
    // appends and from a crash between a base flip and its inc reset
    // (rows then live in both tiers until this fold). It must run
    // BEFORE the over-cap sizes below — duplicate rows would inflate
    // bucket counts and permanently drop genuinely under-cap buckets.
    // Changed-text re-appends are NOT collapsed — different sigs stay
    // distinct rows and keep surfacing through probe's est values,
    // per the unique-id contract.
    val rows = readDataAll(spark, uri).distinct()
    val sizes = rows.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > p.maxBucket)
      .select("band", "bucket")
    rows.join(sizes, Seq("band", "bucket"), "left_anti")
      .repartitionByRange(math.max(1, p.bands * filesPerBand),
        col("band"), col("bucket"))
      .sortWithinPartitions("band", "bucket")
      .write.mode("overwrite")
      .options(graft.storage.Encryption.dirWriteOptions(spark, uri))
      .parquet(next)
    // flip: concurrent probes keep reading the old generation until
    // the marker lands; a crash here leaves it live (no missing-dir
    // window). Guarded against base writes (single-writer belt).
    graft.storage.VersionedDir.commitGuarded(fs, uri, "data", next, dataBefore)
    // race injection: the base-flip → inc-reset window (appended rows
    // live in BOTH tiers; probes must see duplicates, never a gap)
    graft.storage.FlipHooks.at("dedup.compact.afterDataFlip")
    // reset the inc tier to an EMPTY generation — guarded against the
    // listing taken BEFORE the fold read: an append that landed mid-
    // compact aborts here, loudly (its rows are in the live inc but
    // not in the new base; dropping the tier would lose them). On
    // abort the rows exist in BOTH tiers until the next compact's
    // distinct() — probes stay correct throughout (pair distinct).
    if (graft.storage.VersionedDir.hasDataFiles(dataIncBefore))
      graft.storage.VersionedDir.resetEmptyGuarded(fs, uri, "data_inc",
        dataIncBefore, grace = 2)
    val sigsBefore = graft.storage.VersionedDir.liveListing(fs, uri, "sigs")
    val sigs = readSigsAll(spark, uri)
    val nextSigs = graft.storage.VersionedDir.next(fs, uri, "sigs")
    sigs.distinct()
      .repartitionByRange(
        math.max(1, math.ceil(nSigs / 250000.0).toInt), col("id"))
      .sortWithinPartitions("id")
      .write.mode("overwrite")
      .options(graft.storage.Encryption.dirWriteOptions(spark, uri))
      .parquet(nextSigs)
    graft.storage.VersionedDir.commitGuarded(fs, uri, "sigs", nextSigs, sigsBefore)
    // race injection: the sigs-flip → sigs-inc-reset window
    graft.storage.FlipHooks.at("dedup.compact.afterSigsFlip")
    if (graft.storage.VersionedDir.hasDataFiles(sigsIncBefore))
      graft.storage.VersionedDir.resetEmptyGuarded(fs, uri, "sigs_inc",
        sigsIncBefore, grace = 2)
    // warm-at-flip (r20): build the NEW generations' point maps on the
    // background warmer so the first post-flip probe finds them hot
    // instead of paying the full tier-pass first-touch (measured 8.6 s
    // vs ~2.7 steady at the 100× matrix). Reached only on the COMMIT
    // path — every abort above throws before this line — and the paths
    // re-resolve AFTER the commits, so a crashed flip never warms a
    // stale generation.
    graft.storage.PointIndex.warmAsync(spark,
      (s"$uri#data", liveDataPath(spark, uri)),
      (s"$uri#sigs", liveSigsPath(spark, uri)))
  }

  /** BOUNDED maintenance (r16): fold ONLY the inc tier — coalesce the
    * one-file-per-append sig/bucket files into few sorted files via the
    * inc tier's own generation flip. Cost is O(appends since the last
    * MAJOR compact); the base corpus is never read or rewritten, which
    * is what makes this safe to run inside a streaming foreachBatch at
    * any index size (the in-loop `compactEvery` default). File-count
    * growth — the measured probe tax — resets each fold; bucket-range
    * sorting within the folded files restores row-group pruning over
    * the inc tier. Run [[compact]] (major) during lulls to fold the
    * accumulated inc tier into the base and re-enforce the at-rest
    * bucket cap globally. Reader-safe (flip); single-writer vs appends
    * (guarded — a mid-fold append aborts the flip loudly). */
  def minorCompact(spark: SparkSession, uri: String,
      filesPerBand: Int = 1): Unit = {
    val p = readParams(spark, uri)
    val fs = VFS(spark)
    val dataIncBefore = graft.storage.VersionedDir.liveListing(fs, uri, "data_inc")
    if (graft.storage.VersionedDir.hasDataFiles(dataIncBefore)) {
      val cur = liveDataIncPath(spark, uri)
      // zero-row guard (mirrors the sigs tier): legacy empty-append
      // files hold no rows — folding them would rewrite and flip an
      // empty generation every cadence for nothing. append() now skips
      // empty batches entirely, so this triggers only on pre-existing
      // zero-row files, which the next MAJOR compact retires.
      val nIncData = spark.read.parquet(cur).count()
      if (nIncData > 0) {
        val next = graft.storage.VersionedDir.next(fs, uri, "data_inc")
        // exact-row distinct rides the fold's own shuffle for free: a
        // crash-replayed append's duplicate rows heal HERE (bounding the
        // probe's raw-count cap inflation to one cadence), while
        // changed-text re-appends keep both rows (different sigs) per
        // the unique-id contract. No cap re-enforcement (probe applies
        // the exact corpus ∪ batch cap itself).
        spark.read.parquet(cur)
          .distinct()
          .repartitionByRange(math.max(1, p.bands * filesPerBand),
            col("band"), col("bucket"))
          .sortWithinPartitions("band", "bucket")
          .write.mode("overwrite")
          .options(graft.storage.Encryption.dirWriteOptions(spark, uri))
          .parquet(next)
        graft.storage.VersionedDir.commitGuarded(fs, uri, "data_inc", next,
          dataIncBefore, grace = 2)
      }
    }
    val sigsIncBefore = graft.storage.VersionedDir.liveListing(fs, uri, "sigs_inc")
    if (graft.storage.VersionedDir.hasDataFiles(sigsIncBefore)) {
      val cur = liveSigsIncPath(spark, uri)
      val nIncSigs = spark.read.parquet(cur).count()
      if (nIncSigs > 0) {
        val next = graft.storage.VersionedDir.next(fs, uri, "sigs_inc")
        spark.read.parquet(cur)
          .distinct()
          .repartitionByRange(
            math.max(1, math.ceil(nIncSigs / 250000.0).toInt), col("id"))
          .sortWithinPartitions("id")
          .write.mode("overwrite")
          .options(graft.storage.Encryption.dirWriteOptions(spark, uri))
          .parquet(next)
        graft.storage.VersionedDir.commitGuarded(fs, uri, "sigs_inc", next,
          sigsIncBefore, grace = 2)
      }
    }
  }

  /** Tier stats + major-compact advisory: base = live data + sigs
    * generations, inc = their live inc-tier generations. Listings
    * only, no data read — cheap enough for an operator poll loop. */
  def maintenanceAdvice(spark: SparkSession,
      uri: String): graft.storage.MaintenanceAdvice =
    graft.storage.MaintenanceAdvice.of(VFS(spark),
      Seq(liveDataPath(spark, uri), liveSigsPath(spark, uri)),
      Seq(liveDataIncPath(spark, uri), liveSigsIncPath(spark, uri)))

  /** The probe's base-tier rows served by POINT LOOKUP
    * ([[graft.storage.PointIndex]]) instead of a tier scan — the
    * steady-state serving shape: the base generation is hashed into
    * executor-resident maps ONCE per maintenance flip, and each probe
    * is O(batch keys) hash lookups, independent of tier size (the scan
    * model's cost tracked the tier — no pushdown vehicle prunes
    * uniformly-hashed probe keys; measured, BASELINE.md r18). The inc
    * leg stays a fresh probe-filtered scan: it changes per append and
    * is bounded by the minor-fold cadence.
    *
    * Returns the exact (band, bucket) matches — a strict subset of the
    * scan path's bucket-only filtered frame that every downstream
    * consumer (over-cap counts joined on (band, bucket), pair join on
    * (band, bucket)) treats identically. None → caller falls back to
    * the scan path (`graft.index.pointProbe=false`, non-(int,long,long)
    * tier schema, or no committed base generation).
    *
    * Same resolution order + race window as [[readDataAll]]: inc
    * FIRST, so a read racing a major's base-flip → inc-reset window
    * sees appended rows TWICE (healed by the pair distinct), never a
    * gap. */
  private def pointProbeRows(spark: SparkSession, uri: String,
      banded: DataFrame, maxProbeKeys: Int,
      lease: Option[graft.storage.PointIndex.Lease]): Option[DataFrame] = {
    if (!graft.storage.PointIndex.enabled(spark)) return None
    val fs = VFS(spark)
    val inc = liveDataIncPath(spark, uri)
    graft.storage.FlipHooks.at("dedup.read.betweenResolves")
    val basePath = liveDataPath(spark, uri)
    if (!fs.exists(basePath)) return None
    graft.storage.PointIndex.bucketRows(spark, s"$uri#data", basePath, banded,
        lease)
      .map { baseRows =>
        val incLive = fs.exists(inc) &&
          graft.storage.VersionedDir.hasDataFiles(fs.lsFilesRecursive(inc).toSet)
        if (!incLive) baseRows
        else {
          // the inc leg keeps the scan path's pruning contract: below
          // maxProbeKeys the probe buckets push as an isin literal
          // (footer-stat file/row-group pruning over the fold-sorted
          // inc files); above it, the broadcast semi-join
          val probeKeys = banded.select("bucket").distinct()
            .limit(maxProbeKeys + 1).collect().map(_.getLong(0))
          val incScan = spark.read.parquet(inc)
          val pruned =
            if (probeKeys.length <= maxProbeKeys)
              incScan.filter(col("bucket").isin(probeKeys: _*))
            else incScan.join(broadcast(banded.select("bucket").distinct()),
              Seq("bucket"), "left_semi")
          pruned.unionByName(baseRows)
        }
      }
  }

  /** The probe's signature fetch as point lookups on the base sigs
    * generation ([[graft.storage.PointIndex.sigRows]]): id-keyed hash
    * lookups instead of the whole-tier semi-join scan. Inc sigs (one
    * file per append, bounded by the fold cadence) keep the semi-join.
    * Same inc-first resolution order as [[readSigsAll]]. None → scan
    * fallback. */
  private def pointSigFetch(spark: SparkSession, uri: String,
      mids: DataFrame,
      lease: Option[graft.storage.PointIndex.Lease]): Option[DataFrame] = {
    if (!graft.storage.PointIndex.enabled(spark)) return None
    val fs = VFS(spark)
    val inc = liveSigsIncPath(spark, uri)
    val basePath = liveSigsPath(spark, uri)
    if (!fs.exists(basePath)) return None
    graft.storage.PointIndex.sigRows(spark, s"$uri#sigs", basePath, mids,
        lease)
      .map { baseSigs =>
        val incLive = fs.exists(inc) &&
          graft.storage.VersionedDir.hasDataFiles(fs.lsFilesRecursive(inc).toSet)
        if (!incLive) baseSigs
        else spark.read.parquet(inc)
          .join(broadcast(mids), Seq("id"), "left_semi")
          .unionByName(baseSigs)
      }
  }

  /** The candidate-pair stage of [[probe]], un-checkpointed — the
    * bucket-table scan with its pushdown is visible in THIS plan
    * (probe checkpoints it eagerly, which truncates lineage). Also the
    * plan-assertion seam for specs. */
  private[graft] def candidatePairs(banded: DataFrame, uri: String, p: Params,
      maxProbeKeys: Int): DataFrame =
    // no lease: the seam's plan stays lazy, so its point broadcasts
    // must outlive this call — the ContextCleaner reclaims them
    candidatePairsImpl(banded, uri, p, maxProbeKeys, materialize = false,
      lease = None)._1

  /** [[candidatePairs]] plus the materialized probed-rows handle the
    * caller must unpersist once the pairs are consumed. */
  private def candidatePairsImpl(banded: DataFrame, uri: String, p: Params,
      maxProbeKeys: Int, materialize: Boolean,
      lease: Option[graft.storage.PointIndex.Lease]): (DataFrame, Option[DataFrame]) = {
    val spark = banded.sparkSession
    val pruned0 = pointProbeRows(spark, uri, banded, maxProbeKeys, lease)
      .getOrElse {
      // scan fallback (`graft.index.pointProbe=false`, non-long ids, or
      // no committed base): probe keys pushed into the tier scan
      val probeKeys = banded.select("bucket").distinct()
        .limit(maxProbeKeys + 1).collect().map(_.getLong(0))
      val index = readDataAll(spark, uri)
      if (probeKeys.length <= maxProbeKeys) index.filter(col("bucket").isin(probeKeys: _*))
      else index.join(broadcast(banded.select("bucket").distinct()),
        Seq("bucket"), "left_semi")
    }
    // ONE tier pass per probe (r18): the probed-bucket rows feed BOTH
    // the over-cap group counts and the pair join — un-materialized,
    // each consumer re-scans the whole tier (the semi path's full
    // in-memory pass ran TWICE per streaming probe). The probed rows
    // are candidate-scale (each kept group is bucket-cap bounded,
    // over-cap residue bounded by appends since the last major).
    // persist(), not localCheckpoint: the CacheManager handle lets the
    // probe UNPERSIST it once the pair set materializes — a per-probe
    // checkpoint with no handle is exactly the accumulating-cached-RDD
    // shape the over-cap fix above removed. The plan-assertion seam
    // keeps the raw scan (materialize=false) so specs see the pushdown.
    val pruned = if (materialize)
      pruned0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else pruned0
    // The probe-time cap replicates the one-shot path's bucket cap
    // over corpus ∪ batch EXACTLY: a (band, bucket) group whose index
    // rows + batch rows exceed maxBucket emits no pairs (bucketedPairs
    // drops it whole), even though build's corpus-only cap kept it.
    // Both count frames are probe-scale (pruned buckets only), so the
    // per-group sizes land in one tiny broadcast join.
    // RAW row counts, deliberately: a countDistinct here would ship
    // the pruned rows' (band, bucket, id) combos through the shuffle
    // where raw counts ship only per-group partials — a measurable tax
    // on every saturated probe to guard against duplicate index rows.
    // Duplicates instead heal at the tiers: replayed streaming appends
    // dedup at the next minor fold (≤ compactEvery batches of
    // exposure), and a crashed major's cross-tier residue heals on the
    // compact re-run its abort message demands. In those windows an
    // inflated count can transiently suppress an at-cap bucket's pairs
    // — the conservative direction (missed dups, never false pairs).
    val idxCounts = pruned.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__ni"))
    val batchCounts = banded.groupBy("band", "bucket").agg(count(lit(1)).as("__nb"))
    // COLLECT the over-cap group set (bounded: over-cap groups among
    // the PROBED buckets only — strictly fewer rows than the banded
    // batch frame this probe already broadcasts) so the suppression is
    // counted off the same single agg job that builds the set, and
    // nothing stays pinned in executor storage afterwards: the r17
    // localCheckpoint variant accumulated one never-unpersisted cached
    // RDD per probe across a streaming/prober loop's app lifetime. The
    // one-shot path counts its cap drops (dedup.lsh_buckets_dropped);
    // this is the probe-side analogue, so a saturated probe is never
    // silent.
    val overCapPlan = idxCounts.join(batchCounts, Seq("band", "bucket"))
      .filter(col("__ni") + col("__nb") > p.maxBucket)
      .select("band", "bucket")
    val overCapRows = overCapPlan.collect()
    if (overCapRows.nonEmpty) {
      graft.core.Stats.counter(spark, "dedup_index.probe_groups_suppressed")
        .add(overCapRows.length.toLong)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dedup index probe: ${overCapRows.length} (band, bucket) group(s) " +
          s"over the ${p.maxBucket}-id cap emitted no pairs (corpus ∪ batch " +
          "density cap — exact parity with the one-shot path)")
    }
    // Candidate PAIRS on the narrow bucket rows — batch side broadcast,
    // no exchange below the join, the bucket table consumed map-side.
    // Pair-level dedup happens HERE (a pair surfaces once per shared
    // band), bounded by the bucket cap, so the sig fetch is
    // candidate-scale.
    val joined = pruned.join(
        broadcast(banded.select(col("id").as("__qid"),
          col("band").as("band"), col("bucket").as("bucket"))),
        Seq("band", "bucket"))
    val capped =
      if (overCapRows.isEmpty) joined // common case: no anti-join leg at all
      else joined.join(
        broadcast(spark.createDataFrame(
          java.util.Arrays.asList(overCapRows: _*), overCapPlan.schema)),
        Seq("band", "bucket"), "left_anti")
    (capped.filter(col("id") =!= col("__qid"))
      .select(col("__qid"), col("id").as("__mid"))
      .distinct(),
      if (materialize) Some(pruned) else None)
  }

  /** spec seam: the candidate-pair plan for a batch, un-checkpointed */
  private[graft] def candidatePairsFor(batch: DataFrame, idCol: String,
      textCol: String, uri: String, maxProbeKeys: Int = 1 << 15): DataFrame = {
    val p = readParams(batch.sparkSession, uri)
    candidatePairs(bandedRows(batch, idCol, textCol, p), uri, p, maxProbeKeys)
  }

  /** diagnostic seam (ScaleRehearsal): the distinct bucket keys a
    * batch would probe — the input to any pushdown-vehicle coverage
    * analysis. */
  private[graft] def probeBuckets(batch: DataFrame, idCol: String,
      textCol: String, uri: String): DataFrame = {
    val p = readParams(batch.sparkSession, uri)
    bandedRows(batch, idCol, textCol, p).select("bucket").distinct()
  }

  /** The batch minus docs near-duplicating the indexed corpus — the
    * steady-state ingest filter. Anti-join on the probe matches; batch
    * side work only. */
  def dropAgainstIndex(batch: DataFrame, idCol: String, textCol: String,
      uri: String, threshold: Double = 0.7): DataFrame = {
    val dups = probe(batch, idCol, textCol, uri, threshold)
      .select(col("id").as(idCol)).distinct()
    batch.join(dups, Seq(idCol), "left_anti")
  }
}
