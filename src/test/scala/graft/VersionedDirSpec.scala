package graft

import graft.storage.{VFS, VersionedDir}
import org.apache.spark.sql.functions._

/** The concurrent-maintenance contract of [[VersionedDir]]: a reader
  * resolving at ANY point relative to a compaction flip sees a
  * complete committed generation, and an already-resolved reader
  * survives one flip (grace generation). Single-JVM interleaving —
  * resolve, then flip, then read — is exactly the race a distributed
  * probe hits when a compactor commits between its plan and its scan. */
class VersionedDirSpec extends SparkSpec {
  import spark.implicits._

  private def fs = VFS(spark)

  // VFS.ls returns scheme-qualified paths (file:/...), so resolved
  // paths are compared by suffix
  private def resolvesTo(uri: String, suffix: String): Boolean =
    VersionedDir.resolve(fs, uri, "data").endsWith(suffix)

  test("resolve mid-compact: before marker old, after marker new, " +
    "crashed uncommitted dirs never resolve") {
    val uri = TestSession.tmpDir("vdir")
    val fsv = fs
    // generation 0 = legacy unversioned dir
    fsv.writeString(s"$uri/data/part-0.txt", "gen0")
    assert(resolvesTo(uri, "/data"))
    // a compactor starts: next() allocates v1, write is IN FLIGHT
    val v1 = VersionedDir.next(fsv, uri, "data")
    assert(v1.endsWith("/data_v1"))
    fsv.writeString(s"$v1/part-0.txt", "gen1")
    // no marker yet -> readers still resolve the OLD generation
    assert(resolvesTo(uri, "/data"))
    // marker lands -> readers flip atomically to the new generation
    VersionedDir.commit(fsv, uri, "data", v1)
    assert(resolvesTo(uri, "/data_v1"))
    // legacy gen 0 survives as the grace generation after this flip
    assert(fsv.exists(s"$uri/data"), "grace generation must survive")
    // a CRASHED uncommitted attempt (v2 written, marker never written)
    // must not resolve
    val v2 = VersionedDir.next(fsv, uri, "data")
    fsv.writeString(s"$v2/part-0.txt", "gen2-crashed")
    assert(resolvesTo(uri, "/data_v1"))
    // the next successful commit retires BOTH the crashed attempt and
    // the old grace dir, keeping v1 as the new grace generation
    val v3 = VersionedDir.next(fsv, uri, "data")
    fsv.writeString(s"$v3/part-0.txt", "gen3")
    VersionedDir.commit(fsv, uri, "data", v3)
    assert(resolvesTo(uri, "/data_v3"))
    assert(!fsv.exists(v2), "crashed attempt must be retired")
    assert(!fsv.exists(s"$uri/data"), "older grace dirs must be retired")
    assert(fsv.exists(v1), "previous live generation is the grace copy")
  }

  test("next() reuses a crashed attempt's number range safely") {
    val uri = TestSession.tmpDir("vdir-next")
    val fsv = fs
    fsv.writeString(s"$uri/data/f.txt", "gen0")
    val a = VersionedDir.next(fsv, uri, "data")
    fsv.writeString(s"$a/partial.txt", "crashed half-write")
    // a second maintenance run allocates ABOVE the crashed dir and
    // clears any leftover at its own target path
    val b = VersionedDir.next(fsv, uri, "data")
    assert(a.endsWith("/data_v1") && b.endsWith("/data_v2"))
    val b2 = VersionedDir.next(fsv, uri, "data")
    assert(b2.endsWith("/data_v2"), "same target until something commits")
  }

  test("grace = 2 keeps TWO committed generations across a flip — the " +
    "frequently-flipped inc-tier contract") {
    val uri = TestSession.tmpDir("vdir-grace2")
    val fsv = fs
    fsv.writeString(s"$uri/data/f.txt", "gen0")
    def flip(content: String, grace: Int): String = {
      val v = VersionedDir.next(fsv, uri, "data")
      fsv.writeString(s"$v/f.txt", content)
      VersionedDir.commit(fsv, uri, "data", v, grace)
      v
    }
    val v1 = flip("gen1", 2)
    val v2 = flip("gen2", 2)
    // after the second flip BOTH prior committed generations survive: a
    // probe that resolved gen0 just before flip 1 can still be scanning
    // through flip 2 (the exposure ADVICE r16 flagged for in-loop folds)
    assert(fsv.exists(s"$uri/data") && fsv.exists(v1) && fsv.exists(v2))
    val v3 = flip("gen3", 2)
    // the window slides: gen0 retires (three flips old), v1+v2 survive
    assert(!fsv.exists(s"$uri/data"), "gen0 must retire after grace window")
    assert(fsv.exists(v1) && fsv.exists(v2) && fsv.exists(v3))
    assert(VersionedDir.resolve(fsv, uri, "data").endsWith("/data_v3"))
    // crashed uncommitted attempts never count toward the grace window
    val crashed = VersionedDir.next(fsv, uri, "data")
    fsv.writeString(s"$crashed/f.txt", "crashed")
    val v5 = flip("gen5", 2)
    assert(!fsv.exists(crashed), "crashed attempt must be retired")
    assert(fsv.exists(v2) && fsv.exists(v3) && fsv.exists(v5))
    assert(!fsv.exists(v1))
  }

  test("dedup index probe interleaved with compact: no errors, no lost rows") {
    val uri = TestSession.tmpDir("vdir-probe")
    // texts pairwise-DISSIMILAR (distinct token sets) so no LSH bucket
    // approaches its cap: a near-identical corpus would drop its
    // buckets by design and starve the probe of self-hits
    def txt(i: Long) = (0 until 12).map(j => s"tok${i}q$j").mkString(" ")
    val docs = (0L until 60L).map(i => (i, txt(i))).toDF("doc_id", "text")
    graft.ops.DedupIndex.build(docs, "doc_id", "text", uri)
    // appended batches make compact non-trivial
    val extra = (100L until 130L).map(i => (i, txt(i))).toDF("doc_id", "text")
    graft.ops.DedupIndex.append(extra, "doc_id", "text", uri)
    // re-idd copies of indexed docs (the probe excludes equal-id
    // self-pairs): each batch doc must hit exactly its source doc
    val batch = docs.limit(20)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    def probeRows() = graft.ops.DedupIndex
      .probe(batch, "doc_id", "text", uri, threshold = 0.99)
    // reader A plans (and resolves the live generation) BEFORE the flip
    val planned = probeRows()
    val before = planned.count()
    assert(before >= 20L, s"self-hits expected, got $before")
    // compactor flips generations underneath reader A
    graft.ops.DedupIndex.compact(spark, uri)
    // reader A's already-planned frame re-executes against the path it
    // resolved pre-flip — the grace generation keeps it alive
    assert(planned.count() == before, "pre-flip reader lost rows")
    // reader B resolves post-flip and sees identical results
    assert(probeRows().count() == before, "post-flip probe diverged")
    // a second compact with nothing new appended is a no-op that still
    // leaves a resolvable committed generation
    graft.ops.DedupIndex.compact(spark, uri)
    assert(probeRows().count() == before)
  }

  test("append during compact: guarded flip ABORTS loudly, live " +
    "generation unchanged, retry after quiesce succeeds") {
    val uri = TestSession.tmpDir("vdir-guard")
    val fsv = fs
    fsv.writeString(s"$uri/data/part-0.txt", "r0")
    // maintenance pass: snapshot the live listing, write the new gen
    val before = VersionedDir.liveListing(fsv, uri, "data")
    val v1 = VersionedDir.next(fsv, uri, "data")
    fsv.writeString(s"$v1/part-0.txt", "compacted r0")
    // a concurrent APPEND lands in the live dir mid-compact — its rows
    // are not in v1; an unguarded commit would silently drop them when
    // the old generation retires
    fsv.writeString(s"$uri/data/part-appended.txt", "r1 appended")
    val err = intercept[RuntimeException] {
      VersionedDir.commitGuarded(fsv, uri, "data", v1, before)
    }
    assert(err.getMessage.contains("quiesce"), s"loud remediation: $err")
    // abort left the OLD generation live (appended file intact) and
    // retired the attempt dir
    assert(VersionedDir.resolve(fsv, uri, "data").endsWith("/data"))
    assert(fsv.exists(s"$uri/data/part-appended.txt"))
    assert(!fsv.exists(v1), "aborted attempt dir must be deleted")
    // retry with appends quiesced: snapshot now INCLUDES the appended
    // file, so the flip commits
    val before2 = VersionedDir.liveListing(fsv, uri, "data")
    // the abort deleted v1, so next() hands out v1 again — fine: only
    // committed generations matter to readers
    val v2 = VersionedDir.next(fsv, uri, "data")
    fsv.writeString(s"$v2/part-0.txt", "compacted r0+r1")
    VersionedDir.commitGuarded(fsv, uri, "data", v2, before2)
    val live = VersionedDir.resolve(fsv, uri, "data")
    assert(live.endsWith(v2.substring(v2.lastIndexOf('/'))) && !live.endsWith("/data"))
  }

  test("IVF cells: a REAL append between the maintenance listing and " +
    "the guarded flip aborts; quiesced compactIvfIndex keeps every row") {
    // compactIvfIndex's internal listing→rewrite→commit window is not
    // injectable without hooks, so this drives the same guard with the
    // direct-VersionedDir choreography OVER THE REAL IVF LAYOUT: the
    // load-bearing assumptions checked here are that appendToIvfIndex's
    // files (nested under centroid_id= partition dirs) show up in the
    // RECURSIVE live listing delta, that the guard keys on base name
    // "cells", and that the quiesced real compact then folds everything.
    val uri = TestSession.tmpDir("vdir-ivfguard")
    def vec(i: Long): Seq[Float] =
      Seq.tabulate(8)(j => ((i * 7 + j) % 13).toFloat / 13.0f)
    val base = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    graft.ops.Similarity.buildIvfIndex(base, "vec_id", "embedding", uri,
      nCentroids = 4)
    // appends land in the INC tier (r16 layout), so the single-writer
    // guard's basis is the inc listing: snapshot it, let a REAL append
    // land (nested centroid_id= files — the recursive listing must see
    // them), then attempt a fold committed against the stale snapshot
    val before = VersionedDir.liveListing(fs, uri, "cells_inc")
    graft.ops.Similarity.appendToIvfIndex(
      (100L until 110L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", uri)
    assert(VersionedDir.liveListing(fs, uri, "cells_inc") != before,
      "appended cell files must be visible to the recursive listing")
    val next = VersionedDir.next(fs, uri, "cells_inc")
    fs.writeString(s"$next/part-0.parquet", "fold without the append")
    val err = intercept[RuntimeException] {
      VersionedDir.commitGuarded(fs, uri, "cells_inc", next, before)
    }
    assert(err.getMessage.contains("quiesce"), s"loud remediation: $err")
    // abort left the appended rows live; the QUIESCED real verbs then
    // work: minor fold flips the inc tier only, major folds everything
    graft.ops.Similarity.minorCompactIvfIndex(spark, uri)
    assert(graft.ops.Similarity.cellsIncPath(spark, uri).contains("_v"))
    assert(graft.ops.Similarity.readCellsAll(spark, uri).count() == 50L)
    graft.ops.Similarity.compactIvfIndex(spark, uri)
    val live = graft.ops.Similarity.cellsPath(spark, uri)
    assert(live.contains("_v"), s"expected a flipped base generation: $live")
    val rows = spark.read.parquet(live).count()
    assert(rows == 50L, s"compacted cells lost rows: $rows")
  }
}
