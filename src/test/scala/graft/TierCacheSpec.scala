package graft

import graft.ops.DedupIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** Lifecycle of [[graft.storage.TierCache]] as seen through the dedup
  * index — the cache is only correct if every mutation route
  * (generation flip, in-place rebuild, opt-out) lands probes on the
  * right rows. */
class TierCacheSpec extends SparkSpec {
  import spark.implicits._

  /** Mutually DISSIMILAR docs (per-doc token vocabulary) so probes
    * match only deliberate near-copies, never corpus neighbors. */
  private def docText(salt: String, i: Int): String =
    s"$salt document $i " +
      (0 until 12).map(j => s"w${salt}${i}x$j").mkString(" ")

  private def mkCorpus(n: Int, salt: String) =
    (0 until n).map(i => (i.toLong, docText(salt, i))).toDF("doc_id", "text")

  private def matches(uri: String, batch: org.apache.spark.sql.DataFrame) =
    DedupIndex.probe(batch, "doc_id", "text", uri, threshold = 0.5)
      .select("id", "match_id").as[(Long, Long)].collect().toSet

  // the lifecycle tests pin the SCAN path explicitly: with the r19
  // point-probe default, DedupIndex.probe never consults TierCache —
  // unpinned, these tests would exercise PointIndex (which has its own
  // spec) and a TierCache flip/invalidate regression would pass CI
  // while the still-reachable fallback served stale rows
  private def withScanPath[T](f: => T): T = {
    spark.conf.set("graft.index.pointProbe", "false")
    try f finally spark.conf.unset("graft.index.pointProbe")
  }

  test("major compact flips the cached generation: probes track the new base") {
    withScanPath {
    val uri = TestSession.tmpDir("tiercache-flip")
    DedupIndex.build(mkCorpus(40, "alpha"), "doc_id", "text", uri)
    val nearDup = Seq((900L, docText("alpha", 7) + " zz")).toDF("doc_id", "text")
    val before = matches(uri, nearDup)
    assert(before.contains((900L, 7L)), before.toString)
    // append a doc the probe should ALSO match, fold it into the base
    DedupIndex.append(Seq((500L, docText("alpha", 7)))
      .toDF("doc_id", "text"), "doc_id", "text", uri)
    DedupIndex.compact(spark, uri)
    val after = matches(uri, nearDup)
    assert(after.contains((900L, 7L)) && after.contains((900L, 500L)),
      s"stale cached generation after major flip: $after")
    }
  }

  test("in-place rebuild invalidates the cached legacy generation") {
    withScanPath {
    val uri = TestSession.tmpDir("tiercache-rebuild")
    DedupIndex.build(mkCorpus(40, "alpha"), "doc_id", "text", uri)
    val probeAlpha = Seq((901L, docText("alpha", 3))).toDF("doc_id", "text")
    assert(matches(uri, probeAlpha).nonEmpty) // cache populated
    // rebuild at the SAME uri over a disjoint corpus: the legacy
    // generation paths are identical, so only explicit invalidation
    // keeps the probe off the pre-rebuild rows
    DedupIndex.build(mkCorpus(40, "omega"), "doc_id", "text", uri)
    assert(matches(uri, probeAlpha).isEmpty,
      "probe served pre-rebuild rows from a stale cached generation")
    val probeOmega = Seq((902L, docText("omega", 3))).toDF("doc_id", "text")
    assert(matches(uri, probeOmega).exists(_._2 == 3L))
    }
  }

  test("cache traffic is counted: misses on first touch, hits after, " +
    "refreshes on a flip") {
    // pin the SCAN path: with the default point probe the data tier is
    // served by PointIndex (its traffic has its own counters/spec) and
    // only the sigs slot would ride TierCache here
    spark.conf.set("graft.index.pointProbe", "false")
    try {
    val uri = TestSession.tmpDir("tiercache-counters")
    DedupIndex.build(mkCorpus(30, "alpha"), "doc_id", "text", uri)
    val probe = Seq((904L, docText("alpha", 5))).toDF("doc_id", "text")
    graft.core.Stats.reset()
    matches(uri, probe)
    val misses0 = graft.core.Stats.counterValue("tiercache.misses")
    assert(misses0 >= 2L, s"expected data+sigs slot misses, got $misses0")
    matches(uri, probe)
    assert(graft.core.Stats.counterValue("tiercache.hits") >= 2L)
    assert(graft.core.Stats.counterValue("tiercache.misses") == misses0,
      "steady-state probe re-registered a slot")
    // a major flips the base generations: both slots refresh, not miss
    DedupIndex.append(Seq((500L, docText("alpha", 7)))
      .toDF("doc_id", "text"), "doc_id", "text", uri)
    DedupIndex.compact(spark, uri)
    matches(uri, probe)
    assert(graft.core.Stats.counterValue("tiercache.refreshes") >= 2L,
      graft.core.Stats.countersSnapshot.toString)
    } finally spark.conf.unset("graft.index.pointProbe")
  }

  test("opt-out: cacheBase=false never registers a cached generation") {
    val uri = TestSession.tmpDir("tiercache-off")
    graft.storage.TierCache.clear()
    spark.conf.set("graft.index.cacheBase", "false")
    try {
      DedupIndex.build(mkCorpus(30, "alpha"), "doc_id", "text", uri)
      val probe = Seq((903L, docText("alpha", 5))).toDF("doc_id", "text")
      assert(matches(uri, probe).exists(_._2 == 5L))
      val plan = Shim.plannedPhysical(
        DedupIndex.candidatePairsFor(probe, "doc_id", "text", uri))
      val mem = plan.collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
      }
      assert(mem.isEmpty, s"cache registered despite opt-out:\n$plan")
    } finally spark.conf.unset("graft.index.cacheBase")
  }
}
