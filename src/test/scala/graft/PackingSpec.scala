package graft

import org.apache.spark.sql.functions._
import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val Budget = 100L

  private lazy val docs = (0 until 500).map { i =>
    // token counts 1..80 plus a few oversize (150) docs
    val n = if (i % 100 == 99) 150 else 1 + (i * 37) % 80
    (i.toLong, Seq.fill(n)("w").mkString(" "))
  }.toDF("doc_id", "text")

  private lazy val packed = Packing.packDocs(docs, "doc_id", "text", Budget)
    .localCheckpoint(true)

  test("every doc packed exactly once") {
    assert(packed.count() == 500)
    assert(packed.select("doc_id").distinct().count() == 500)
  }

  test("no pack exceeds the budget (except flagged oversize singletons)") {
    val over = Packing.packStats(packed, Budget)
      .filter(col("tokens") > Budget && !col("oversize"))
    assert(over.count() == 0, over.collect().mkString(","))
    // oversize docs are alone in their packs and flagged
    val oversizePacks = Packing.packStats(packed, Budget).filter(col("oversize"))
    assert(oversizePacks.count() == 5)
    assert(oversizePacks.filter(col("docs") =!= 1).count() == 0)
  }

  test("token counts are preserved") {
    val totalIn = docs.select(sum(graft.ops.TextAnalysis.tokenCount(col("text"))))
      .as[Long].collect()(0)
    val totalOut = packed.select(sum("tokens")).as[Long].collect()(0)
    assert(totalIn == totalOut)
  }

  test("packing efficiency: within 1.25x of the global lower bound + partitions") {
    val stats = Packing.packStats(packed, Budget)
    val regular = stats.filter(!col("oversize"))
    val nPacks = regular.count()
    val tokens = regular.agg(sum("tokens")).as[Long].collect()(0)
    val lower = (tokens + Budget - 1) / Budget
    val nPart = spark.sessionState.conf.numShufflePartitions
    assert(nPacks <= (lower * 5) / 4 + nPart,
      s"$nPacks packs vs lower bound $lower with $nPart partitions")
  }

  test("pack_pos is a dense 0..n-1 sequence per pack") {
    val bad = packed.groupBy("pack_id").agg(
        count(lit(1)).as("n"), min("pack_pos").as("lo"), max("pack_pos").as("hi"),
        countDistinct("pack_pos").as("d"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1 || col("d") =!= col("n"))
    assert(bad.count() == 0, bad.collect().mkString(","))
  }

  test("pack ids are globally unique across partitions") {
    // rows stay in their packing partition (no shuffle after
    // mapPartitions), so spark_partition_id() observes it: no pack may
    // span two physical partitions, and the test is only meaningful if
    // several partitions actually packed
    val parts = packed.select(col("pack_id"),
      org.apache.spark.sql.functions.spark_partition_id().as("p"))
    assert(parts.select("p").distinct().count() > 1,
      "fixture degenerated to one partition — test would be vacuous")
    val mixed = parts.groupBy("pack_id").agg(countDistinct(col("p")).as("nparts"))
      .filter(col("nparts") > 1)
    assert(mixed.count() == 0, mixed.collect().mkString(","))
    // and the embedded partition field matches the physical partition
    val mismatch = parts.filter(org.apache.spark.sql.functions.shiftright(
      col("pack_id"), 40) =!= col("p"))
    assert(mismatch.count() == 0)
  }

  test("empty docs are excluded, custom token counter works") {
    val withEmpty = Seq((1L, "a b c"), (2L, "   "), (3L, "d e")).toDF("doc_id", "text")
    val p = Packing.packDocs(withEmpty, "doc_id", "text", 10L)
    assert(p.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    val custom = Packing.packDocs(withEmpty, "doc_id",
      graft.ops.TextAnalysis.regexTokenCount(col("text")), 10L, 4)
    assert(custom.count() == 2)
  }

  test("packedSequences reconstructs every doc in pack_pos order") {
    val seqs = Packing.packedSequences(docs, "doc_id", "text", Budget,
      partitions = 8, sep = " | ")
    // token conservation through materialization
    val totalIn = docs.select(sum(graft.ops.TextAnalysis.tokenCount(col("text"))))
      .as[Long].collect()(0)
    assert(seqs.agg(sum("tokens")).as[Long].collect()(0) == totalIn)
    // each sequence's own whitespace token count matches the sum of its
    // members (the "w"-word fixture makes this exact)
    val bad = seqs.filter(
      graft.ops.TextAnalysis.tokenCount(regexp_replace(col("text"), "\\|", "w"))
        =!= col("tokens") + col("n_docs") - 1)
    assert(bad.count() == 0)
  }

  test("deterministic for a fixed partition count") {
    val a = Packing.packDocs(docs, "doc_id", "text", Budget, partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    val b = Packing.packDocs(docs, "doc_id", "text", Budget, partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    assert(a == b)
  }

  test("packedTokenIds: flattened ids conserve counts and respect the budget") {
    import spark.implicits._
    val packs = Packing.packedTokenIds(docs, "doc_id", "text", Budget)
    val rows = packs.select($"pack_id", $"n_docs", $"tokens", $"input_ids")
      .as[(Long, Long, Long, Array[Int])].collect()
    assert(rows.nonEmpty)
    // per-pack: flattened length == claimed tokens; budget respected
    // except oversize singletons
    for ((_, nDocs, toks, ids) <- rows) {
      assert(ids.length.toLong == toks)
      if (nDocs > 1) assert(toks <= Budget)
    }
    // conservation: total ids == sum of per-doc BPE counts
    val expect = graft.ops.TextAnalysis.bpeTokenIds(
        docs.select($"doc_id", $"text").as[(Long, String)])
      .collect().map(_._2.length.toLong).sum
    assert(rows.map(_._3).sum == expect)
  }
}
