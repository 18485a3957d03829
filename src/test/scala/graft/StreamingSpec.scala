package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed agg matches the batch equivalent") {
    // stage a small parquet dir from sf0.001 events (ts normalized)
    val ev = EventStreams.normalizeEventTs(
        spark.read.parquet(s"$sf/events.parquet"))
      .select("ts", "event_type", "value")
    val dir = TestSession.tmpDir("stream-src")
    ev.write.mode("overwrite").parquet(dir)

    val stream = EventStreams.windowedAgg(
      EventStreams.readEvents(spark, spark.read.parquet(dir).schema, dir),
      watermark = "1 hour", windowLen = "1 hour")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("ev_out").start()
    try { q.processAllAvailable() } finally { q.stop() }

    // append mode only emits windows the watermark has passed; compare
    // those against the batch result restricted to the same windows
    val got = spark.table("ev_out")
      .select($"window_start", $"event_type", $"n", $"total_value")
    val batch = EventStreams.windowedAggBatch(spark.read.parquet(dir), "1 hour")
    val gotSet = got.as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batchSet = batch.as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(gotSet.nonEmpty)
    assert(gotSet.subsetOf(batchSet))
    // every emitted (closed) window agrees exactly with batch
  }

  test("streaming dedup: planted duplicates collapse across micro-batches") {
    val ev = EventStreams.normalizeEventTs(
        spark.read.parquet(s"$sf/events.parquet"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    // double the stream: every event appears twice, in DIFFERENT files
    // so duplicates cross micro-batch boundaries (state must carry)
    val dir = TestSession.tmpDir("stream-dedup-src")
    ev.repartition(2).write.mode("overwrite").parquet(dir)
    ev.repartition(3).write.mode("append").parquet(dir)

    val deduped = EventStreams.dedupStream(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", "1").parquet(dir), // one file per batch
      keyCols = Seq("event_id"), watermark = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val got = spark.table("dedup_out")
    assert(got.count() == ev.count(), "each planted duplicate must collapse to one")
    assert(got.select("event_id").distinct().count() == ev.count())
  }

  test("streaming array sink: batches land as MVCC fragments, replay is idempotent") {
    import graft.storage.ArrayTable
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val uri = TestSession.tmpDir("arrsink")
    ArrayTable.create(spark, uri,
      graft.core.ArraySchema.infer(
        Seq((0L, 0.0)).toDF("x", "v").schema, Seq("x")))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val q = EventStreams.writeArrayStream(
      in.toDF().toDF("x", "v"), uri, TestSession.tmpDir("arrsink-ckpt"))
    try {
      in.addData((1L, 10.0), (2L, 20.0))
      q.processAllAvailable()
      in.addData((3L, 30.0))
      q.processAllAvailable()
      assert(ArrayTable.read(spark, uri).orderBy("x").as[(Long, Double)].collect().toSeq ==
        Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
      // one fragment per micro-batch, at the batch-id timestamp
      assert(ArrayTable.fragments(spark, uri).map(_.ts).sorted == Seq(0L, 1L))
      // a replayed batch is skipped, not duplicated
      assert(!EventStreams.commitStreamBatch(
        Seq((1L, 10.0), (2L, 20.0)).toDF("x", "v"), uri, 0L))
      assert(ArrayTable.fragments(spark, uri).size == 2)
      // MVCC time travel sees only the first batch at t<=0
      assert(ArrayTable.read(spark, uri, at = Some((0L, 0L))).count() == 2)
    } finally { q.stop() }
  }

  test("streaming ingest keeps profiling sidecars current incrementally") {
    import graft.storage.ArrayTable
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val uri = TestSession.tmpDir("arrcms")
    ArrayTable.create(spark, uri,
      graft.core.ArraySchema.infer(
        Seq((0L, 0L)).toDF("x", "v").schema, Seq("x")))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = EventStreams.writeArrayStream(
      in.toDF().toDF("x", "v"), uri, TestSession.tmpDir("arrcms-ckpt"))
    try {
      in.addData((1L, 7L), (2L, 7L))
      q.processAllAvailable()
      // sketch after batch 0: only that fragment is sketched
      assert(graft.ops.Profile.writeFragmentCms(spark, uri, "v",
        depth = 4, width = 256) == 1)
      in.addData((3L, 7L), (4L, 9L))
      q.processAllAvailable()
      // the incremental call sketches exactly the NEW fragment
      assert(graft.ops.Profile.writeFragmentCms(spark, uri, "v",
        depth = 4, width = 256) == 1)
      val est = graft.ops.Profile.cmsEstimates(spark, uri, "v",
        Seq(7L, 9L).toDF("v"), "v").as[(Long, Long)].collect().toMap
      assert(est(7L) >= 3L && est(9L) >= 1L, est)
    } finally { q.stop() }
  }

  test("array-table fragments feed a continuous stream") {
    import graft.storage.ArrayTable
    val uri = TestSession.tmpDir("arrstream")
    ArrayTable.ingest(spark, Seq((1L, 10.0)).toDF("x", "v"), uri,
      Seq("x"), tsOpt = Some(100L), overwrite = true)
    val stream = EventStreams.readArrayStream(spark, uri)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("arr_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("arr_out").count() == 1)
      // a new fragment lands in the stream
      ArrayTable.write(spark, Seq((2L, 20.0), (3L, 30.0)).toDF("x", "v"), uri, Some(200L))
      q.processAllAvailable()
      assert(spark.table("arr_out").count() == 3)
    } finally { q.stop() }
  }

  test("sessionization with mapGroupsWithState") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS())
    val q = sessions.writeStream.outputMode("update")
      .format("memory").queryName("sess_out").start()
    try {
      input.addData(
        EventStreams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 1.5),
        EventStreams.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 7L, "click", 2.5),
        EventStreams.Event(3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), 9L, "view", 1.0))
      // ProcessingTimeTimeout keeps scheduling batches, so
      // processAllAvailable never settles — poll with a deadline instead
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("sess_out").count() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
    } finally { q.stop() }
    val out = spark.table("sess_out").as[EventStreams.SessionUpdate].collect()
    val u7 = out.filter(_.user_id == 7L).maxBy(_.n_events)
    assert(u7.n_events == 2L && math.abs(u7.total_value - 4.0) < 1e-9)
  }

  test("streaming near-dedup: cross-batch near-dups dropped via the index") {
    import graft.storage.ArrayTable
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val indexUri = TestSession.tmpDir("stream-nd-index")
    val sinkUri = TestSession.tmpDir("stream-nd-sink")
    // start from an EMPTY corpus: index over zero docs, empty sink array
    val docSchema = Seq((0L, "")).toDF("doc_id", "text").schema
    graft.ops.DedupIndex.build(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        docSchema), "doc_id", "text", indexUri)
    ArrayTable.create(spark, sinkUri,
      graft.core.ArraySchema.infer(docSchema, Seq("doc_id"))
        .copy(allowsDuplicates = true))
    // genuinely distinct bodies (pairwise Jaccard ~0): deterministic
    // pseudo-words seeded by the doc number
    def doc(i: Long) = (0 until 24).map { j =>
      val h = (i * 2654435761L + j * 40503L) & 0xffffffL
      java.lang.Long.toString(h, 26)
    }.mkString(" ")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.nearDedupStream(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", indexUri, sinkUri, TestSession.tmpDir("stream-nd-ckpt"),
      threshold = 0.6)
    try {
      // batch 0: three distinct docs, plus an INTERNAL near-dup of doc 1
      in.addData((1L, doc(1)), (2L, doc(2)), (3L, doc(3)), (4L, doc(1) + " x"))
      q.processAllAvailable()
      // batch 1: near-dup of doc 2 (cross-batch, must be dropped via the
      // index), plus a genuinely new doc
      in.addData((5L, doc(2) + " y"), (6L, doc(600)))
      q.processAllAvailable()
      val kept = ArrayTable.read(spark, sinkUri).select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 3L, 6L), s"got $kept")
      // index covers every survivor: re-probing any survivor text as a
      // new doc id matches it
      val reprobe = graft.ops.DedupIndex.probe(
        Seq((99L, doc(600) + " z")).toDF("doc_id", "text"),
        "doc_id", "text", indexUri, threshold = 0.6)
      assert(reprobe.collect().exists(_.getLong(1) == 6L))
      // bounded state: the stream's only state is the index, and it
      // grows with SURVIVORS (one sig row each, across the base + inc
      // tiers), never batches x corpus
      assert(graft.ops.DedupIndex.readSigsAll(spark, indexUri).count() == 4L,
        "index state must be one sig row per survivor")
    } finally { q.stop() }
  }

  test("streaming exact-dedup state is bounded by the watermark horizon") {
    // dropDuplicatesWithinWatermark evicts keys older than the horizon;
    // on an infinite stream the state must track the HORIZON (~2
    // batches here), not every key ever seen — the contract that makes
    // the operator runnable forever
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = EventStreams.dedupStream(
      in.toDF().toDF("event_id", "ts"), keyCols = Seq("event_id"),
      tsCol = "ts", watermark = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_bounded").start()
    try {
      val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
      (0 until 20).foreach { b =>
        in.addData((0 until 1000).map(i =>
          ((b * 1000 + i).toLong,
            new java.sql.Timestamp(base + b * 3600L * 1000))): _*)
        q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4000,
        s"dedup state grew with the stream, not the horizon: $stateRows " +
          "rows held after 20k keys across 20 hours")
      assert(spark.table("dedup_bounded").count() == 20000)
    } finally q.stop()
  }

  test("streaming near-dedup: IN-LOOP compaction keeps results identical " +
    "and actually flips a generation, no stop/restart") {
    import graft.storage.ArrayTable
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val indexUri = TestSession.tmpDir("stream-ndc-index")
    val sinkUri = TestSession.tmpDir("stream-ndc-sink")
    val docSchema = Seq((0L, "")).toDF("doc_id", "text").schema
    graft.ops.DedupIndex.build(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        docSchema), "doc_id", "text", indexUri)
    ArrayTable.create(spark, sinkUri,
      graft.core.ArraySchema.infer(docSchema, Seq("doc_id"))
        .copy(allowsDuplicates = true))
    def doc(i: Long) = (0 until 24).map { j =>
      java.lang.Long.toString((i * 2654435761L + j * 40503L) & 0xffffffL, 26)
    }.mkString(" ")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    // cadence 2: compaction fires INSIDE foreachBatch at batches 2 and 4
    // while the query keeps running — the external recipe's stop/compact/
    // restart never happens
    val q = EventStreams.nearDedupStream(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", indexUri, sinkUri, TestSession.tmpDir("stream-ndc-ckpt"),
      threshold = 0.6, compactEvery = 2)
    try {
      in.addData((1L, doc(1)), (2L, doc(2))); q.processAllAvailable()
      in.addData((3L, doc(3)), (4L, doc(1) + " x")); q.processAllAvailable() // 4 dups 1
      in.addData((5L, doc(5))); q.processAllAvailable()      // batch 2 -> compact
      in.addData((6L, doc(2) + " y"), (7L, doc(7))); q.processAllAvailable() // 6 dups 2
      in.addData((8L, doc(8))); q.processAllAvailable()      // batch 4 -> compact
      val kept = ArrayTable.read(spark, sinkUri).select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 3L, 5L, 7L, 8L), s"got $kept")
      // the in-loop MINOR fold flipped generations on the INC tier —
      // the tier appends land in — while the base tables stayed put
      // (bounded maintenance never rewrites the base corpus)
      val dataIncLive = graft.ops.DedupIndex.liveDataIncPath(spark, indexUri)
      val sigsIncLive = graft.ops.DedupIndex.liveSigsIncPath(spark, indexUri)
      assert(dataIncLive.contains("_v") && sigsIncLive.contains("_v"),
        s"expected folded inc generations, got $dataIncLive / $sigsIncLive")
      assert(!graft.ops.DedupIndex.liveDataPath(spark, indexUri).contains("_v"),
        "minor folds must not rewrite the base generation")
      // post-fold state: exactly one sig row per survivor across the
      // tiers, and the index still matches everything it indexed
      assert(graft.ops.DedupIndex.readSigsAll(spark, indexUri).count()
        == kept.size.toLong)
      val reprobe = graft.ops.DedupIndex.probe(
        Seq((99L, doc(7) + " z")).toDF("doc_id", "text"),
        "doc_id", "text", indexUri, threshold = 0.6)
      assert(reprobe.collect().exists(_.getLong(1) == 7L))
    } finally { q.stop() }
  }

  test("streaming semantic dedup: cross-batch embedding dups dropped via the IVF index") {
    import graft.storage.ArrayTable
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ivfUri = TestSession.tmpDir("stream-sem-ivf")
    val sinkUri = TestSession.tmpDir("stream-sem-sink")
    def vec(i: Long): Array[Float] =
      Array.tabulate(16)(j => math.sin(i * 13 + j * 7).toFloat)
    // seed corpus: vectors 0..9 indexed and committed
    val seed = (0L until 10L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    graft.ops.Similarity.buildIvfIndex(seed, "vec_id", "embedding", ivfUri,
      nCentroids = 4, lloydSteps = 1)
    ArrayTable.create(spark, sinkUri,
      graft.core.ArraySchema.infer(seed.schema, Seq("vec_id"))
        .copy(allowsDuplicates = true))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.semanticDedupStream(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      ivfUri, sinkUri, TestSession.tmpDir("stream-sem-ckpt"), minCosine = 0.999)
    try {
      // batch 0: dup of seed vec 3 (dropped), fresh 100, internal dup
      // pair (101, 102) -> min id 101 survives
      in.addData((90L, vec(3)), (100L, vec(100)), (101L, vec(101)), (102L, vec(101)))
      q.processAllAvailable()
      // batch 1: dup of batch-0 survivor 100 (cross-batch, via index),
      // plus fresh 200
      in.addData((150L, vec(100)), (200L, vec(200)))
      q.processAllAvailable()
      val kept = ArrayTable.read(spark, sinkUri).select("vec_id")
        .as[Long].collect().toSet
      assert(kept == Set(100L, 101L, 200L), s"got $kept")
      // all-duplicate batch commits empty and doesn't crash the tiny trainer
      in.addData((300L, vec(200)))
      q.processAllAvailable()
      assert(ArrayTable.read(spark, sinkUri).count() == 3L)
    } finally { q.stop() }
  }

  test("streaming search-index ingest: probes equal inline at every step") {
    import graft.storage.ArrayTable
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val indexUri = TestSession.tmpDir("stream-bm25-index")
    val sinkUri = TestSession.tmpDir("stream-bm25-sink")
    val docSchema = Seq((0L, "")).toDF("doc_id", "text").schema
    graft.ops.Search.buildIndex(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        docSchema), "doc_id", "text", indexUri, buckets = 8)
    ArrayTable.create(spark, sinkUri,
      graft.core.ArraySchema.infer(docSchema, Seq("doc_id"))
        .copy(allowsDuplicates = true))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    // cadence 2: the BOUNDED minor fold (Search.minorCompactIndex)
    // fires INSIDE foreachBatch at batch 2 while the query keeps
    // running — mirroring the dedup streams' in-loop maintenance test
    val q = EventStreams.searchIndexStream(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", indexUri, sinkUri, TestSession.tmpDir("stream-bm25-ckpt"),
      compactEvery = 2)
    val queries = Seq((0L, "cats sleep warm")).toDF("qid", "qtext")
    val cols = Seq($"query_id", $"doc_id", $"score", $"rank")
    def same(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.select(cols: _*).exceptAll(y.select(cols: _*)).count() == 0L &&
        y.select(cols: _*).exceptAll(x.select(cols: _*)).count() == 0L
    try {
      in.addData((1L, "cats sleep on warm windowsills"), (2L, "dogs chase the mail"))
      q.processAllAvailable()
      in.addData((3L, "warm cats sleep all day"), (4L, "spark jobs shuffle data"))
      q.processAllAvailable()
      in.addData((5L, "a warm cat naps"), (6L, "mail arrives late"))
      q.processAllAvailable() // batch 2 -> in-loop minor fold
      // the fold ran in-loop: a fold- dir subsumed the pending batches
      val incTags = graft.storage.VFS(spark).ls(s"$indexUri/postings_inc")
        .map(p => p.substring(p.lastIndexOf('/') + 1))
      assert(incTags.exists(_.startsWith("fold-")),
        s"cadence-2 stream never minor-folded: $incTags")
      val corpus = ArrayTable.read(spark, sinkUri).select("doc_id", "text")
      val inline = graft.ops.Search.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 4)
      val probed = graft.ops.Search.bm25IndexTopK(spark, indexUri,
        queries, "qid", "qtext", k = 4)
      assert(probed.count() > 0)
      assert(same(probed, inline),
        "streaming-maintained index must score exactly like inline over the sink")
      // maintenance compact keeps equality
      graft.ops.Search.compactIndex(spark, indexUri)
      assert(same(graft.ops.Search.bm25IndexTopK(spark, indexUri,
        queries, "qid", "qtext", k = 4), inline))
    } finally { q.stop() }
  }
}
