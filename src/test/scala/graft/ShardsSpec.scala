package graft

import graft.ops.Shards
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"text $i", (i % 7) + 1L))
      .toDF("doc_id", "text", "n_tokens")

  test("assignShards: deterministic, partition-independent, dense pos") {
    val base = docs(1000)
    val a = Shards.assignShards(base, "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)]
      .collect().sortBy(_._1).toSeq
    val b = Shards.assignShards(base.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)]
      .collect().sortBy(_._1).toSeq
    assert(a == b, "assignment must not depend on input partitioning")
    // positions are dense 0..n-1 within every shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (0L until rows.size).toSeq)
    }
    // binomial balance: mean 125, sd ~10.8; 4 sd is a stable bound
    val sizes = a.groupBy(_._2).map(_._2.size)
    assert(sizes.size == 8 && sizes.forall(s => s > 80 && s < 170),
      s"shard sizes unbalanced: $sizes")
  }

  test("assignShards refuses inputs with clashing output columns") {
    val withShard = docs(10).withColumn("shard", lit(0))
    val e = intercept[IllegalArgumentException] {
      Shards.assignShards(withShard, "doc_id", 4)
    }
    assert(e.getMessage.contains("shard"))
    val withScratch = docs(10).withColumn("__shuffle_key", lit("x"))
    intercept[IllegalArgumentException] {
      Shards.assignShards(withScratch, "doc_id", 4)
    }
  }

  test("writeShards: one ordered file per shard, manifest matches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards")
      .toString
    val base = docs(500)
    val manifest = Shards.writeShards(base, dir, "doc_id", 4,
      tokenCol = Some("n_tokens"))
    assert(manifest.map(_._2).sum == 500)
    assert(manifest.map(_._3).sum ==
      base.agg(sum($"n_tokens")).as[Long].head())
    // one data file per shard directory
    (0 until 4).foreach { s =>
      val files = new java.io.File(s"$dir/data/shard=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s has ${files.length} files")
    }
    // read-back equals the assignment, and rows within a shard file
    // are stored in pos order (stream-ready)
    val back = Shards.readShards(spark, dir)
    assert(back.count() == 500)
    val expect = Shards.assignShards(base, "doc_id", 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)]
      .collect().toSet
    assert(back.select("doc_id", "shard", "pos").as[(Long, Int, Long)]
      .collect().toSet == expect)
    val stored = spark.read.parquet(s"$dir/data/shard=1")
      .select($"pos").as[Long].collect().toSeq
    assert(stored == stored.sorted, "shard file must be pos-ordered")
    // shard filter prunes to the partition directory, not a full scan
    val pruned = back.filter($"shard" === 2)
    assert(pruned.count() == manifest.find(_._1 == 2).get._2)
  }
}
