package graft.tools

import org.apache.spark.sql.functions._
import graft.storage.{ArrayTable, Encryption}

/** Encryption overhead rehearsal (BASELINE.md): ingest sf0.1 lineitem
  * into a plaintext and an AES-256-GCM encrypted array and time
  * ingest, full scan, dim-slice read and an aggregate — the honest
  * "what does at-rest encryption cost in the hot path" numbers.
  * Median of 3 post-warmup runs per read op.
  *
  *   sbt "runMain graft.tools.EncBench [sfDir]"
  */
object EncBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = "/root/repo/target/enc-bench"
    val key1 = "graft-enc-bench-key-0123456789ab"
    val key2 = "graft-enc-bench-key2-123456789ab"
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Encryption.enable(spark, "bench", key1)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Unit): Double = { f; Seq(time(f), time(f), time(f)).sorted.apply(1) }

    // warm-up pass (JIT + codegen + committer init) so the first
    // measured ingest isn't paying one-time costs
    ArrayTable.ingest(spark, li, s"$base/warmup",
      Seq("l_orderkey", "l_linenumber"), overwrite = true)
    graft.storage.VFS(spark).delete(s"$base/warmup")

    Seq(Some("bench"), None, Some("bench"), None).foreach { key =>
      val label = if (key.isDefined) "encrypted" else "plaintext"
      val uri = s"$base/$label"
      graft.storage.VFS(spark).delete(uri)
      val tIngest = time(ArrayTable.ingest(spark, li, uri,
        Seq("l_orderkey", "l_linenumber"), overwrite = true,
        encryptionKey = key))
      val tScan = median3(ArrayTable.read(spark, uri).agg(count(lit(1))).head())
      val tSlice = median3(ArrayTable.read(spark, uri,
          ranges = Map("l_orderkey" -> (Some(100000L), Some(200000L))))
        .agg(count(lit(1))).head())
      val tAgg = median3(ArrayTable.read(spark, uri)
        .agg(sum(col("l_extendedprice"))).head())
      println(f"[encbench] $label%9s ingest=$tIngest%6.2fs scan=$tScan%6.3fs " +
        f"slice=$tSlice%6.3fs agg=$tAgg%6.3fs")
    }
    // key rotation: one decrypt-read + encrypt-write job per fragment
    // (consolidate first on many-fragment arrays — documented)
    Encryption.enable(spark, Map(
      "bench" -> key1.getBytes("UTF-8"), "bench2" -> key2.getBytes("UTF-8")))
    val encUri = s"$base/encrypted"
    val tRekey = time(ArrayTable.reencryptArray(spark, encUri, Some("bench2")))
    val tDecrypt = time(ArrayTable.reencryptArray(spark, encUri, None))
    val tEncrypt = time(ArrayTable.reencryptArray(spark, encUri, Some("bench")))
    println(f"[encbench] rekey=$tRekey%6.2fs decrypt=$tDecrypt%6.2fs " +
      f"encrypt=$tEncrypt%6.2fs (sf0.1 lineitem, 1 fragment)")
    spark.stop()
  }
}
