package graft.tools

import org.apache.spark.sql.functions._
import graft.storage.ArrayTable

/** Plan-time rehearsal for many-fragment MVCC resolution (r12 verdict
  * item: "a 10k-fragment array with tombstones would pay a 10k-way
  * union at PLAN time"). Builds arrays of F tiny fragments plus one
  * conditional tombstone (forcing the resolution path), then times
  *
  *   - plan: DataFrame construction + executedPlan materialization
  *   - exec: the full read collect
  *
  * for (a) the shipped one-scan-per-schema-version shape and (b) the
  * pre-r13 per-fragment-unionByName shape, emulated here verbatim so
  * the A/B survives the fix landing.
  *
  *   sbt "runMain graft.tools.FragmentsRehearsal [maxFrags]"
  */
object FragmentsRehearsal {
  def main(args: Array[String]): Unit = {
    val maxF = args.headOption.map(_.toInt).getOrElse(1024)
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // register the rehearsal key ONCE: enable() flushes the JVM-wide
    // unwrapped-key caches, so calling it inside the loop would re-pay
    // key unwrap before every encrypted measurement and overstate the
    // steady-state first-touch overhead being measured
    graft.storage.Encryption.enable(spark, "frag-rehearsal",
      "frag-rehearsal-key-0123456789abc")

    Iterator(64, 256, 1024).takeWhile(_ <= maxF).foreach { f =>
      val uri = s"/root/repo/target/frag-rehearsal/f$f"
      if (!ArrayTable.exists(spark, uri)) {
        val seed = Seq.tabulate(16)(i => (i.toLong, i * 2.5)).toDF("k", "v")
        ArrayTable.ingest(spark, seed.filter(lit(false)), uri, Seq("k"),
          overwrite = true)
        var i = 0
        while (i < f) {
          ArrayTable.write(spark,
            seed.withColumn("k", col("k") + lit(i * 16L)), uri,
            tsOpt = Some(1000L + i))
          i += 1
        }
        ArrayTable.delete(spark, uri, "v < 1.0", tsOpt = Some(5000L + f))
      }

      // shipped shape
      val (_, warm) = time { ArrayTable.read(spark, uri).queryExecution }
      val (dfNew, planNew) = time {
        val d = ArrayTable.read(spark, uri)
        d.queryExecution.executedPlan
        d
      }
      val (nNew, execNew) = time(dfNew.count())

      // pre-r13 shape: per-fragment scan + lit(ts, seq) + unionByName
      val frags = ArrayTable.fragments(spark, uri)
      val (dfOld, planOld) = time {
        val base = frags.map { fr =>
          spark.read.parquet(s"${fr.path}/data")
            .withColumn("__ts", lit(fr.ts)).withColumn("__seq", lit(fr.seq))
        }.reduce(_ unionByName _)
        val d = base.filter(!(coalesce(col("v") < 1.0, lit(false)) &&
          col("__ts") <= lit(5000L + f))).drop("__ts", "__seq")
        d.queryExecution.executedPlan
        d
      }
      val (nOld, execOld) = time(dfOld.count())
      require(nNew == nOld, s"row mismatch $nNew vs $nOld")
      println(f"frags=$f%5d rows=$nNew%6d | one-scan plan=$planNew%6.2fs " +
        f"exec=$execNew%6.2fs | per-frag-union plan=$planOld%6.2fs " +
        f"exec=$execOld%6.2fs (first-touch overhead ${warm}%.2fs)")

      // ENCRYPTED arm: the same F-fragment lifecycle under parquet
      // modular encryption — composes the round-13 one-scan MVCC
      // resolution with round-13 at-rest encryption, which were only
      // ever measured separately. The bar: plan time must stay flat
      // (resolution planning never opens footers — it parses fragment
      // dir names and validates against manifests), and exec pays only
      // the known ~5% decrypt overhead per footer/page, not a
      // per-fragment key-unwrap cliff.
      val uriE = s"/root/repo/target/frag-rehearsal/f$f-enc"
      if (!ArrayTable.exists(spark, uriE)) {
        val seed = Seq.tabulate(16)(i => (i.toLong, i * 2.5)).toDF("k", "v")
        ArrayTable.ingest(spark, seed.filter(lit(false)), uriE, Seq("k"),
          overwrite = true, encryptionKey = Some("frag-rehearsal"))
        var i = 0
        while (i < f) {
          ArrayTable.write(spark,
            seed.withColumn("k", col("k") + lit(i * 16L)), uriE,
            tsOpt = Some(1000L + i))
          i += 1
        }
        ArrayTable.delete(spark, uriE, "v < 1.0", tsOpt = Some(5000L + f))
      }
      val (_, warmE) = time { ArrayTable.read(spark, uriE).queryExecution }
      val (dfEnc, planEnc) = time {
        val d = ArrayTable.read(spark, uriE)
        d.queryExecution.executedPlan
        d
      }
      val (nEnc, execEnc) = time(dfEnc.count())
      require(nEnc == nNew, s"encrypted row mismatch $nEnc vs $nNew")
      println(f"frags=$f%5d rows=$nEnc%6d | ENCRYPTED one-scan " +
        f"plan=$planEnc%6.2fs exec=$execEnc%6.2fs " +
        f"(first-touch overhead ${warmE}%.2fs)")
    }
    spark.stop()
  }
}
