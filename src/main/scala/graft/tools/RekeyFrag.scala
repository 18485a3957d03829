package graft.tools
import graft.storage.{ArrayTable, Encryption}
object RekeyFrag {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Encryption.enable(spark, "frag", "graft-frag-rekey-key-123456789ab")
    Seq(64, 256).foreach { f =>
      val uri = s"/root/repo/target/frag-rehearsal/f$f"
      if (ArrayTable.exists(spark, uri)) {
        val n = ArrayTable.fragments(spark, uri).size
        val t0 = System.nanoTime()
        ArrayTable.reencryptArray(spark, uri, Some("frag"))
        val enc = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        ArrayTable.reencryptArray(spark, uri, None)
        val dec = (System.nanoTime() - t1) / 1e9
        println(f"[rekeyfrag] frags=$n%4d encrypt=$enc%6.1fs (${enc * 1000 / n}%5.0f ms/frag) decrypt=$dec%6.1fs")
      } else println(s"[rekeyfrag] no array at $uri")
    }
    spark.stop()
  }
}
