package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-shard export — the LAST stage of a data
  * pipeline: fix a global pseudo-random document order, cut it into
  * `numShards` near-equal shards, write each shard as one
  * position-ordered file plus a driver-side manifest.
  *
  * Training loaders want (a) a SHUFFLED order that is reproducible
  * run-to-run and auditable by any engine, and (b) shard files they
  * can stream sequentially and checkpoint by (shard, pos). Both come
  * from one pure function of (salt, id) — the same md5 contract as
  * [[Curation.sampleHash]]: independent of partitioning, task
  * retries, cluster size, and Spark version, recomputable row-by-row
  * by the DuckDB oracle (`shard_assign`).
  *
  * Scale shape (100 TB): shard = 24-bit hash prefix mod numShards is a
  * narrow per-row expression; the ONLY shuffle is the hash partition
  * by shard, and in-shard positions come from a per-shard window sort
  * (external sort, spills fine). One task per shard is INHERENT to
  * "one ordered file per shard" — parallelism is `numShards`, so size
  * shards to the file size you want (100 TB at 1 GB shards = 100k
  * tasks, a normal stage). No driver pass ever sees corpus rows; the
  * manifest aggregate is numShards rows.
  */
object Shards {

  /** The global shuffle key: md5 hex of (salt || id). Lexicographic
    * order of the hex string IS the shuffle order. */
  def shuffleKey(idCol: Column, salt: String): Column =
    md5(concat(lit(salt), idCol.cast("string")).cast("binary"))

  /** Assign every row its shard and in-shard position. Adds `shard`
    * (int, 24-bit hash prefix mod numShards — bias <= numShards/2^24,
    * immaterial) and `pos` (long, 0-based rank of the shuffle key
    * within the shard; id tiebreak for determinism). */
  def assignShards(df: DataFrame, idCol: String, numShards: Int,
      salt: String = "graft"): DataFrame = {
    require(numShards > 0, s"numShards $numShards must be positive")
    val clash = df.columns.toSet
      .intersect(Set("shard", "pos", "__shuffle_key"))
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} that " +
        "assignShards would overwrite; rename them first")
    val keyed = df
      .withColumn("__shuffle_key", shuffleKey(col(idCol), salt))
      .withColumn("shard",
        (conv(substring(col("__shuffle_key"), 1, 6), 16, 10).cast("long")
          % numShards).cast("int"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__shuffle_key"), col(idCol))
    keyed
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("__shuffle_key")
  }

  /** Write `df` as `numShards` ordered shard files under `uri/data/
    * shard=K/` plus `uri/manifest.json` ({shard, rows[, tokens]} per
    * shard, written LAST so a complete manifest implies complete
    * data). One hash-partition shuffle; rows land sorted by pos, one
    * file per shard directory. Returns the manifest rows.
    *
    * `encryptionKey` encrypts the shard data at rest (parquet modular
    * encryption via the dir marker, same scheme as the persisted
    * search/dedup/ANN indexes — training shards are the pipeline
    * artifact MOST likely to leave the trust boundary); the manifest
    * rides the same encrypt-or-plain sidecar funnel. */
  def writeShards(df: DataFrame, uri: String, idCol: String,
      numShards: Int, salt: String = "graft",
      tokenCol: Option[String] = None,
      encryptionKey: Option[String] = None): Seq[(Int, Long, Long)] = {
    val spark = df.sparkSession
    val assigned = assignShards(df, idCol, numShards, salt)
    val fs = graft.storage.VFS(spark)
    fs.delete(uri)
    encryptionKey.foreach(id => graft.storage.Encryption.markDir(spark, uri, id))
    assigned
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.options(graft.storage.Encryption.dirWriteOptions(spark, uri))
      .partitionBy("shard").parquet(s"$uri/data")
    // Manifest aggregated from a READ-BACK of the written files, not a
    // re-run of assignShards over the (possibly changed, possibly
    // non-deterministic) source: the manifest then describes exactly
    // what is on disk, and the second pass costs one parquet scan of
    // the shards rather than a second full source job.
    // numShards rows of driver metadata — bounded by construction.
    val written = spark.read.parquet(s"$uri/data")
    val toks = tokenCol.map(c => sum(col(c))).getOrElse(sum(lit(0L)))
    val manifest = written.groupBy("shard")
      .agg(count(lit(1)).as("rows"), toks.cast("long").as("tokens"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .sortBy(_._1).toSeq
    val json = manifest.map { case (s, n, t) =>
      s"""{"shard":$s,"rows":$n,"tokens":$t}"""
    }.mkString("[", ",", "]")
    graft.storage.Encryption.dirJsonWrite(spark, uri, s"$uri/manifest.json", json)
    manifest
  }

  /** Read shards back (all of them, or one by `shard=` partition
    * pruning on the returned frame — the directory layout makes the
    * filter a file prune, not a scan). */
  def readShards(spark: SparkSession, uri: String): DataFrame =
    spark.read.parquet(s"$uri/data")
}
