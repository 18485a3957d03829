package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for CPU-heavy narrow passes over SMALL
  * inputs (optimization guide §2.5, "input skew / one huge
  * unsplittable file": repartition immediately after the read).
  *
  * Why it exists: a parquet file is splittable only down to its row
  * groups — a small table written as one row group reads as ONE task
  * no matter the split config, which single-threads every downstream
  * narrow kernel (shingle hashing, term counting, media decode) until
  * the first exchange. The profiled LSH signature pass at sf0.1 ran
  * its whole corpus on 1 of 32 cores for exactly this reason.
  *
  * Shape: when the input's HONEST size estimate (optimized-plan stats
  * = file bytes for a scan, the [[Dedup.corpusFitsBroadcast]]
  * discipline) is at most `graft.widen.maxInputBytes` (default
  * 256 MB), round-robin repartition to ~`bytesPerTask` (512 KB)
  * partitions, capped at defaultParallelism. Above the budget the
  * input is left alone — a 100 TB corpus already carries thousands of
  * row groups and must never be blanket-reshuffled, so this is
  * size-adaptive, not a local-mode constant: on ANY cluster,
  * repartitioning ≤256 MB costs well under a second and guarantees a
  * CPU-bound kernel uses the cores. Results are row-set identical
  * (round-robin repartition only changes physical placement; Spark's
  * sort-before-repartition keeps the placement deterministic under
  * retries).
  *
  * Callers should PROJECT to the needed columns first (guide §2.3 —
  * shuffle only the bytes the kernel reads). Set
  * `graft.widen.maxInputBytes=0` to disable (A/B seam). */
object Widen {
  private val BytesPerTask = 512L << 10

  def bySize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxBytes = spark.conf.getOption("graft.widen.maxInputBytes")
      .map(_.toLong).getOrElse(256L << 20)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (maxBytes <= 0 || est > maxBytes) df
    else {
      val p = spark.sparkContext.defaultParallelism
      val parts = math.max(1L, math.min(p.toLong, est.toLong / BytesPerTask)).toInt
      // below 2 target partitions the exchange buys nothing
      if (parts < 2) df else df.repartition(parts)
    }
  }

  /** Parallelism floor for frames whose per-ROW cost dominates their
    * byte size (media decode, codec synthesis): a narrow id/key frame
    * is ~free to shuffle at any scale, while leaving it at the scan's
    * partitioning single-threads minutes of decode CPU behind a
    * single-row-group file. Round-robin to defaultParallelism; same
    * conf kill-switch as [[bySize]] (`graft.widen.maxInputBytes=0`). */
  def forHeavyRows(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxBytes = spark.conf.getOption("graft.widen.maxInputBytes")
      .map(_.toLong).getOrElse(256L << 20)
    if (maxBytes <= 0) df
    else df.repartition(spark.sparkContext.defaultParallelism)
  }
}
