package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.collection.mutable

/** stats_enable/disable/reset/dump surface (reference: tiledb/stats.py:
  * 7-148, per-query get_stats tiledb/query.py:297-312) backed by a
  * QueryExecutionListener — Spark's native metrics stream. */
object Stats {

  case class QueryStat(name: String, durationNs: Long, error: Option[String])

  private val buf = mutable.ArrayBuffer.empty[QueryStat]
  @volatile private var listener: Option[QueryExecutionListener] = None

  def enable(spark: SparkSession): Unit = synchronized {
    if (listener.isEmpty) {
      val l = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          synchronized { buf += QueryStat(funcName, durationNs, None) }
        override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
          synchronized { buf += QueryStat(funcName, 0L, Some(e.getMessage)) }
      }
      spark.listenerManager.register(l)
      listener = Some(l)
    }
  }

  def disable(spark: SparkSession): Unit = synchronized {
    listener.foreach(spark.listenerManager.unregister)
    listener = None
  }

  def reset(): Unit = synchronized {
    buf.clear()
    counters.values.foreach(_.reset())
  }

  def collected: Seq[QueryStat] = synchronized { buf.toSeq }

  // --- operator counters (cap/elision observability) -----------------
  // What the caps discarded, surfaced in ONE place instead of scattered
  // log lines: LSH buckets dropped past maxBucket, BPE vocabulary cut
  // mass, BM25 hot terms elided, ... Backed by named LongAccumulators,
  // so executor-side kernels (mapPartitions pair generators) increment
  // them and the driver reads a merged value here — works identically
  // on a real cluster. Observability ONLY — AT-LEAST-ONCE semantics:
  // task retries AND lineage recomputation (a counted DataFrame
  // evaluated twice) both double-count accumulator updates, and no
  // operator's output ever depends on these values. Where a counter's
  // value is itself part of a reported result (not just a dashboard
  // line), pin the counted lineage to exactly-once by materializing it
  // with `localCheckpoint(eager = true)` BEFORE any downstream action,
  // as `Curation.bloomContamination` does; every other counter site in
  // this repo accepts over-counting by design.

  private val counters = mutable.LinkedHashMap.empty[String, org.apache.spark.util.LongAccumulator]
  private var countersApp: String = ""

  /** Named distributed counter, created lazily. The registry is keyed
    * to the live SparkContext — a restarted session (tests) drops the
    * stale accumulators automatically. */
  def counter(spark: SparkSession, name: String): org.apache.spark.util.LongAccumulator =
    synchronized {
      val app = spark.sparkContext.applicationId
      if (app != countersApp) { counters.clear(); countersApp = app }
      counters.getOrElseUpdate(name,
        spark.sparkContext.longAccumulator(s"graft.$name"))
    }

  /** Current merged value (0 for a counter never touched). */
  def counterValue(name: String): Long = synchronized {
    counters.get(name).map(_.value.longValue).getOrElse(0L)
  }

  /** All counters, merged — the "what did the caps drop" dashboard. */
  def countersSnapshot: Map[String, Long] = synchronized {
    counters.map { case (k, v) => k -> v.value.longValue }.toMap
  }

  /** textual dump in the spirit of the reference's stats_dump */
  def dump(): String = synchronized {
    val lines = buf.groupBy(_.name).map { case (name, ss) =>
      val total = ss.map(_.durationNs).sum / 1e9
      f"  $name%-24s n=${ss.size}%-5d total=$total%.3fs"
    }
    val ctr = counters.map { case (k, v) =>
      f"  $k%-40s ${v.value.longValue}%d"
    }
    s"==== graft query stats (${buf.size} executions) ====\n" +
      lines.mkString("\n") +
      (if (ctr.isEmpty) ""
       else "\n==== graft operator counters ====\n" + ctr.mkString("\n"))
  }

  /** per-DataFrame plan stats (the closest analogue of per-query
    * get_stats): formatted plan + size/row estimates */
  def queryStats(df: DataFrame): String = {
    val plan = df.queryExecution.optimizedPlan
    s"sizeInBytes=${plan.stats.sizeInBytes} rowCount=${plan.stats.rowCount.getOrElse("n/a")}\n" +
      df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }
}
