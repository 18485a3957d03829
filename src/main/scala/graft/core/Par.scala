package graft.core

import org.apache.spark.sql.SparkSession

/** Overlap INDEPENDENT Spark actions from driver threads (optimization
  * guide §2.6): a multi-check gate that runs its counts sequentially
  * leaves the cluster idle through each job's tail and pays the
  * driver's per-job planning latency serially. Submitting them from a
  * small pool lets the next job's tasks back-fill freed cores; FIFO
  * scheduling keeps the earlier job ahead, which is exactly the
  * back-fill behaviour wanted.
  *
  * Only for actions with NO data dependency (each closure must read
  * already-materialized inputs or independent plans). Results come
  * back in argument order; failures propagate. Kill switch:
  * `graft.par.gates=false` runs the closures sequentially (A/B seam —
  * same results either way, by construction). */
object Par {
  // small daemon pool, shared: gates overlap 2-6 jobs; more in flight
  // than that just fights for executors (guide §2.6)
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    6,
    (r: Runnable) => {
      val t = new Thread(r, "graft-par")
      t.setDaemon(true)
      t
    })

  def jobs[T](spark: SparkSession)(fs: (() => T)*): Seq[T] = {
    val enabled = spark.conf.getOption("graft.par.gates")
      .forall(_.toBoolean)
    if (!enabled || fs.size <= 1) fs.map(_()).toSeq
    else {
      val futs = fs.map(f => pool.submit(new java.util.concurrent.Callable[T] {
        def call(): T = f()
      }))
      // unwrap ExecutionException so callers see the original failure
      futs.map { fu =>
        try fu.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }.toSeq
    }
  }
}
