package graft.storage

/** TEST-ONLY race-injection pause points for the maintenance flip
  * protocol. The reader-safety of generation flips was previously
  * evidenced by sampled concurrency (threads racing a compact) — which
  * proves an interleaving CAN pass, not that every window does. Specs
  * register a one-shot callback at a named point; the maintenance/read
  * verbs call [[at]] at each protocol window, so a spec can force
  * exactly the interleaving it wants: a reader that resolved one tier
  * pre-flip finishing post-flip, a probe landing between a base flip
  * and its inc reset, a probe inside the commit→cleanup window.
  *
  * Production cost: one lookup on an empty ConcurrentHashMap per
  * MAINTENANCE VERB or PROBE PLAN (driver-side, plan-time — never
  * per-row, never executor-side). Hooks are strictly one-shot:
  * [[at]] REMOVES the callback before running it, so a hook that
  * itself runs a maintenance verb (the standard injection shape) can
  * never recurse through its own pause point.
  */
object FlipHooks {

  private val hooks =
    new java.util.concurrent.ConcurrentHashMap[String, () => Unit]()

  /** Fire-and-forget pause point. No-op unless a spec armed `point`. */
  def at(point: String): Unit = {
    if (!hooks.isEmpty) {
      val h = hooks.remove(point)
      if (h != null) h()
    }
  }

  /** Arm `point` with a ONE-SHOT callback (auto-disarmed on fire). */
  def setOnce(point: String)(f: => Unit): Unit = hooks.put(point, () => f)

  /** Disarm everything (spec cleanup). */
  def clear(): Unit = hooks.clear()
}
