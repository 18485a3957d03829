package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: for each left row, the matching right row
  * with the same keys by timestamp direction — "backward" (most recent
  * right.ts <= left.ts, the default), "forward" (earliest right.ts >=
  * left.ts), or "nearest" (closer of the two, backward on ties — the
  * pandas merge_asof direction set) — optionally within a tolerance.
  *
  * Built by composition (SURVEY §7.2 preference (a)): tag both sides,
  * union, ONE window pass per key carrying the adjacent right payload
  * across the timeline (last-before for backward, first-after for
  * forward, both frames in the same pass for nearest). This shuffles
  * each row exactly once on the join keys — unlike a range-join
  * (quadratic blowup per key) or a per-left-row subquery. At equal
  * timestamps the right row matches in every direction (same
  * inclusive rule as DuckDB/pandas ASOF): backward sorts the right
  * row first, forward sorts it after the left row, and nearest takes
  * it through the backward frame at distance zero.
  */
object AsOf {

  /** @param toleranceUs maximum |left.ts - right.ts| in MICROSECONDS —
    *   compared via `unix_micros`, so sub-second tolerances are exact
    *   (a cast-to-long comparison would truncate to whole seconds).
    * @param direction "backward" | "forward" | "nearest" */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "right_",
      toleranceUs: Option[Long] = None, inner: Boolean = true,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    // side tag orders equal timestamps: backward/nearest want the
    // right row BEFORE the left (0 < 1) so the preceding frame holds
    // it; forward wants it AFTER (2 > 1) so the following frame does
    val rSide = if (direction == "forward") 2 else 0
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")
        :+ struct(rPayload.map(col): _*).as("__r")): _*)
      .withColumn("__side", lit(rSide))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val wBase = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
    val wBack = wBase.rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = wBase.rowsBetween(0, Window.unboundedFollowing)
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    def dist(m: Column) = {
      val d = micros(col("__ts")) - micros(m.getField(rightTs).cast("timestamp"))
      when(m.isNotNull, abs(d))
    }
    def withinTol(m: Column) = toleranceUs match {
      case Some(tol) => m.isNotNull && dist(m) <= tol
      case None => m.isNotNull
    }
    val carried = direction match {
      case "backward" =>
        u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(wBack))
      case "forward" =>
        u.withColumn("__m", first(col("__r"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        // equal-ts rights ride the backward frame (distance 0 always
        // wins); the forward frame sees strictly-later rights only
        val both = u
          .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wBack))
          .withColumn("__mf", first(col("__r"), ignoreNulls = true).over(wFwd))
        val okb = withinTol(col("__mb"))
        val okf = withinTol(col("__mf"))
        both.withColumn("__m",
          when(okb && (!okf || dist(col("__mb")) <= dist(col("__mf"))), col("__mb"))
            .when(okf, col("__mf")))
          .drop("__mb", "__mf")
    }
    val matchOk = withinTol(col("__m"))
    val leftRows = carried.filter(col("__side") === 1)
      .withColumn("__ok", matchOk)
    val filtered = if (inner) leftRows.filter(col("__ok")) else leftRows
    val outCols = left.columns.map(col).toSeq ++ rPayload.map(p =>
      when(col("__ok"), col(s"__m.$p")).otherwise(lit(null)).as(rightPrefix + p))
    filtered.select(outCols: _*)
  }

  /** Integer floor-division of a long column by a positive constant —
    * exact at any magnitude: pmod makes the numerator an exact multiple,
    * then INTEGRAL division (SQL `div`) avoids the double-divide that
    * goes off by one above 2^53 (year-300k micros are valid longs). */
  private def floorDiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** Exploded bin ids covered by the half-open interval [s, e) — or a
    * LOUD runtime failure when a single interval would fan out past
    * `maxBins` bins. The open-interval sentinel trap: a 9999-12-31 end
    * timestamp (the common "no end yet" convention) with the default
    * 1-hour bin is ~70M exploded rows PER ROW — an executor OOM with no
    * explanation. Same loud-over-silent convention as the BM25 probe
    * caps: fail with the fix in the message instead. */
  private def binsOrFail(s: Column, e: Column, binWidthUs: Long,
      maxBins: Long): Column = {
    val lo = floorDiv(s, binWidthUs)
    val hi = floorDiv(e - 1, binWidthUs)
    explode(when(hi - lo >= maxBins, raise_error(format_string(
      s"graft interval join: one interval spans %d bins (> " +
        s"maxBinsPerInterval=$maxBins with binWidthUs=$binWidthUs); " +
        "raise binWidthUs, raise maxBinsPerInterval, or clamp " +
        "open-ended sentinel end timestamps to the queried time range",
      hi - lo + 1))).otherwise(sequence(lo, hi)))
  }

  /** Monotonic epoch-anchored micros for a TIMESTAMP or TIMESTAMP_NTZ
    * column. TIMESTAMP is an instant — unix_micros directly. NTZ is a
    * WALL CLOCK: ANY route through the session timezone (a cast, even
    * `timestampdiff` — verified: its NTZ coercion collapses DST-gap
    * wall times to one instant) is non-monotonic across spring-forward
    * and silently empties intervals. So NTZ converts by pure FIELD
    * arithmetic — days-since-epoch and clock fields are direct wall
    * reads on NTZ, timezone never enters. */
  private def microsOf(df: DataFrame, colName: String): Column =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        val c = col(colName)
        val days = datediff(c.cast(org.apache.spark.sql.types.DateType),
          lit(java.time.LocalDate.of(1970, 1, 1))).cast("long")
        days * lit(86400000000L) +
          hour(c).cast("long") * lit(3600000000L) +
          minute(c).cast("long") * lit(60000000L) +
          (expr(s"date_part('SECOND', `$colName`)") * lit(1000000L))
            .cast("long")
      case _ => unix_micros(col(colName))
    }

  /** Shared preamble of the two bin-bucketed interval joins: validate
    * the inputs (prefixed right columns must not clash with left; no
    * input column may shadow an internal name) and build the exploded
    * right side — (keys, __s, __e epoch micros, __r payload struct,
    * one __bin row per overlapped fixed-width bin; empty or inverted
    * intervals are dropped here, so they match nothing). ONE definition
    * so a fix to the validation or the bin bounds can never land in
    * one join and silently miss the other. */
  private def explodedRightIntervals(left: DataFrame, right: DataFrame,
      keys: Seq[String], rightStart: String, rightEnd: String,
      rightPrefix: String, binWidthUs: Long, maxBinsPerInterval: Long,
      callerInternal: Set[String]): (DataFrame, Seq[String]) = {
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    // helper-owned internals live HERE so a new one can never be
    // silently missing from a caller's reserved set; callers pass only
    // their own extra working names
    val internal = callerInternal ++ Set("__bin", "__s", "__e", "__r")
    require(binWidthUs > 0, s"binWidthUs must be positive, got $binWidthUs")
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val clash = rPayload.map(rightPrefix + _).toSet
      .intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"prefixed right columns collide with left columns: $clash")
    val reserved = (left.columns.toSet ++ keys).intersect(internal)
    require(reserved.isEmpty,
      s"input columns collide with interval-join internals: $reserved")
    val r = right.select((keys.map(col) :+
        microsOf(right, rightStart).as("__s") :+
        microsOf(right, rightEnd).as("__e") :+
        struct(rPayload.map(col): _*).as("__r")): _*)
      .filter(col("__e") > col("__s"))
      .withColumn("__bin",
        binsOrFail(col("__s"), col("__e"), binWidthUs, maxBinsPerInterval))
    (r, rPayload)
  }

  /** Interval (range) join: every (left row, right row) pair with equal
    * `keys` where the right interval `[startCol, endCol)` CONTAINS the
    * left timestamp (inclusive start, exclusive end — empty or inverted
    * intervals match nothing). Inner join; right payload columns come
    * back under `rightPrefix`.
    *
    * The naive plan for this predicate is a per-key nested loop
    * (quadratic per key, or a broadcast nested loop across keys) — the
    * classic scale-killer. This implementation bin-buckets instead:
    * each right interval explodes to the fixed-width time bins it
    * overlaps, each left row maps to its SINGLE bin, and the join runs
    * as one equi-join on (keys, bin) with the containment predicate as
    * a post-filter. A qualifying pair meets in exactly one bin (the
    * left timestamp's), so no dedup pass is needed and the output is
    * produced in one shuffle.
    *
    * `binWidthUs` trades right-side fan-out (ceil(len/width)+1 rows per
    * interval) against bucket selectivity — set it near the typical
    * interval length. Skewed buckets (many intervals over one hot bin)
    * are real candidate mass, left to AQE skew-join splitting.
    *
    * `maxBinsPerInterval` bounds per-interval fan-out: any single
    * interval wider than `maxBinsPerInterval * binWidthUs` fails the
    * job LOUDLY (an unclamped open-interval sentinel like 9999-12-31
    * would otherwise explode to tens of millions of rows per row).
    *
    * NOTE the default cap is a BEHAVIOR CHANGE from pre-r15 releases,
    * which had no cap: at the default 1-hour `binWidthUs`, 100000 bins
    * is ~11.4 years — a legitimate interval wider than that now fails
    * at runtime (with the remediation in the message) where it
    * previously ran. Genuinely wide intervals should raise `binWidthUs`
    * (the cap scales with it: cap seconds of span = maxBinsPerInterval
    * × binWidthUs) — a wider bin is also the right bucketing for wide
    * intervals — or raise `maxBinsPerInterval` explicitly. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightStart: String, rightEnd: String,
      rightPrefix: String = "right_",
      binWidthUs: Long = 3600L * 1000000L,
      maxBinsPerInterval: Long = 100000L): DataFrame = {
    val (r, rPayload) = explodedRightIntervals(left, right, keys,
      rightStart, rightEnd, rightPrefix, binWidthUs, maxBinsPerInterval,
      Set("__t"))
    val l = left.withColumn("__t", microsOf(left, leftTs))
      .withColumn("__bin", floorDiv(col("__t"), binWidthUs))
    l.join(r, keys :+ "__bin")
      .filter(col("__t") >= col("__s") && col("__t") < col("__e"))
      .select(left.columns.map(col).toSeq ++
        rPayload.map(p => col(s"__r.$p").as(rightPrefix + p)): _*)
  }

  /** Interval-overlap join: every (left, right) pair with equal `keys`
    * whose half-open NONEMPTY intervals intersect — `ls < re && rs <
    * le` with `ls < le` and `rs < re`: touching intervals do NOT match,
    * and empty or inverted intervals on EITHER side match nothing
    * (same rule as [[rangeJoin]]'s right side). The generalization of
    * [[rangeJoin]] to interval×interval (session overlap, span
    * intersection); same bin-bucketed shape, with BOTH sides exploded
    * to their covered bins. A pair can share many bins, so the
    * candidate is kept only in the bin of `max(ls, rs)` — the overlap
    * start, which both sides are guaranteed to cover — making each
    * qualifying pair meet in EXACTLY one bin again: one equi-join
    * shuffle, no dedup pass. `maxBinsPerInterval` applies to BOTH
    * sides here, with the same default-cap behavior change called out
    * on [[rangeJoin]] (~11.4 years at the default 1-hour bin; scale
    * `binWidthUs` up for genuinely wide intervals). */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      rightPrefix: String = "right_",
      binWidthUs: Long = 3600L * 1000000L,
      maxBinsPerInterval: Long = 100000L): DataFrame = {
    val (r, rPayload) = explodedRightIntervals(left, right, keys,
      rightStart, rightEnd, rightPrefix, binWidthUs, maxBinsPerInterval,
      Set("__ls", "__le"))
    val l = left
      .withColumn("__ls", microsOf(left, leftStart))
      .withColumn("__le", microsOf(left, leftEnd))
      .filter(col("__le") > col("__ls"))
      .withColumn("__bin",
        binsOrFail(col("__ls"), col("__le"), binWidthUs, maxBinsPerInterval))
    l.join(r, keys :+ "__bin")
      .filter(col("__ls") < col("__e") && col("__s") < col("__le") &&
        col("__bin") === floorDiv(greatest(col("__ls"), col("__s")), binWidthUs))
      .select(left.columns.map(col).toSeq ++
        rPayload.map(p => col(s"__r.$p").as(rightPrefix + p)): _*)
  }
}
