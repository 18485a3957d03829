package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import graft.sources.GraftRelation
import graft.storage.ArrayTable

/** Inlines MVCC-resolution reads of the `graft` source into the query
  * plan.
  *
  * The DSv2 path already serves arrays that need no resolution as a
  * bare columnar parquet scan. Arrays that DO need resolution
  * (overlapping fragments, tombstones, schema-version drift, enum
  * decode — the common case on a long-lived array) fall back to the V1
  * `PrunedFilteredScan`, whose contract forces the resolved rows
  * through an `RDD[Row]` boundary: an opaque row-based scan that
  * Catalyst can neither vectorize nor see through.
  *
  * This post-hoc resolution rule removes that boundary entirely: any
  * analyzed `LogicalRelation` over a [[GraftRelation]] is replaced by
  * the resolution DataFrame's own logical plan (multi-path parquet
  * scans -> shadowing window -> tombstone anti-filters -> enum decode),
  * aliased back to the relation's attribute ids. Catalyst then treats
  * the resolution read like any native query: filters push into the
  * parquet leaves, columns prune, and the scans stay columnar under
  * whole-stage codegen. The V1 `buildScan` remains only as the
  * correctness fallback for sessions running without
  * [[graft.core.GraftExtensions]].
  */
case class ResolutionReadInline(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case l: LogicalRelation if l.relation.isInstanceOf[GraftRelation] =>
      val r = l.relation.asInstanceOf[GraftRelation]
      val at = (r.t0, r.t1) match {
        case (None, None) => None
        case (a, b) => Some((a.getOrElse(0L), b.getOrElse(Long.MaxValue)))
      }
      val resolved = ArrayTable.read(spark, r.uri, at = at).queryExecution.analyzed
      val byName = resolved.output.map(a => a.name -> a).toMap
      // keep the original attribute ids (and declared types) so every
      // reference above the relation still resolves
      val aliases = l.output.map { a =>
        val child = byName.getOrElse(a.name,
          sys.error(s"graft resolution read lost column ${a.name}"))
        val typed =
          if (child.dataType == a.dataType) child
          else Cast(child, a.dataType, Some(conf.sessionLocalTimeZone))
        Alias(typed, a.name)(exprId = a.exprId)
      }
      Project(aliases, resolved)
  }
}
