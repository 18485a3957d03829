package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
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
  * This OPTIMIZER rule (injected into the fixed-point operator-
  * optimization batch, after `PushDownPredicates` in each iteration)
  * removes that boundary entirely: a `LogicalRelation` over a
  * [[GraftRelation]] — bare, or under the `Filter` that pushdown has
  * parked on it — is replaced by the resolution DataFrame's own
  * (independently optimized) logical plan, aliased back to the
  * relation's attribute ids. The surrounding batch then re-runs
  * predicate pushdown and column pruning over the inlined subtree, so
  * filters reach the parquet leaves and the scans stay columnar under
  * whole-stage codegen.
  *
  * Running at optimization time (rather than the previous post-hoc
  * analysis hook) buys two things:
  *  - fragment MBR pruning: `spark.read.format("graft").load(uri)` is
  *    analyzed BEFORE `.filter(...)` exists, so an analysis-time rule
  *    can never see the dim predicates; here, pushdown has already
  *    parked them adjacent to the relation, and their literal bounds
  *    prune non-intersecting fragments' FILES out of the plan;
  *  - cache integrity: `CacheManager` matches cached plans on the
  *    analyzed form, which keeps `df.write.format("graft")`'s
  *    recache-by-relation working on cached graft reads.
  *
  * The V1 `buildScan` remains the correctness fallback — for sessions
  * running without [[graft.core.GraftExtensions]], and for the rare
  * on-disk schema drift between analysis and optimization (a relation
  * column no longer present in the resolution read), where this rule
  * leaves the relation untouched instead of failing the query.
  */
case class ResolutionReadInline(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, l: LogicalRelation) if l.relation.isInstanceOf[GraftRelation] =>
      inlined(l, splitConjunctivePredicates(cond)).map(Filter(cond, _)).getOrElse(f)
    case l: LogicalRelation if l.relation.isInstanceOf[GraftRelation] =>
      inlined(l, Nil).getOrElse(l)
  }

  /** The resolution read as an optimized logical plan, with the
    * relation's attribute ids on top; None -> keep the V1 relation. */
  private def inlined(l: LogicalRelation, conjuncts: Seq[Expression]): Option[LogicalPlan] =
    try {
      val r = l.relation.asInstanceOf[GraftRelation]
      val at = (r.t0, r.t1) match {
        case (None, None) => None
        case (a, b) => Some((a.getOrElse(0L), b.getOrElse(Long.MaxValue)))
      }
      val dims = ArrayTable.schemaOf(spark, r.uri).dimNames.toSet
      val bounds = ResolutionReadInline.boundsOf(conjuncts, dims)
      // independently optimized: subquery aliases eliminated, its own
      // range predicates pushed into the parquet leaves
      val resolved = ArrayTable.read(spark, r.uri, at = at, ranges = bounds)
        .queryExecution.optimizedPlan
      val byName = resolved.output.map(a => a.name -> a).toMap
      if (!l.output.forall(a => byName.contains(a.name))) None
      else {
        // keep the original attribute ids (and declared types) so every
        // reference above the relation still resolves
        val aliases = l.output.map { a =>
          val child = byName(a.name)
          val typed =
            if (child.dataType == a.dataType) child
            else Cast(child, a.dataType, Some(conf.sessionLocalTimeZone))
          Alias(typed, a.name)(exprId = a.exprId)
        }
        Some(Project(aliases, resolved))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}

object ResolutionReadInline {

  /** Per-dim inclusive bounds from the pushed-down conjuncts, for
    * fragment MBR (file-level) pruning. Conservative: only
    * `dim <cmp> literal` comparisons (and their mirrors) contribute;
    * everything else keeps every fragment. Literals convert to their
    * external Scala form — the same currency `ArrayTable.read` expects
    * from the V1 path. */
  private[graft] def boundsOf(conjuncts: Seq[Expression], dims: Set[String])
      : Map[String, (Option[Any], Option[Any])] = {
    def ext(l: Literal): Any = CatalystTypeConverters.convertToScala(l.value, l.dataType)
    val perDim = conjuncts.flatMap {
      case EqualTo(a: AttributeReference, v: Literal) if dims(a.name) =>
        Seq((a.name, Some(ext(v)): Option[Any], Some(ext(v)): Option[Any]))
      case EqualTo(v: Literal, a: AttributeReference) if dims(a.name) =>
        Seq((a.name, Some(ext(v)): Option[Any], Some(ext(v)): Option[Any]))
      case GreaterThan(a: AttributeReference, v: Literal) if dims(a.name) =>
        Seq((a.name, Some(ext(v)): Option[Any], None: Option[Any]))
      case GreaterThanOrEqual(a: AttributeReference, v: Literal) if dims(a.name) =>
        Seq((a.name, Some(ext(v)): Option[Any], None: Option[Any]))
      case LessThan(a: AttributeReference, v: Literal) if dims(a.name) =>
        Seq((a.name, None: Option[Any], Some(ext(v)): Option[Any]))
      case LessThanOrEqual(a: AttributeReference, v: Literal) if dims(a.name) =>
        Seq((a.name, None: Option[Any], Some(ext(v)): Option[Any]))
      // mirrored: literal <cmp> dim
      case GreaterThan(v: Literal, a: AttributeReference) if dims(a.name) =>
        Seq((a.name, None: Option[Any], Some(ext(v)): Option[Any]))
      case GreaterThanOrEqual(v: Literal, a: AttributeReference) if dims(a.name) =>
        Seq((a.name, None: Option[Any], Some(ext(v)): Option[Any]))
      case LessThan(v: Literal, a: AttributeReference) if dims(a.name) =>
        Seq((a.name, Some(ext(v)): Option[Any], None: Option[Any]))
      case LessThanOrEqual(v: Literal, a: AttributeReference) if dims(a.name) =>
        Seq((a.name, Some(ext(v)): Option[Any], None: Option[Any]))
      case _ => Nil
    }
    perDim.groupBy(_._1).map { case (d, bs) =>
      d -> (bs.flatMap(_._2).headOption, bs.flatMap(_._3).headOption)
    }
  }
}
