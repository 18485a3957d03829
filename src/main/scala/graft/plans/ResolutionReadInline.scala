package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import graft.sources.{GraftRelation, GraftTable}
import graft.storage.ArrayTable

/** Inlines MVCC-resolution reads of the `graft` source into the query
  * plan — both V1 path-based loads and CATALOG-loaded DSv2 tables
  * ([[graft.sources.GraftCatalog]]).
  *
  * The DSv2 path already serves arrays that need no resolution as a
  * bare columnar parquet scan. Arrays that DO need resolution
  * (overlapping fragments, tombstones, schema-version drift, enum
  * decode — the common case on a long-lived array) fall back to the V1
  * `PrunedFilteredScan`, whose contract forces the resolved rows
  * through an `RDD[Row]` boundary: an opaque row-based scan that
  * Catalyst can neither vectorize nor see through. Catalog tables have
  * no V1 fallback at all — their guard scan fails loudly at execution
  * — so this rule IS their read path in an extensions-enabled session.
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
  import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

  private def graftRes(r: DataSourceV2Relation): Option[GraftTable] =
    r.table match {
      case t: GraftTable if t.needsResolution => Some(t)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Row-level commands (DELETE/UPDATE/MERGE) hold their TARGET
    // relation as a plain child — unlike the write commands — and that
    // target must stay a DataSourceV2Relation for the V2 strategy to
    // plan the operation (DELETE goes through SupportsDelete, not
    // through a read). Collect those relations and leave them alone;
    // their row data is never read through this path.
    import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, MergeIntoTable, UpdateTable}
    val targets: Seq[LogicalPlan] = plan.collect {
      case d: DeleteFromTable => d.table
      case u: UpdateTable => u.table
      case m: MergeIntoTable => m.targetTable
    }
    val protectedRels = targets.flatMap(_.collect {
      case r: DataSourceV2Relation => r
    })
    def shielded(r: DataSourceV2Relation): Boolean = protectedRels.exists(_ eq r)
    plan.transformDown {
      // V1 path-based loads (format("graft") fallback relation)
      case f @ Filter(cond, l: LogicalRelation) if l.relation.isInstanceOf[GraftRelation] =>
        inlined(l, splitConjunctivePredicates(cond)).map(Filter(cond, _)).getOrElse(f)
      case l: LogicalRelation if l.relation.isInstanceOf[GraftRelation] =>
        inlined(l, Nil).getOrElse(l)
      // Catalog-loaded (DSv2) resolution-needing tables. Two node
      // shapes so the inline is independent of optimizer batch order:
      // before V2ScanRelationPushDown the plan holds the bare
      // DataSourceV2Relation (with pushdown-parked Filters adjacent);
      // after it, a DataSourceV2ScanRelation over the loud-fail guard
      // scan, with every filter kept residual above. Either way the
      // parked dim bounds drive fragment MBR file pruning — including
      // for DataFrame-incremental reads (spark.table(...).filter(...)),
      // which analysis-time inlining could never see.
      case f @ Filter(cond, r: DataSourceV2Relation)
          if graftRes(r).isDefined && !shielded(r) =>
        inlinedV2(graftRes(r).get, r.output, splitConjunctivePredicates(cond))
          .map(Filter(cond, _)).getOrElse(f)
      case r: DataSourceV2Relation if graftRes(r).isDefined && !shielded(r) =>
        inlinedV2(graftRes(r).get, r.output, Nil).getOrElse(r)
      case f @ Filter(cond, s: DataSourceV2ScanRelation)
          if graftRes(s.relation).isDefined && !shielded(s.relation) =>
        inlinedV2(graftRes(s.relation).get, s.output, splitConjunctivePredicates(cond))
          .map(Filter(cond, _)).getOrElse(f)
      case s: DataSourceV2ScanRelation
          if graftRes(s.relation).isDefined && !shielded(s.relation) =>
        inlinedV2(graftRes(s.relation).get, s.output, Nil).getOrElse(s)
    }
  }

  private def inlinedV2(t: GraftTable, output: Seq[Attribute],
      conjuncts: Seq[Expression]): Option[LogicalPlan] =
    ResolutionReadInline.inlinePlan(spark, t.uri, t.at, output, conjuncts,
      conf.sessionLocalTimeZone)

  /** The resolution read as an optimized logical plan, with the
    * relation's attribute ids on top; None -> keep the V1 relation. */
  private def inlined(l: LogicalRelation, conjuncts: Seq[Expression]): Option[LogicalPlan] = {
    val r = l.relation.asInstanceOf[GraftRelation]
    val at = (r.t0, r.t1) match {
      case (None, None) => None
      case (a, b) => Some((a.getOrElse(0L), b.getOrElse(Long.MaxValue)))
    }
    ResolutionReadInline.inlinePlan(spark, r.uri, at, l.output, conjuncts,
      conf.sessionLocalTimeZone)
  }
}

object ResolutionReadInline {

  /** The shared inline: resolution read -> independently optimized
    * logical plan (subquery aliases eliminated, its own range
    * predicates pushed into the parquet leaves), aliased back to the
    * caller's attribute ids so every reference above still resolves.
    * None -> leave the original relation in place. */
  private[plans] def inlinePlan(spark: SparkSession, uri: String,
      at: Option[(Long, Long)], output: Seq[Attribute],
      conjuncts: Seq[Expression], tz: String): Option[LogicalPlan] =
    try {
      val dims = ArrayTable.schemaOf(spark, uri).dimNames.toSet
      val bounds = boundsOf(conjuncts, dims)
      val resolved = ArrayTable.read(spark, uri, at = at, ranges = bounds)
        .queryExecution.optimizedPlan
      val byName = resolved.output.map(a => a.name -> a).toMap
      if (!output.forall(a => byName.contains(a.name))) None
      else {
        val aliases = output.map { a =>
          val child = byName(a.name)
          val typed =
            if (child.dataType == a.dataType) child
            else Cast(child, a.dataType, Some(tz))
          Alias(typed, a.name)(exprId = a.exprId)
        }
        Some(Project(aliases, resolved))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

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
    // tightest bound per dim: max of lows / min of highs, so
    // `dim > 5 AND dim > 10` prunes with 10, not whichever came first.
    // Comparable-ordering only applies within one dim's literals, which
    // share the dim's type.
    def tightest(vs: Seq[Any], takeMax: Boolean): Option[Any] =
      if (vs.isEmpty) None
      else Some(vs.reduce { (a, b) =>
        val cmp = (a, b) match {
          case (x: java.lang.Comparable[_], y) if x.getClass == y.getClass =>
            x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
          case _ => 0 // incomparable: keep the first (conservative)
        }
        if ((cmp >= 0) == takeMax) a else b
      })
    perDim.groupBy(_._1).map { case (d, bs) =>
      d -> (tightest(bs.flatMap(_._2), takeMax = true),
            tightest(bs.flatMap(_._3), takeMax = false))
    }
  }
}
