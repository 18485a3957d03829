package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Collapses filter predicates on DECODED enumeration labels back onto
  * the stored integer codes, so they reach the parquet scan as pushable
  * filters.
  *
  * Enum decode on read is `element_at(<literal label array>, code + 1)`
  * (ArrayTable.decodeEnums); Catalyst happily substitutes that through
  * projections, leaving filters like
  * `element_at(labels, code + 1) = 'red'` sitting on the scan — correct,
  * but opaque to parquet row-group skipping and dictionary filters. This
  * rule rewrites, inside Filter conditions only (null vs false is
  * indistinguishable to a filter, so dropping the label lookup is safe
  * there):
  *
  *   - `decoded = 'label'` / `'label' = decoded`  ->  `code = idx`
  *     (label not in the enumeration -> literal false)
  *   - `decoded IN ('a', 'b', ...)`               ->  `code IN (idxs)`
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * (GraftExtensions), running in the operator-optimization fixpoint, so
  * the rewritten code predicate is then pushed to the source by the
  * standard pushdown rules — `PushedFilters` shows the code comparison.
  */
object EnumPredicatePushdown extends Rule[LogicalPlan] {

  /** element_at(<string-array literal>, code + 1) -> (code, labels) */
  private object DecodedEnum {
    def unapply(e: Expression): Option[(Expression, IndexedSeq[String])] = e match {
      case ElementAt(Literal(arr: ArrayData, ArrayType(StringType, _)),
          Add(code, Literal(1, IntegerType), _), _, _) =>
        val labels = (0 until arr.numElements()).map(i =>
          arr.getUTF8String(i).toString)
        Some((code, labels))
      case _ => None
    }
  }

  private def codeEq(code: Expression, labels: IndexedSeq[String],
      label: UTF8String): Expression = {
    val idx = labels.indexOf(label.toString)
    if (idx < 0) Literal.FalseLiteral else EqualTo(code, Literal(idx))
  }

  /** map(<labels> -> <their indices>) literal, as QueryCondition's
    * ordered-enum emit builds it */
  private def isPositionMap(m: org.apache.spark.sql.catalyst.util.MapData,
      labels: IndexedSeq[String]): Boolean = {
    if (m.numElements() != labels.size) return false
    val keys = m.keyArray()
    val vals = m.valueArray()
    (0 until m.numElements()).forall { i =>
      val k = keys.getUTF8String(i).toString
      val v = vals.getInt(i)
      v >= 0 && v < labels.size && labels(v) == k
    }
  }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    // ordered-enum inequality: element_at(posMap, decoded) is just the
    // code itself (posMap inverts the label array), so the surrounding
    // comparison becomes a pushable integer range filter
    case ElementAt(Literal(m: org.apache.spark.sql.catalyst.util.MapData,
        MapType(StringType, IntegerType, _)), DecodedEnum(code, labels), _, _)
        if isPositionMap(m, labels) =>
      code
    case EqualTo(DecodedEnum(code, labels), Literal(s: UTF8String, StringType)) =>
      codeEq(code, labels, s)
    case EqualTo(Literal(s: UTF8String, StringType), DecodedEnum(code, labels)) =>
      codeEq(code, labels, s)
    case In(DecodedEnum(code, labels), values)
        if values.forall {
          case Literal(_: UTF8String, StringType) => true
          case _ => false
        } =>
      val idxs = values.collect {
        case Literal(s: UTF8String, StringType) if labels.contains(s.toString) =>
          Literal(labels.indexOf(s.toString)): Expression
      }
      if (idxs.isEmpty) Literal.FalseLiteral else In(code, idxs)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val r = rewrite(cond)
      if (r fastEquals cond) f else f.copy(condition = r)
  }
}
