package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.Shim
import graft.sources.GraftTable
import graft.storage.ArrayTable

/** SQL `UPDATE` on graft catalog tables, as MERGE-ON-READ: the matched
  * rows are read (through full MVCC resolution), assignments applied,
  * and the result committed as ONE shadow fragment. Coordinate
  * shadowing makes the new values win on every later read — no data
  * files are rewritten, the touched-row set is the write size, and
  * time travel before the update's timestamp still sees the old
  * values. This is the same mechanic as an API upsert, so SQL UPDATE
  * and programmatic upsert are one semantics.
  *
  * Spark's own row-level UPDATE path (`SupportsRowLevelOperations`)
  * models copy-on-write group rewrites; shadowing needs none of that —
  * an analysis-time rewrite into a runnable command is the whole
  * implementation. Assigning a DIMENSION is rejected: shadowing
  * overrides by coordinates, so changing one would duplicate the cell,
  * and the reference's arrays have immutable cell coordinates too
  * (delete + insert is the supported spelling). Updates of a
  * time-travel view (`VERSION AS OF`) are rejected. */
case class UpdateRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(table, assignments, condition) if u.childrenResolved =>
      table.collectFirst {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
          r.table.asInstanceOf[GraftTable]
      } match {
        case Some(t) =>
          if (t.t0.nonEmpty || t.t1.nonEmpty)
            sys.error(s"cannot UPDATE a time-travel view of ${t.uri}")
          val sets = assignments.map {
            case Assignment(key: AttributeReference, value) => key.name -> value
            case Assignment(other, _) =>
              sys.error(s"unsupported UPDATE target (not a plain column): $other")
          }
          GraftUpdateCommand(t.uri, sets, condition)
        case None => u
      }
    case _ => plan
  }
}

/** The runnable: read-filter-assign-write. Executes lazily at command
  * run time so the read sees the array state AT EXECUTION, like every
  * other MVCC write. */
case class GraftUpdateCommand(uri: String, sets: Seq[(String, Expression)],
    cond: Option[Expression]) extends LeafRunnableCommand {

  /** Analyzer attr references in `e` carry the original relation's
    * expr ids; re-resolve BY NAME against the fresh read. */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val schema = ArrayTable.schemaOf(spark, uri)
    val dims = schema.dimNames.map(_.toLowerCase).toSet
    sets.foreach { case (n, _) =>
      if (dims.contains(n.toLowerCase))
        sys.error(s"cannot UPDATE dimension '$n' of $uri: cell coordinates are " +
          "immutable (shadowing overrides by coordinates) — DELETE + INSERT instead")
    }
    val cur = ArrayTable.read(spark, uri)
    val matched = cond match {
      case Some(c) => cur.filter(Shim.toColumn(unresolve(c)))
      case None => cur
    }
    val updated = matched.select(matched.columns.map { c =>
      sets.find(_._1.equalsIgnoreCase(c)) match {
        case Some((_, e)) =>
          Shim.toColumn(unresolve(e)).cast(matched.schema(c).dataType).as(c)
        case None => col(c)
      }
    }.toSeq: _*)
    ArrayTable.write(spark, updated, uri)
    Seq.empty
  }
}
