package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
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

  private def graftOf(table: LogicalPlan): Option[GraftTable] = table.collectFirst {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      r.table.asInstanceOf[GraftTable]
  }

  private def namedSets(assignments: Seq[Assignment],
      what: String): Seq[(String, Expression)] = assignments.map {
    case Assignment(key: AttributeReference, value) => key.name -> value
    case Assignment(other, _) =>
      sys.error(s"unsupported $what target (not a plain column): $other")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(table, assignments, condition) if u.childrenResolved =>
      graftOf(table) match {
        case Some(t) =>
          if (t.t0.nonEmpty || t.t1.nonEmpty)
            sys.error(s"cannot UPDATE a time-travel view of ${t.uri}")
          GraftUpdateCommand(t.uri, namedSets(assignments, "UPDATE"), condition)
        case None => u
      }
    case m: MergeIntoTable if m.childrenResolved =>
      graftOf(m.targetTable) match {
        case Some(t) =>
          if (t.t0.nonEmpty || t.t1.nonEmpty)
            sys.error(s"cannot MERGE into a time-travel view of ${t.uri}")
          val bySource = m.notMatchedBySourceActions.map {
            case u: UpdateAction =>
              (u.condition, namedSets(u.assignments, "MERGE BY-SOURCE UPDATE"))
            case _: DeleteAction =>
              sys.error("MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE is " +
                "unsupported: shadowing has no per-row tombstone — use DELETE FROM " +
                "with a predicate")
            case other => sys.error(s"unsupported not-matched-by-source action: $other")
          }
          val matched = m.matchedActions.map {
            case u: UpdateAction => (u.condition, namedSets(u.assignments, "MERGE UPDATE"))
            case _: DeleteAction =>
              sys.error("MERGE ... WHEN MATCHED THEN DELETE is unsupported: " +
                "shadowing has no per-row tombstone — use DELETE FROM with a predicate")
            case other => sys.error(s"unsupported matched action: $other")
          }
          val inserts = m.notMatchedActions.map {
            case in: InsertAction => (in.condition, namedSets(in.assignments, "MERGE INSERT"))
            case other => sys.error(s"unsupported not-matched action: $other")
          }
          GraftMergeCommand(t.uri, m.sourceTable, m.targetTable.output,
            m.sourceTable.output, m.mergeCondition, matched, inserts, bySource)
        case None => m
      }
    case _ => plan
  }
}

/** `spark.readStream.table("cat.ns.arr")`: swap the V2 streaming
  * relation for the fragment-glob file stream
  * ([[graft.streaming.EventStreams.readArrayStream]]) — each committed
  * fragment's files surface as new stream input, so a catalog table is
  * streamable by NAME with no custom MicroBatchStream: offsets,
  * backpressure (`maxFilesPerTrigger`), and recovery are the mature
  * file-source machinery's. Aliased back onto the streaming relation's
  * attribute ids so references above still resolve. CDC semantics:
  * appends surface; tombstones/shadowing do NOT retro-apply to rows
  * already emitted (a stream cannot retract) — the same contract as
  * reading the fragment log directly. */
case class StreamTableRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case s: StreamingRelationV2 if s.table.isInstanceOf[GraftTable] =>
      val t = s.table.asInstanceOf[GraftTable]
      if (t.t0.nonEmpty || t.t1.nonEmpty)
        sys.error(s"cannot stream a time-travel view of ${t.uri}")
      val stream = graft.streaming.EventStreams.readArrayStream(spark, t.uri)
      val resolved = stream.queryExecution.analyzed
      val byName = resolved.output.map(a => a.name -> a).toMap
      val aliases = s.output.map { a =>
        val child = byName.getOrElse(a.name,
          sys.error(s"stream of ${t.uri}: column ${a.name} missing from fragments"))
        org.apache.spark.sql.catalyst.expressions.Alias(child, a.name)(exprId = a.exprId)
      }
      org.apache.spark.sql.catalyst.plans.logical.Project(aliases, resolved)
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

/** SQL `MERGE INTO` under shadowing: matched-UPDATE rows and
  * not-matched-INSERT rows compose into ONE shadow fragment — the CDC
  * upsert, with ONE corpus-scale target scan for the whole
  * matched+insert side (a second only when BY SOURCE actions exist,
  * which are inherently full-table), and MVCC time travel seeing every
  * pre-merge state. Action conditions keep SQL's first-match-wins
  * semantics; a target row matching multiple source rows is a
  * cardinality violation and fails loudly (its shadow result would be
  * nondeterministic).
  *
  * Target and source frequently share column names, so expressions are
  * remapped BY EXPR ID onto positionally prefixed join-side names
  * (`t__i`/`s__i`) — never by bare name. */
case class GraftMergeCommand(uri: String, source: LogicalPlan,
    targetOutput: Seq[Attribute], sourceOutput: Seq[Attribute],
    cond: Expression,
    matched: Seq[(Option[Expression], Seq[(String, Expression)])],
    inserts: Seq[(Option[Expression], Seq[(String, Expression)])],
    bySource: Seq[(Option[Expression], Seq[(String, Expression)])] = Nil)
    extends LeafRunnableCommand {

  private lazy val byId: Map[ExprId, String] =
    (targetOutput.zipWithIndex.map { case (a, i) => a.exprId -> s"t__$i" } ++
      sourceOutput.zipWithIndex.map { case (a, i) => a.exprId -> s"s__$i" }).toMap

  private def remap(e: Expression): Column = Shim.toColumn(e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(byId.getOrElse(a.exprId,
      sys.error(s"MERGE expression references unknown attribute ${a.name}#${a.exprId.id}")))
  })

  /** First-match-wins action application: `__act` = 1-based index of
    * the first action whose condition holds (0 = none), then every
    * output column is a CASE over `__act`. */
  private def applyActions(rows: DataFrame,
      actions: Seq[(Option[Expression], Seq[(String, Expression)])],
      defaultFor: Int => Column): DataFrame = {
    val act = actions.zipWithIndex.foldRight(lit(0)) { case (((c, _), i), els) =>
      when(c.map(remap).getOrElse(lit(true)), lit(i + 1)).otherwise(els)
    }
    val hit = rows.withColumn("__act", act).filter(col("__act") > 0)
    hit.select(targetOutput.zipWithIndex.map { case (a, i) =>
      val cases = actions.zipWithIndex.foldRight(defaultFor(i)) {
        case (((_, sets), ai), els) =>
          sets.find(_._1.equalsIgnoreCase(a.name)) match {
            case Some((_, e)) => when(col("__act") === ai + 1, remap(e)).otherwise(els)
            case None => els
          }
      }
      cases.cast(a.dataType).as(a.name)
    }.toSeq: _*)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val schema = ArrayTable.schemaOf(spark, uri)
    val dimIdx = schema.dimNames.map(d =>
      targetOutput.indexWhere(_.name.equalsIgnoreCase(d)))
    (matched ++ bySource).foreach { case (_, sets) => sets.foreach { case (n, _) =>
      if (schema.dimNames.exists(_.equalsIgnoreCase(n)))
        sys.error(s"cannot MERGE-update dimension '$n' of $uri: cell coordinates " +
          "are immutable")
    } }
    // an INSERT action must place every dimension — an unassigned dim
    // would write a NULL coordinate
    inserts.foreach { case (_, sets) =>
      schema.dimNames.foreach { d =>
        if (!sets.exists(_._1.equalsIgnoreCase(d)))
          sys.error(s"MERGE INSERT must assign dimension '$d' of $uri")
      }
    }
    val tgt0 = ArrayTable.read(spark, uri)
    val tgt = tgt0.select(tgt0.columns.zipWithIndex.map { case (c, i) =>
      col(c).as(s"t__$i") }.toSeq: _*)
    // the source is consumed by three joins (matched, not-matched,
    // by-source); materialize it once so a non-deterministic source
    // query (uuid(), rand(), a shrinking view) cannot produce three
    // different row sets — and the batch-sized recompute is saved
    val src0 = Shim.ofRows(spark, source)
    val src = src0.toDF(sourceOutput.indices.map(i => s"s__$i"): _*)
      .localCheckpoint(true)
    val joinCond = remap(cond)

    // ONE corpus-scale target scan feeds the whole matched side: the
    // joined pairs are match-scale (bounded by source x matches), so
    // they checkpoint cheaply, and the cardinality check, the updated
    // rows, AND the not-matched source (source minus matched source
    // rows, null-safe anti-join on the s__ columns) all derive from it
    // without touching the target again.
    val hitPairs = tgt.join(src, joinCond, "inner").localCheckpoint(true)
    // cardinality check on the matched set (write-sized, not corpus):
    // a target cell fed by two source rows would shadow
    // nondeterministically
    val dupes = hitPairs.groupBy(dimIdx.map(i => col(s"t__$i")): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    if (dupes > 0)
      sys.error(s"MERGE cardinality violation on $uri: a target row matches " +
        "more than one source row")
    val updatedRows = applyActions(hitPairs, matched, i => col(s"t__$i"))

    val matchedSrc = hitPairs
      .select(sourceOutput.indices.map(i => col(s"s__$i")).toSeq: _*).distinct()
    val insertSrc = src.join(matchedSrc,
      sourceOutput.indices.map(i => src(s"s__$i") <=> matchedSrc(s"s__$i"))
        .reduce(_ && _), "left_anti")
    val insertedRows = applyActions(insertSrc, inserts,
      i => lit(null).cast(targetOutput(i).dataType))

    // WHEN NOT MATCHED BY SOURCE ... UPDATE: target rows with no source
    // match, same shadow mechanics (only the DELETE variant is
    // impossible under shadowing)
    val bySourceRows =
      if (bySource.isEmpty) None
      else Some(applyActions(tgt.join(src, joinCond, "left_anti"),
        bySource, i => col(s"t__$i")))

    val out = bySourceRows.foldLeft(updatedRows.unionByName(insertedRows))(_ unionByName _)
    ArrayTable.write(spark, out, uri)
    Seq.empty
  }
}
