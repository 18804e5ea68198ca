package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types.LongType

/** SQL MERGE front for the transactional format (round-15 verdict #10
  * — the one declared-surface gap between "library" and "engine": the
  * lakehouse DML was Scala API calls, unreachable from
  * `spark.sql("MERGE INTO …")`). A resolution rule intercepts the
  * PARSED MergeIntoTable whose target is the `graft_tx` pseudo-catalog
  * (`MERGE INTO graft_tx.`/table/root`` — the path is the identifier,
  * the Delta `delta.`/path`` convention), validates the clause shape,
  * and rewrites it to a runnable command that plans onto
  * [[graft.sources.TxTable.mergeInto]] — so the SQL form and the API
  * form are THE SAME transaction: one commit, same per-file pruning,
  * same OCC retry, same constraint / unique-key enforcement, bit-equal
  * results (q365 pins it against the API form and the relational
  * oracle). Validation and SQL-stringification happen HERE, at rule
  * time: the rewritten command carries only plain data, so
  * CheckAnalysis never sees the (deliberately unresolved — the target
  * is not a catalog table) MERGE expressions.
  *
  * Supported clause shape = exactly the semantics `mergeInto` defines:
  *
  * {{{
  *   MERGE INTO graft_tx.`<root>` [AS t]
  *   USING <source> [AS s]
  *   ON t.<key> = s.<key>                 -- the log-declared key
  *   [WHEN MATCHED AND <cond> THEN DELETE]
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Anything else (column-level assignments, NOT MATCHED BY SOURCE,
  * non-key ON conditions) fails loudly rather than silently diverging
  * from the library semantics.
  */
case class GraftMergeRule(session: SparkSession) extends Rule[LogicalPlan] {
  private def txRoot(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => txRoot(child)
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft_tx") =>
      Some(u.multipartIdentifier(1))
    case _ => None
  }

  private def lastName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case a: Attribute => Some(a.name)
    case _ => None
  }

  /** Qualifiers are stripped before re-resolving a clause condition
    * against the bare source frame: the SQL form writes `s.st = 'DEL'`
    * but mergeInto evaluates deleteWhen over the delta's own columns.
    */
  private def strip(e: Expression): Expression = e.transform {
    case a: UnresolvedAttribute => UnresolvedAttribute(Seq(a.nameParts.last))
  }

  private def toCommand(root: String, m: MergeIntoTable): GraftMergeCommand = {
    val key = graft.sources.TxTable.tableMeta(session, root).key
    m.mergeCondition match {
      case EqualTo(l, r) if lastName(l).contains(key) &&
        lastName(r).contains(key) => ()
      case other => throw new UnsupportedOperationException(
        s"graft_tx MERGE supports ON <target>.$key = <source>.$key " +
          s"(the log-declared key) only, got: ${other.sql}")
    }
    var deleteWhen: Option[String] = None
    var sawUpdateStar = false
    m.matchedActions.foreach {
      case DeleteAction(c) =>
        require(deleteWhen.isEmpty, "graft_tx MERGE: one DELETE clause only")
        deleteWhen = Some(c.map(x => strip(x).sql).getOrElse("true"))
      case UpdateStarAction(None) => sawUpdateStar = true
      case other: MergeAction => throw new UnsupportedOperationException(
        "graft_tx MERGE: matched clauses must be UPDATE SET * and/or " +
          s"[AND-conditioned] DELETE, got: $other")
    }
    require(sawUpdateStar || deleteWhen.isDefined,
      "graft_tx MERGE needs at least one WHEN MATCHED clause")
    // ANSI semantics: an UNCONDITIONAL `WHEN NOT MATCHED THEN INSERT *`
    // inserts EVERY unmatched source row — including delete-flagged
    // ones (the matched-DELETE condition only applies when matched) —
    // so it maps to insertWhen = true, NOT the library default's
    // CDC-pragmatic ghost no-op. `AND <cond>` maps straight through.
    val insertWhen = m.notMatchedActions match {
      case Seq(InsertStarAction(c)) => c.map(x => strip(x).sql).getOrElse("true")
      case other => throw new UnsupportedOperationException(
        s"graft_tx MERGE: the not-matched clause must be " +
          s"[AND-conditioned] INSERT *, got: $other")
    }
    require(m.notMatchedBySourceActions.isEmpty,
      "graft_tx MERGE: WHEN NOT MATCHED BY SOURCE is not supported")
    GraftMergeCommand(root, m.sourceTable, deleteWhen, insertWhen)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable =>
      txRoot(m.targetTable).map(toCommand(_, m)).getOrElse(plan)
    // SQL DELETE: DELETE FROM graft_tx.`root` WHERE <pred> — the
    // predicate re-resolves against the snapshot frame at run time
    // (qualifiers stripped), its matching KEYS feed the library's
    // copy-on-write delete. An omitted WHERE is a full-table delete —
    // refused, the standard lakehouse guard (TRUNCATE is a different
    // intent than an unbounded COW rewrite).
    case d: DeleteFromTable =>
      txRoot(d.table) match {
        case Some(root) =>
          require(d.condition != null &&
            !d.condition.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal],
            "graft_tx DELETE requires a WHERE predicate")
          GraftDeleteCommand(root, strip(d.condition).sql)
        case None => plan
      }
    // SQL UPDATE: UPDATE graft_tx.`root` SET c = <expr> [WHERE <pred>]
    // — all assignment RHS evaluate SIMULTANEOUSLY against the OLD row
    // (standard UPDATE semantics), and the updated rows land through
    // mergeInto's upsert leg (same transaction/pruning/OCC as MERGE).
    case u: UpdateTable =>
      txRoot(u.table) match {
        case Some(root) =>
          val sets = u.assignments.map { case Assignment(k, v) =>
            val name = lastName(k).getOrElse(throw new UnsupportedOperationException(
              s"graft_tx UPDATE: unsupported assignment target ${k.sql}"))
            name -> strip(v).sql
          }
          GraftUpdateCommand(root, sets, u.condition.map(c => strip(c).sql))
        case None => plan
      }
    // SQL SELECT: any graft_tx relation ANYWHERE in the plan resolves
    // to the connector read (full stats pruning, MOR subtraction,
    // commit_version audit column). `graft_tx.`/root@vN`` is VERSION
    // AS OF N — the Delta `table@vN` time-travel spelling — so the
    // whole read surface (snapshot, time travel, joins across tables)
    // is plain spark.sql.
    case _ => plan.transformUp {
      case u: UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase("graft_tx") =>
        readPlan(u.multipartIdentifier(1))
    }
  }

  private def readPlan(spec: String): LogicalPlan = {
    val at = spec.lastIndexOf("@v")
    val (path, version) =
      if (at > 0 && at + 2 < spec.length &&
        spec.substring(at + 2).forall(_.isDigit))
        (spec.substring(0, at), spec.substring(at + 2))
      else (spec, null)
    val r = session.read.format("graft-txtable").option("root", path)
    val df = (if (version != null) r.option("versionAsOf", version) else r).load()
    df.queryExecution.logical
  }
}

/** The rewritten MERGE: plain data only (root path, the USING plan,
  * the pre-stringified delete condition) — validation happened at rule
  * time. Runs the library transaction; output is the
  * (rewritten_files, carried_files) pruning pair — the same observable
  * the API returns.
  */
case class GraftMergeCommand(root: String, source: LogicalPlan,
                             deleteWhenSql: Option[String],
                             insertWhenSql: String)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("rewritten_files", LongType, nullable = false)(),
    AttributeReference("carried_files", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val delta = org.apache.spark.sql.graftshim.GraftSqlBridge
      .ofRows(session, source)
    val dw = deleteWhenSql.map(expr).getOrElse(lit(false))
    val (rw, co) = graft.sources.TxTable.mergeInto(session, root, delta, dw,
      insertWhen = Some(expr(insertWhenSql)))
    Seq(Row(rw.toLong, co.toLong))
  }
}

/** SQL DELETE rewritten at rule time: the predicate's matching keys
  * (one filtered read of the snapshot — predicate pushdown applies)
  * feed [[graft.sources.TxTable.delete]]'s pruned copy-on-write.
  */
case class GraftDeleteCommand(root: String, condSql: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("rewritten_files", LongType, nullable = false)(),
    AttributeReference("carried_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val meta = graft.sources.TxTable.tableMeta(session, root)
    val keys = graft.sources.TxTable.snapshot(session, root)
      .filter(expr(condSql)).select(meta.key)
    val (rw, co) = graft.sources.TxTable.delete(session, root, keys)
    Seq(Row(rw.toLong, co.toLong))
  }
}

/** SQL UPDATE rewritten at rule time: the matching rows with every
  * assignment evaluated simultaneously against the OLD row land
  * through [[graft.sources.TxTable.mergeInto]]'s upsert leg — same
  * transaction, pruning and OCC as MERGE.
  */
case class GraftUpdateCommand(root: String, sets: Seq[(String, String)],
                              condSql: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("rewritten_files", LongType, nullable = false)(),
    AttributeReference("carried_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val meta = graft.sources.TxTable.tableMeta(session, root)
    val setMap = sets.toMap
    require(!setMap.contains(meta.key),
      s"graft_tx UPDATE must not assign the key column '${meta.key}'")
    val snap = graft.sources.TxTable.snapshot(session, root)
    val matched = condSql.map(c => snap.filter(expr(c))).getOrElse(snap)
    val delta = matched.select(meta.schema.fieldNames.toSeq.map(c =>
      setMap.get(c).map(sql => expr(sql).as(c))
        .getOrElse(org.apache.spark.sql.functions.col(c))): _*)
    val (rw, co) = graft.sources.TxTable.mergeInto(session, root, delta,
      deleteWhen = lit(false))
    Seq(Row(rw.toLong, co.toLong))
  }
}
