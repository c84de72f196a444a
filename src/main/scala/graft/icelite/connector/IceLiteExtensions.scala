package graft.icelite.connector

import graft.icelite.IceLiteTable
import org.apache.spark.sql.{Column, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.graft.SparkShims

/** Session extensions completing the SQL surface over the `icelite`
  * catalog (the reference's Week-4 workflow runs these as Spark SQL,
  * /root/reference/README.md:954–967, 1111–1121):
  *
  * {{{
  * spark.sql.extensions = graft.icelite.connector.IceLiteExtensions
  *
  * UPDATE icelite.db.t SET price = 0 WHERE id % 2 = 0
  * DELETE FROM icelite.db.t WHERE id < 100
  * MERGE INTO icelite.db.t USING src ON t.id = src.id
  *   WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Two post-hoc resolution rules, in order:
  *  1. [[IceLiteDmlRule]] — rewrites resolved UPDATE/DELETE/MERGE plans over
  *     IceLite relations into runnable commands delegating to the table's
  *     copy-on-write / merge-on-read DML (the analyzer-extension route the
  *     DSv2 row-level API also ends at, without its group-coordination
  *     machinery — our DML already rewrites only touched files).
  *  2. [[IceLiteReadSubstitution]] — splices the table's native parquet
  *     scan plan in place of the DSv2 relation for READS, so SQL queries
  *     keep parquet vectorization, pushed filters and whole-stage codegen
  *     instead of crossing the V1 `df.rdd` bridge (row-by-row
  *     InternalRow→Row→InternalRow — ~3× slower at sf0.1).
  */
class IceLiteExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(_ => IceLiteDmlRule)
    ext.injectPostHocResolutionRule(_ => IceLiteReadSubstitution)
  }
}

/** A resolved DML statement over an IceLite table, executed on collect —
  * the standard eager-command shape (EXPLAIN shows it; running it commits
  * one IceLite snapshot). */
case class IceLiteDmlCommand(label: String, table: String)(body: () => Unit)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = { body(); Seq.empty }
  override def simpleString(maxFields: Int): String = s"IceLiteDml $label $table"
  // TreeNode.makeCopy must see the second (curried) constructor arg
  override protected def otherCopyArgs: Seq[AnyRef] = body :: Nil
}

object IceLiteDmlRule extends Rule[LogicalPlan] {

  private def iceTable(p: LogicalPlan): Option[IceLiteTable] = p match {
    case r: DataSourceV2Relation => r.table match {
      case t: IceLiteSparkTable => Some(t.underlying)
      case _                    => None
    }
    case SubqueryAlias(_, child) => iceTable(child)
    case _                       => None
  }

  /** Re-express a resolved expression against the table's own DataFrame:
    * strip qualifiers (they name the catalog relation, not the scan) and
    * round-trip through SQL text so attribute ids re-resolve. Covers every
    * deterministic scalar condition/assignment; subqueries are rejected
    * with a clear error rather than silently mis-planned. */
  private def recol(e: Expression): Column = {
    require(!e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
      s"subqueries in IceLite DML conditions are unsupported: ${e.sql}")
    expr(e.transform { case a: AttributeReference => a.withQualifier(Seq.empty) }.sql)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(target, condition) if d.childrenResolved =>
      iceTable(target).map { t =>
        val cond = recol(condition)
        IceLiteDmlCommand("DELETE", t.location)(() => t.delete(cond))
      }.getOrElse(plan)

    case u: UpdateTable if u.childrenResolved =>
      iceTable(u.table).map { t =>
        val assigns = u.assignments.map { a =>
          val name = a.key match {
            case attr: AttributeReference => attr.name
            case other => sys.error(s"unsupported UPDATE target ${other.sql} (nested fields unsupported)")
          }
          name -> recol(a.value)
        }.toMap
        val cond = u.condition.map(recol).getOrElse(expr("true"))
        IceLiteDmlCommand("UPDATE", t.location)(() => t.update(cond, assigns))
      }.getOrElse(plan)

    case m: MergeIntoTable if m.childrenResolved =>
      iceTable(m.targetTable).map { t =>
        require(m.notMatchedBySourceActions.isEmpty,
          "MERGE: WHEN NOT MATCHED BY SOURCE is unsupported")
        val key = m.mergeCondition match {
          case EqualTo(l: AttributeReference, r: AttributeReference) if l.name == r.name => l.name
          case other => sys.error(
            s"MERGE: only `ON target.k = source.k` (same column name) is supported, got ${other.sql}")
        }
        // resolved star actions expand to one source attribute per target
        // column — verify the expansion is exactly SET * / INSERT *
        def isStar(assignments: Seq[Assignment]): Boolean =
          assignments.forall { a =>
            (a.key, a.value) match {
              case (k: AttributeReference, v: AttributeReference) => k.name == v.name
              case (k: AttributeReference, v) => // aligned default/cast of same-name source col
                v.references.size == 1 && v.references.head.name == k.name
              case _ => false
            }
          }
        (m.matchedActions, m.notMatchedActions) match {
          case (Seq(u: UpdateAction), Seq(i: InsertAction))
              if u.condition.isEmpty && i.condition.isEmpty &&
                isStar(u.assignments) && isStar(i.assignments) => ()
          case _ => sys.error(
            "MERGE: only WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * is supported " +
              s"(got matched=${m.matchedActions}, notMatched=${m.notMatchedActions})")
        }
        val spark = SparkSession.active
        val sourceDf = SparkShims.ofRows(spark, m.sourceTable)
        IceLiteDmlCommand("MERGE", t.location)(() => t.merge(sourceDf, key))
      }.getOrElse(plan)

    case _ => plan
  }
}

/** Replaces read-position IceLite DSv2 relations with the table's own
  * analyzed parquet scan plan (aliased onto the relation's attribute ids).
  * The result is a plain FileSourceScan: Catalyst pushes filters and
  * prunes columns into the parquet reader, rows stay columnar, and the
  * whole query compiles into whole-stage codegen. Write targets
  * (AppendData et al. keep `table` out of `children`) and DML nodes
  * (consumed by [[IceLiteDmlRule]] first) are never substituted.
  *
  * Scale note: the spliced plan enumerates the snapshot's files from the
  * manifest (no directory listing); data skipping happens per-task via
  * parquet row-group stats. The programmatic `IceLiteTable.read(statFilters)`
  * path additionally prunes whole files driver-side from manifest stats —
  * at 100 TB, pair a selective SQL predicate with a partitioned table so
  * partition values land in the file paths Spark prunes natively.
  */
object IceLiteReadSubstitution extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = substitute(plan)

  private def substitute(p: LogicalPlan): LogicalPlan = p match {
    // DML nodes that survive (non-IceLite targets): leave the target
    // relation alone; IceLite ones were already rewritten to commands.
    case d: DeleteFromTable => d
    case u: UpdateTable     => u
    case m: MergeIntoTable  =>
      m.copy(sourceTable = substitute(m.sourceTable))
    case r: DataSourceV2Relation if r.table.isInstanceOf[IceLiteSparkTable] =>
      val tbl = r.table.asInstanceOf[IceLiteSparkTable]
      val scan = SparkShims.analyzedPlan(tbl.baseDf)
      Project(
        r.output.zip(scan.output).map { case (o, a) =>
          Alias(a, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }, scan)
    case other => other.mapChildren(substitute)
  }
}
