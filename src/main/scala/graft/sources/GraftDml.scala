package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, Expression, GetStructField, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.ingest.Snapshots

/** SQL row-level DML on graft tables: `UPDATE t SET … WHERE …` and the
  * full three-clause `MERGE INTO` — the Delta-style route. Spark's own
  * analyzer resolves `UpdateTable` / `MergeIntoTable` (references,
  * star-expansion, type coercion) but only REWRITES them for tables
  * implementing `SupportsRowLevelOperations`; for anything else the
  * nodes reach the planner and throw. This post-hoc resolution rule
  * (installed by [[graft.GraftExtensions]]) intercepts the resolved
  * nodes over graft tables and lowers them to commands that run the
  * copy-on-write primitives ([[Snapshots.updateWhere]] /
  * [[Snapshots.mergeInto]]) — the exact interception point Delta used
  * for years before row-level operations existed.
  *
  * Expression hand-off: clause conditions and SET values arrive as
  * RESOLVED catalyst expressions against the relation's attributes,
  * but the primitives re-read the matched files into fresh frames with
  * fresh attribute ids — so expressions cross as SQL TEXT, re-resolved
  * by name. Target attributes keep their names; MERGE source
  * attributes are renamed into the [[Snapshots.SrcColPrefix]]
  * namespace (both sides of a merge may share column names — `t.id` vs
  * `s.id` — and text has no exprIds). Subqueries don't survive
  * textualization and are refused up front; everything else
  * (functions, casts, literals, conjunctions) round-trips exactly.
  *
  * Scale: both commands rewrite only the files that contain affected
  * rows (manifest-attributed, like DELETE) — a 10-row UPDATE against a
  * 100 TB table rewrites a handful of files; WHEN NOT MATCHED BY
  * SOURCE is the one clause that must see every target row and widens
  * the rewrite accordingly. */
object GraftDml extends Rule[LogicalPlan] {

  private def graftTable(plan: LogicalPlan): Option[GraftTable] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable if t.pinnedVersion.isEmpty => Some(t)
        case _ => None
      }
      case _ => None
    }

  private def refuse(e: Expression): Unit = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        "graft DML: subqueries in UPDATE/MERGE conditions or values are not supported")
    ()
  }

  /** Resolved expression → SQL text, with source-side attributes moved
    * into the `_graft_src_` namespace (target attrs keep their name). */
  private def toSql(e: Expression, srcAttrs: AttributeSet): String = {
    refuse(e)
    e.transform {
      // strip qualifiers (`spark_catalog`.`default`.`t`.`ba` won't
      // re-resolve against the primitives' fresh frames) and move
      // source attrs into their namespace
      case a: AttributeReference if srcAttrs.contains(a) =>
        a.withName(Snapshots.SrcColPrefix + a.name).withQualifier(Seq.empty)
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql
  }

  private def keyName(key: Expression): String = key match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      s"graft DML: only top-level column assignment is supported, got ${other.sql}")
  }

  /** Assignment key → column path: `s.a.b` resolves to nested
    * GetStructField extractions over the column attribute. Arrays and
    * maps are not assignable sub-paths. */
  private def keyPath(key: Expression): Seq[String] = key match {
    case a: AttributeReference => Seq(a.name)
    case g: GetStructField => keyPath(g.child) :+ g.extractFieldName
    case other => throw new UnsupportedOperationException(
      s"graft DML: unsupported assignment target ${other.sql} — " +
        "only columns and struct fields are assignable")
  }

  /** Nested assignments lowered to TOP-LEVEL ones: every sub-path set
    * on a struct column becomes one `named_struct(…)` value over the
    * PRE-image (unassigned fields copy through by reference), so the
    * primitives' simultaneous-assignment contract is untouched — all
    * lowered values still evaluate against the old row in one select.
    * Assigning a field of a NULL struct yields a NON-null struct with
    * the other fields null (Delta's nested-update semantics — the
    * field extraction on the null parent is null). Conflicts (a path
    * and its prefix both assigned, or one path assigned twice) are
    * refused, matching the SQL standard's ambiguity rule. */
  private def lowerAssignments(assigns: Seq[(Seq[String], String)],
                               schema: StructType): Seq[(String, String)] = {
    def quote(n: String) = "`" + n.replace("`", "``") + "`"
    def build(prefixSql: String, st: StructType,
              subs: Seq[(Seq[String], String)]): String = {
      val byHead = subs.groupBy(_._1.head)
      byHead.keys.foreach { f =>
        if (!st.fieldNames.contains(f)) throw new UnsupportedOperationException(
          s"graft DML: no field '$f' under $prefixSql")
      }
      "named_struct(" + st.fields.map { f =>
        val lit = s"'${f.name}'"
        val self = s"$prefixSql.${quote(f.name)}"
        byHead.get(f.name) match {
          case None => s"$lit, $self"
          case Some(Seq((path, v))) if path.length == 1 => s"$lit, ($v)"
          case Some(list) =>
            if (list.exists(_._1.length == 1)) throw new UnsupportedOperationException(
              s"graft DML: conflicting assignments to '$self' and its sub-fields")
            f.dataType match {
              case inner: StructType =>
                s"$lit, ${build(self, inner, list.map { case (p, v) => (p.tail, v) })}"
              case other => throw new UnsupportedOperationException(
                s"graft DML: cannot assign into ${other.simpleString} at $self")
            }
        }
      }.mkString(", ") + ")"
    }
    assigns.groupBy(_._1.head).toSeq.map {
      case (col, Seq((path, v))) if path.length == 1 => (col, v)
      case (col, list) =>
        if (list.exists(_._1.length == 1)) throw new UnsupportedOperationException(
          s"graft DML: conflicting assignments to '$col' and its sub-fields")
        schema.find(_.name == col).map(_.dataType) match {
          case Some(st: StructType) =>
            (col, build(quote(col), st, list.map { case (p, v) => (p.tail, v) }))
          case Some(other) => throw new UnsupportedOperationException(
            s"graft DML: cannot assign into ${other.simpleString} column '$col'")
          case None => throw new UnsupportedOperationException(
            s"graft DML: unknown column '$col'")
        }
    }
  }

  /** Advisory stat-pruning bounds from the UPDATE predicate's
    * attr-vs-literal comparisons, as V1 filters ([[GraftSource
    * .toRanges]] owns the key encoding). Conjuncts that don't map are
    * simply not used for pruning — the exact predicate still decides
    * row membership, so this can only narrow IO, never semantics. */
  private def rangeFilters(cond: Expression): Seq[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.{sources => v1}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // the analyzer wraps literals in casts (`ba >= CAST(20 AS
    // BIGINT)`) and this rule runs pre-optimizer, so fold any
    // constant side rather than pattern-matching bare Literals;
    // internal string values (UTF8String) normalize to java String
    // for the V1 filter encoding
    def litOf(e: Expression): Option[Any] =
      if (e.foldable)
        Option(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)).map {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case x => x
        }
      else None
    conjuncts(cond).flatMap {
      case EqualTo(a: AttributeReference, r) if litOf(r).isDefined =>
        Some(v1.EqualTo(a.name, litOf(r).get))
      case EqualTo(l, a: AttributeReference) if litOf(l).isDefined =>
        Some(v1.EqualTo(a.name, litOf(l).get))
      case GreaterThan(a: AttributeReference, r) if litOf(r).isDefined =>
        Some(v1.GreaterThan(a.name, litOf(r).get))
      case GreaterThan(l, a: AttributeReference) if litOf(l).isDefined =>
        Some(v1.LessThan(a.name, litOf(l).get))
      case GreaterThanOrEqual(a: AttributeReference, r) if litOf(r).isDefined =>
        Some(v1.GreaterThanOrEqual(a.name, litOf(r).get))
      case GreaterThanOrEqual(l, a: AttributeReference) if litOf(l).isDefined =>
        Some(v1.LessThanOrEqual(a.name, litOf(l).get))
      case LessThan(a: AttributeReference, r) if litOf(r).isDefined =>
        Some(v1.LessThan(a.name, litOf(r).get))
      case LessThan(l, a: AttributeReference) if litOf(l).isDefined =>
        Some(v1.GreaterThan(a.name, litOf(l).get))
      case LessThanOrEqual(a: AttributeReference, r) if litOf(r).isDefined =>
        Some(v1.LessThanOrEqual(a.name, litOf(r).get))
      case LessThanOrEqual(l, a: AttributeReference) if litOf(l).isDefined =>
        Some(v1.GreaterThanOrEqual(a.name, litOf(l).get))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(table, assignments, condition) if u.resolved =>
      graftTable(table) match {
        case Some(t) =>
          val condSql = condition.map(toSql(_, AttributeSet.empty)).getOrElse("true")
          val sets = lowerAssignments(assignments.map(a =>
            (keyPath(a.key), toSql(a.value, AttributeSet.empty))),
            EliminateSubqueryAliases(table).schema)
          GraftUpdateCommand(t.root, t.prefix, condSql, sets,
            condition.map(rangeFilters).getOrElse(Seq.empty))
        case None => u
      }

    case m: MergeIntoTable if m.resolved =>
      graftTable(m.targetTable) match {
        case Some(t) =>
          // WITH SCHEMA EVOLUTION needs no handling here: GraftTable
          // declares AUTOMATIC_SCHEMA_EVOLUTION, so the analyzer's own
          // ResolveMergeIntoSchemaEvolution has ALREADY routed the new
          // source columns through the catalog's alterTable (a
          // metadata-only addColumn commit) and re-loaded the relation
          // by the time this node is resolved — the target schema seen
          // below is the evolved one.
          val srcAttrs = AttributeSet(m.sourceTable.output)
          val dupSrc = m.sourceTable.output.groupBy(_.name).filter(_._2.size > 1).keys
          if (dupSrc.nonEmpty) throw new UnsupportedOperationException(
            s"graft MERGE: duplicate source column name(s): ${dupSrc.mkString(", ")}")
          val targetSchema0 = EliminateSubqueryAliases(m.targetTable).schema
          def clause(a: MergeAction): Snapshots.MergeClause = a match {
            case UpdateAction(c, assigns, _) => Snapshots.MergeClause(
              c.map(toSql(_, srcAttrs)),
              Some(lowerAssignments(assigns.map(asn =>
                (keyPath(asn.key), toSql(asn.value, srcAttrs))), targetSchema0)))
            case DeleteAction(c) =>
              Snapshots.MergeClause(c.map(toSql(_, srcAttrs)), None)
            case InsertAction(c, assigns) => Snapshots.MergeClause(
              c.map(toSql(_, srcAttrs)),
              Some(assigns.map(asn => (keyName(asn.key), toSql(asn.value, srcAttrs)))))
            case other => throw new UnsupportedOperationException(
              s"graft MERGE: unsupported action ${other.getClass.getSimpleName}")
          }
          // equi conjuncts (t.c = s.c2) feed the primitive's stage-1
          // manifest pruning — a small MERGE against a huge table
          // attributes against stat-bounded candidate files only
          def conjuncts(e: Expression): Seq[Expression] = e match {
            case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
              conjuncts(l) ++ conjuncts(r)
            case other => Seq(other)
          }
          val equiKeys = conjuncts(m.mergeCondition).collect {
            case org.apache.spark.sql.catalyst.expressions.EqualTo(
                a: AttributeReference, b: AttributeReference)
              if !srcAttrs.contains(a) && srcAttrs.contains(b) =>
              (a.name, Snapshots.SrcColPrefix + b.name)
            case org.apache.spark.sql.catalyst.expressions.EqualTo(
                a: AttributeReference, b: AttributeReference)
              if srcAttrs.contains(a) && !srcAttrs.contains(b) =>
              (b.name, Snapshots.SrcColPrefix + a.name)
          }
          GraftMergeCommand(t.root, t.prefix, m.sourceTable,
            toSql(m.mergeCondition, srcAttrs),
            m.matchedActions.map(clause),
            m.notMatchedActions.map(clause),
            m.notMatchedBySourceActions.map(clause),
            EliminateSubqueryAliases(m.targetTable).schema, equiKeys)
        case None => m
      }
  }
}

/** `UPDATE t SET c = v, … WHERE p` lowered to the copy-on-write
  * [[Snapshots.updateWhere]] — only files containing matched rows are
  * rewritten; simultaneous-assignment semantics; pre/post images on
  * the change feed. */
case class GraftUpdateCommand(root: String, prefix: String,
                              condSql: String,
                              sets: Seq[(String, String)],
                              pruning: Seq[org.apache.spark.sql.sources.Filter])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Snapshots.updateWhere(spark, root, prefix,
      org.apache.spark.sql.functions.expr(condSql),
      sets.map { case (c, v) => (c, org.apache.spark.sql.functions.expr(v)) },
      ranges = pruning.flatMap(GraftSource.toRanges))
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON cond WHEN …` lowered to
  * [[Snapshots.mergeInto]]. The source rides as its resolved logical
  * plan and is evaluated (then renamed into the `_graft_src_`
  * namespace) at run time — Delta's MergeIntoCommand shape. */
case class GraftMergeCommand(root: String, prefix: String,
                             source: LogicalPlan, condSql: String,
                             matched: Seq[Snapshots.MergeClause],
                             notMatched: Seq[Snapshots.MergeClause],
                             notMatchedBySource: Seq[Snapshots.MergeClause],
                             targetSchema: StructType,
                             equiKeys: Seq[(String, String)])
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val srcRaw = org.apache.spark.sql.GraftStreamingShim.ofRows(spark, source)
    val src = srcRaw.select(srcRaw.columns.map(c =>
      col(c).as(Snapshots.SrcColPrefix + c)): _*)
    Snapshots.mergeInto(spark, root, prefix, src, condSql,
      matched, notMatched, notMatchedBySource, targetSchema,
      equiKeys = equiKeys)
    Seq.empty
  }
}
