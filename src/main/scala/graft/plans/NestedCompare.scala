package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.{NestedCmp, NestedCmpExpr, NestedEqSafeExpr}

/** Nested-type comparisons take duck's CONTEXT-SENSITIVE semantics
  * (r15, eleventh fuzz mode — nested-NULL scout, all cells probed on
  * the 1.0.0 replica):
  *
  *  - VALUE context (projections, IS NULL operands, anything whose
  *    boolean RESULT is materialized): duck's Execute path — the
  *    three-valued lexicographic walk. `[1,NULL] = [1,NULL]` is NULL;
  *    Spark's native NULLs-equal ordering says true — a silent wrong
  *    answer — and refuses MAP operands outright where duck compares
  *    them entry-wise, order-sensitively.
  *  - SELECT context (filter / join / CASE / IF predicates, where the
  *    boolean only BRANCHES): duck's Select path — the NULL-HIGH total
  *    order with top-level-NULL operands never matching. For `=` and
  *    `<>` over arrays/structs this is EXACTLY Spark's native behavior
  *    (ordering equality + top-null propagation), so equality conjuncts
  *    are left native and every equi-join extraction / pushdown keeps
  *    working; only the ORDERINGS (`<` `<=` `>` `>=`) differ (Spark
  *    ranks inner NULLs lowest, duck highest) and take the kernel's
  *    total mode.
  *
  * Fires ONLY when the operand type needs it: any MAP anywhere in the
  * type (Spark would throw), or a NULLABLE leaf anywhere under the
  * nesting (semantics differ). Literal-built arrays like [1,2] type as
  * containsNull=false and keep Spark's native codegen comparison — the
  * hot relational paths are untouched. `IN` (and IN-subquery semi
  * joins) match NULLs-equal in duck's Select path = Spark native; the
  * VALUE-context `IN` expands to a 3VL OR chain. IS [NOT] DISTINCT
  * FROM over arrays/structs already matches duck natively and is
  * rewritten only for MAPs. Resolution-time: map compares must rewrite
  * before CheckAnalysis refuses them, and foldable nested compares
  * must constant-fold with duck semantics.
  *
  * Documented residuals (divergence register): row-level ORDER BY and
  * min/max over nested values with inner NULLs keep Spark's NULL-low
  * ordering (duck ranks them high) — closing those would need
  * order-preserving sort-key encodings; adjudicated as rare. */
object NestedCompare extends Rule[LogicalPlan] {
  private def isNested(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: StructType | _: MapType => true
    case _ => false
  }
  private def hasMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case ArrayType(et, _) => hasMap(et)
    case st: StructType => st.fields.exists(f => hasMap(f.dataType))
    case _ => false
  }
  /** a NULL can appear at some leaf under the top-level value */
  private def nullableLeaf(dt: DataType): Boolean = dt match {
    case ArrayType(et, cn) => cn || nullableLeaf(et)
    case st: StructType => st.fields.exists(f => f.nullable || nullableLeaf(f.dataType))
    case MapType(_, vt, vn) => vn || nullableLeaf(vt)
    case _ => false
  }
  private def needs(dt: DataType): Boolean =
    isNested(dt) && (hasMap(dt) || nullableLeaf(dt))
  /** duck widens numerically-mismatched nested comparison operands
    * (`[1.5] < [CAST('nan' AS DOUBLE)]` — decimal array vs double
    * array — binds at double); Spark refuses with BINARY_OP_DIFF_TYPES.
    * Insert the widening casts so the comparison binds like duck; the
    * recursive wider-type computation is Spark's own (it already
    * handles arrays/structs for CASE/IN — just not for comparisons). */
  private def widenMismatch(c: BinaryComparison): Option[Expression] = {
    val (l, r) = (c.left, c.right)
    if (!(l.resolved && r.resolved && isNested(l.dataType) && isNested(r.dataType) &&
        !DataType.equalsStructurally(l.dataType, r.dataType, ignoreNullability = true)))
      return None
    org.apache.spark.sql.catalyst.analysis.TypeCoercion
      .findWiderTypeForTwo(l.dataType, r.dataType)
      .filter(w => Cast.canCast(l.dataType, w) && Cast.canCast(r.dataType, w))
      .map { w =>
        c.withNewChildren(Seq(
          if (DataType.equalsStructurally(l.dataType, w, ignoreNullability = true)) l
          else Cast(l, w),
          if (DataType.equalsStructurally(r.dataType, w, ignoreNullability = true)) r
          else Cast(r, w)))
      }
  }
  private def ready(l: Expression, r: Expression): Boolean =
    l.resolved && r.resolved && needs(l.dataType) &&
      DataType.equalsStructurally(l.dataType, r.dataType, ignoreNullability = true)

  /** duck Select-path equality over MAPs: NULLs-equal total match with
    * top-level NULLs never matching. */
  private def mapSelectEq(l: Expression, r: Expression): Expression =
    And(And(IsNotNull(l), IsNotNull(r)), NestedEqSafeExpr(l, r))

  /** VALUE context: duck's Execute path (3VL kernel); CASE/IF
    * predicates nested inside are still SELECT context (duck's case
    * executor selects its WHEN conditions — probed: a CONSTANT
    * `CASE WHEN [NULL,5] > [9,1]` keeps total semantics even inside a
    * WHERE, while the same comparison BARE in the WHERE folds 3VL). */
  private def rewriteValue(e: Expression): Expression = e match {
    case c: BinaryComparison if widenMismatch(c).isDefined =>
      rewriteValue(widenMismatch(c).get)
    case cw: CaseWhen =>
      cw.copy(
        branches = cw.branches.map { case (c, v) =>
          (rewriteSelect(c, foldCtx = false), rewriteValue(v)) },
        elseValue = cw.elseValue.map(rewriteValue))
    case If(p, t, f) =>
      If(rewriteSelect(p, foldCtx = false), rewriteValue(t), rewriteValue(f))
    case EqualTo(l, r) if ready(l, r) =>
      NestedCmpExpr(rewriteValue(l), rewriteValue(r), NestedCmp.OpEq)
    case LessThan(l, r) if ready(l, r) =>
      NestedCmpExpr(rewriteValue(l), rewriteValue(r), NestedCmp.OpLt)
    case LessThanOrEqual(l, r) if ready(l, r) =>
      NestedCmpExpr(rewriteValue(l), rewriteValue(r), NestedCmp.OpLe)
    case GreaterThan(l, r) if ready(l, r) =>
      NestedCmpExpr(rewriteValue(l), rewriteValue(r), NestedCmp.OpGt)
    case GreaterThanOrEqual(l, r) if ready(l, r) =>
      NestedCmpExpr(rewriteValue(l), rewriteValue(r), NestedCmp.OpGe)
    case EqualNullSafe(l, r)
        if l.resolved && r.resolved && hasMap(l.dataType) &&
          DataType.equalsStructurally(l.dataType, r.dataType, ignoreNullability = true) =>
      NestedEqSafeExpr(rewriteValue(l), rewriteValue(r))
    case In(v, items)
        if v.resolved && items.nonEmpty && items.forall(_.resolved) &&
          needs(v.dataType) &&
          items.forall(i => DataType.equalsStructurally(
            v.dataType, i.dataType, ignoreNullability = true)) =>
      items.map(i => NestedCmpExpr(rewriteValue(v), rewriteValue(i),
          NestedCmp.OpEq): Expression)
        .reduceLeft(Or)
    case other => other.mapChildren(rewriteValue)
  }

  /** SELECT context: duck's Select path. Boolean structure stays in
    * Select context; any other node drops to VALUE context.
    *
    * `foldCtx=true` (Filter/Join conditions): duck's optimizer
    * constant-folds the condition's boolean structure with the EXECUTE
    * (3VL) path — probed: a fully-constant `WHERE [NULL,5] > [9,1]`
    * keeps 0 rows while the column-dependent twin keeps all — so
    * FOLDABLE comparisons there take the value form. The flag drops to
    * false through CASE/IF predicates (duck's case executor Selects its
    * conditions even inside a folded filter — probed). */
  private def rewriteSelect(e: Expression, foldCtx: Boolean): Expression = e match {
    case c: BinaryComparison if widenMismatch(c).isDefined =>
      rewriteSelect(widenMismatch(c).get, foldCtx)
    case And(a, b) => And(rewriteSelect(a, foldCtx), rewriteSelect(b, foldCtx))
    case Or(a, b) => Or(rewriteSelect(a, foldCtx), rewriteSelect(b, foldCtx))
    case Not(x) => Not(rewriteSelect(x, foldCtx))
    case c @ BinaryComparison(l, r)
        if ready(l, r) && foldCtx && l.foldable && r.foldable =>
      rewriteValue(c)
    case In(v, items)
        if foldCtx && v.resolved && v.foldable && items.nonEmpty &&
          items.forall(i => i.resolved && i.foldable) && needs(v.dataType) &&
          items.forall(i => DataType.equalsStructurally(
            v.dataType, i.dataType, ignoreNullability = true)) =>
      rewriteValue(In(v, items))
    case EqualTo(l, r) if ready(l, r) =>
      if (hasMap(l.dataType)) mapSelectEq(rewriteValue(l), rewriteValue(r))
      // native: ordering equality + top-null propagation = duck Select
      else EqualTo(rewriteValue(l), rewriteValue(r))
    case LessThan(l, r) if ready(l, r) =>
      NestedCmpExpr(rewriteValue(l), rewriteValue(r), NestedCmp.OpLt, total = true)
    case LessThanOrEqual(l, r) if ready(l, r) =>
      NestedCmpExpr(rewriteValue(l), rewriteValue(r), NestedCmp.OpLe, total = true)
    case GreaterThan(l, r) if ready(l, r) =>
      NestedCmpExpr(rewriteValue(l), rewriteValue(r), NestedCmp.OpGt, total = true)
    case GreaterThanOrEqual(l, r) if ready(l, r) =>
      NestedCmpExpr(rewriteValue(l), rewriteValue(r), NestedCmp.OpGe, total = true)
    case EqualNullSafe(l, r)
        if l.resolved && r.resolved && hasMap(l.dataType) &&
          DataType.equalsStructurally(l.dataType, r.dataType, ignoreNullability = true) =>
      NestedEqSafeExpr(rewriteValue(l), rewriteValue(r))
    case In(v, items)
        if v.resolved && items.nonEmpty && items.forall(_.resolved) &&
          needs(v.dataType) &&
          items.forall(i => DataType.equalsStructurally(
            v.dataType, i.dataType, ignoreNullability = true)) =>
      // duck's Select-path IN matches NULLs-equal per alternative =
      // Spark native for arrays/structs; maps take the Select-eq chain
      if (hasMap(v.dataType))
        items.map(i => mapSelectEq(rewriteValue(v), rewriteValue(i)))
          .reduceLeft(Or)
      else In(rewriteValue(v), items.map(rewriteValue))
    case other => rewriteValue(other)
  }

  /** Cheap allocation-free pre-scan: does ANY expression in the plan
    * carry a comparison/IN over a rewrite-eligible nested operand? The
    * analyzer invokes resolution rules to fixpoint on EVERY query —
    * without this gate the context-tracking rewrite rebuilds each
    * CASE/Filter/Join tree per iteration, a measurable diffuse tax on
    * the 300 sub-second relational entries (quiet-sweep A/B, r15). */
  private def hasCandidate(plan: LogicalPlan): Boolean = {
    var found = false
    plan.foreach { node =>
      if (!found) node.expressions.foreach { root =>
        if (!found) root.foreach {
          case c: BinaryComparison
              if c.left.resolved && (needs(c.left.dataType) ||
                (c.right.resolved && isNested(c.left.dataType) &&
                  isNested(c.right.dataType) &&
                  !DataType.equalsStructurally(
                    c.left.dataType, c.right.dataType, ignoreNullability = true))) =>
            found = true
          case In(v, _) if v.resolved && needs(v.dataType) => found = true
          case _ =>
        }
      }
    }
    found
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!hasCandidate(plan)) plan
    else plan.transformUp {
      case f: Filter =>
        f.copy(condition = rewriteSelect(f.condition, foldCtx = true))
      case j: Join if j.condition.isDefined =>
        j.copy(condition = j.condition.map(rewriteSelect(_, foldCtx = true)))
      // mapExpressions, not transformExpressions: rewriteValue recurses
      // itself with context tracking — a blanket transform would re-visit
      // CASE predicates OUTSIDE their Select context and flip them to 3VL.
      // No e.resolved pre-guard: EqualTo over maps is UNRESOLVED by
      // definition (its own type-check refuses maps) — the per-case
      // l.resolved/r.resolved guards are the correct gate.
      case other => other.mapExpressions(rewriteValue)
    }
}
