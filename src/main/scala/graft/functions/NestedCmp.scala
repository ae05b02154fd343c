package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types._

/** DuckDB's comparison semantics over NESTED types (r15, eleventh fuzz
  * mode — nested-NULL scout). Two distinct comparators, probed on the
  * 1.0.0 replica:
  *
  * 1. [[NestedCmp.cmp3]] — the THREE-VALUED comparison backing
  *    `=`/`<>`/`<`/`<=`/`>`/`>=`/`IN` expressions. Duck walks
  *    lexicographically and STOPS at the first position whose element
  *    comparison is UNKNOWN (either side NULL), returning SQL NULL even
  *    when a later position could decide (`[NULL,1] = [NULL,2]` is
  *    NULL, not false); a decisive earlier position wins
  *    (`[1,NULL] = [2,NULL]` is false, `[1,NULL] < [2]` is true); a
  *    list running out decides by length WITHOUT touching the remaining
  *    elements (`[1] < [1,NULL]` is true). Structs walk fields the same
  *    way; MAPs compare as their entry lists — ORDER-SENSITIVE
  *    (`MAP{'a':1,'b':2} = MAP{'b':2,'a':1}` is false in duck).
  *    Spark's native ordering-based equality answers true/false with
  *    NULLs-equal — a silent wrong answer on every nested comparison
  *    whose data carries an inner NULL, and an AnalysisException on any
  *    map comparison.
  *
  * 2. [[NestedCmp.cmpTotal]] — the TOTAL order backing list_sort, where
  *    an inner NULL ranks HIGHER than any value (duck:
  *    `list_sort([[1,NULL],[1,2],[NULL]])` is [[1,2],[1,NULL],[NULL]];
  *    Spark's ordering ranks NULL lowest). Top-level NULL entries are
  *    placed by the NULLS FIRST/LAST flag, not by this order.
  *
  * Documented residuals (divergence register): row-level ORDER BY and
  * min/max over nested values with inner NULLs keep Spark's NULL-low
  * ordering (duck ranks inner NULLs high) — closing those would mean
  * order-preserving sort-key encodings; adjudicated as rare. */
object NestedCmp {
  val OpEq = 0; val OpNe = 1; val OpLt = 2; val OpLe = 3; val OpGt = 4; val OpGe = 5

  /** Leaf-type interpreted orderings, cached per DataType (ADVICE r15:
    * getInterpretedOrdering allocates an ordering per call, and the
    * comparator runs per leaf per row in filter/join/list_sort hot
    * paths). Bounded by the number of distinct leaf types a query
    * touches; ConcurrentHashMap because expressions evaluate on
    * executor task threads concurrently. */
  private val orderingCache =
    new java.util.concurrent.ConcurrentHashMap[DataType, Ordering[Any]]()
  private def leafOrdering(dt: DataType): Ordering[Any] =
    orderingCache.computeIfAbsent(dt,
      t => TypeUtils.getInterpretedOrdering(t).asInstanceOf[Ordering[Any]])

  /** Duck's three-valued comparison: -1/0/1, or null = UNKNOWN. */
  def cmp3(dt: DataType, a: Any, b: Any): java.lang.Integer = {
    if (a == null || b == null) return null
    dt match {
      case ArrayType(et, _) =>
        val x = a.asInstanceOf[ArrayData]
        val y = b.asInstanceOf[ArrayData]
        val n = math.min(x.numElements(), y.numElements())
        var i = 0
        while (i < n) {
          val ea = if (x.isNullAt(i)) null else x.get(i, et)
          val eb = if (y.isNullAt(i)) null else y.get(i, et)
          val c = cmp3(et, ea, eb)
          if (c == null) return null
          if (c.intValue() != 0) return c
          i += 1
        }
        Integer.compare(x.numElements(), y.numElements())
      case st: StructType =>
        val x = a.asInstanceOf[InternalRow]
        val y = b.asInstanceOf[InternalRow]
        var i = 0
        while (i < st.length) {
          val ft = st(i).dataType
          val ea = if (x.isNullAt(i)) null else x.get(i, ft)
          val eb = if (y.isNullAt(i)) null else y.get(i, ft)
          val c = cmp3(ft, ea, eb)
          if (c == null) return null
          if (c.intValue() != 0) return c
          i += 1
        }
        Integer.valueOf(0)
      case mt: MapType =>
        // duck compares maps as their ENTRY LISTS, order-sensitively:
        // per position key first (never null), then value
        val x = a.asInstanceOf[MapData]
        val y = b.asInstanceOf[MapData]
        val n = math.min(x.numElements(), y.numElements())
        var i = 0
        while (i < n) {
          val ck = cmp3(mt.keyType,
            x.keyArray().get(i, mt.keyType), y.keyArray().get(i, mt.keyType))
          if (ck == null) return null
          if (ck.intValue() != 0) return ck
          val va = if (x.valueArray().isNullAt(i)) null else x.valueArray().get(i, mt.valueType)
          val vb = if (y.valueArray().isNullAt(i)) null else y.valueArray().get(i, mt.valueType)
          val cv = cmp3(mt.valueType, va, vb)
          if (cv == null) return null
          if (cv.intValue() != 0) return cv
          i += 1
        }
        Integer.compare(x.numElements(), y.numElements())
      case _ =>
        Integer.valueOf(Integer.signum(leafOrdering(dt).compare(a, b)))
    }
  }

  /** Duck's sort order: total, inner NULLs rank HIGH. Never null. */
  def cmpTotal(dt: DataType, a: Any, b: Any): Int = {
    if (a == null && b == null) return 0
    if (a == null) return 1
    if (b == null) return -1
    dt match {
      case ArrayType(et, _) =>
        val x = a.asInstanceOf[ArrayData]
        val y = b.asInstanceOf[ArrayData]
        val n = math.min(x.numElements(), y.numElements())
        var i = 0
        while (i < n) {
          val ea = if (x.isNullAt(i)) null else x.get(i, et)
          val eb = if (y.isNullAt(i)) null else y.get(i, et)
          val c = cmpTotal(et, ea, eb)
          if (c != 0) return c
          i += 1
        }
        Integer.compare(x.numElements(), y.numElements())
      case st: StructType =>
        val x = a.asInstanceOf[InternalRow]
        val y = b.asInstanceOf[InternalRow]
        var i = 0
        while (i < st.length) {
          val ft = st(i).dataType
          val ea = if (x.isNullAt(i)) null else x.get(i, ft)
          val eb = if (y.isNullAt(i)) null else y.get(i, ft)
          val c = cmpTotal(ft, ea, eb)
          if (c != 0) return c
          i += 1
        }
        0
      case mt: MapType =>
        val x = a.asInstanceOf[MapData]
        val y = b.asInstanceOf[MapData]
        val n = math.min(x.numElements(), y.numElements())
        var i = 0
        while (i < n) {
          val ck = cmpTotal(mt.keyType,
            x.keyArray().get(i, mt.keyType), y.keyArray().get(i, mt.keyType))
          if (ck != 0) return ck
          val va = if (x.valueArray().isNullAt(i)) null else x.valueArray().get(i, mt.valueType)
          val vb = if (y.valueArray().isNullAt(i)) null else y.valueArray().get(i, mt.valueType)
          val cv = cmpTotal(mt.valueType, va, vb)
          if (cv != 0) return cv
          i += 1
        }
        Integer.compare(x.numElements(), y.numElements())
      case _ =>
        Integer.signum(leafOrdering(dt).compare(a, b))
    }
  }

  /** Codegen entry: null return = SQL NULL. `total` picks the
    * comparator: false = the three-valued walk (duck's Execute path —
    * projections and other VALUE contexts), true = the NULL-high total
    * order (duck's Select path — filter/join/CASE predicates; top-level
    * NULL operands are handled by the caller's null guard). */
  def evalOp(op: Int, total: Boolean, dt: DataType, a: Any, b: Any): java.lang.Boolean = {
    val c: java.lang.Integer =
      if (total) Integer.valueOf(cmpTotal(dt, a, b)) else cmp3(dt, a, b)
    if (c == null) return null
    val v = c.intValue()
    java.lang.Boolean.valueOf(op match {
      case OpEq => v == 0
      case OpNe => v != 0
      case OpLt => v < 0
      case OpLe => v <= 0
      case OpGt => v > 0
      case OpGe => v >= 0
    })
  }

  /** Codegen entry for [[ListSortExpr]]: sorts a COPY of the array's
    * elements — non-null elements by [[cmpTotal]] (direction-flipped
    * when desc), top-level NULL entries packed first/last by flag. */
  def sortArray(et: DataType, arr: ArrayData, desc: Boolean,
      nullsFirst: Boolean): ArrayData = {
    val n = arr.numElements()
    val vals = new java.util.ArrayList[Any](n)
    var nulls = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1 else vals.add(arr.get(i, et))
      i += 1
    }
    val cmp = new java.util.Comparator[Any] {
      override def compare(a: Any, b: Any): Int = {
        val c = cmpTotal(et, a, b)
        if (desc) -c else c
      }
    }
    vals.sort(cmp)
    val out = new Array[Any](n)
    val base = if (nullsFirst) nulls else 0
    var j = 0
    while (j < vals.size()) { out(base + j) = vals.get(j); j += 1 }
    // the remaining slots are already null
    new GenericArrayData(out)
  }
}

/** `=`/`<>`/`<`/`<=`/`>`/`>=` over nested operands — emitted by
  * [[graft.plans.NestedCompare]] only when the operand type is a MAP
  * (Spark refuses to compare maps) or carries a NULLABLE leaf (Spark's
  * NULLs-equal ordering answers true/false where duck's VALUE-context
  * walk says NULL). `total=false` is duck's Execute path (3VL);
  * `total=true` is its Select path (NULL-high total order — used for
  * orderings inside filter/join/CASE predicates; top-level NULL
  * operands yield NULL, which branching collapses to no-match like
  * duck). */
case class NestedCmpExpr(left: Expression, right: Expression, op: Int,
    total: Boolean = false)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (total) "graft_nested_cmp_sel" else "graft_nested_cmp"
  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(left.dataType, right.dataType,
        ignoreNullability = true)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nested_cmp requires same-typed operands, got " +
        s"${left.dataType.simpleString} vs ${right.dataType.simpleString}")
  override def nullSafeEval(a: Any, b: Any): Any =
    NestedCmp.evalOp(op, total, left.dataType, a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dtRef = ctx.addReferenceObj("nestedCmpDt", left.dataType)
      val tmp = ctx.freshName("ncTmp")
      s"""java.lang.Boolean $tmp = graft.functions.NestedCmp.evalOp($op, $total, $dtRef, $a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.booleanValue(); }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NestedCmpExpr =
    copy(left = l, right = r)
}

/** IS [NOT] DISTINCT FROM over MAP operands (duck supports it, Spark's
  * EqualNullSafe refuses map types): total equality with NULLs equal. */
case class NestedEqSafeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_nested_eq_safe"
  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(left.dataType, right.dataType,
        ignoreNullability = true)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nested_eq_safe requires same-typed operands, got " +
        s"${left.dataType.simpleString} vs ${right.dataType.simpleString}")
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    java.lang.Boolean.valueOf(NestedCmp.cmpTotal(left.dataType, a, b) == 0)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val dtRef = ctx.addReferenceObj("nestedEqDt", left.dataType)
    val le = left.genCode(ctx)
    val re = right.genCode(ctx)
    ev.copy(
      code = code"""
        |${le.code}
        |${re.code}
        |boolean ${ev.value} = graft.functions.NestedCmp.cmpTotal($dtRef,
        |  ${le.isNull} ? null : (Object) ${le.value},
        |  ${re.isNull} ? null : (Object) ${re.value}) == 0;
        |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NestedEqSafeExpr =
    copy(left = l, right = r)
}

/** Every DuckDB list_sort / array_sort / list_reverse_sort spelling
  * (r15): elements ordered by duck's NULL-HIGH total order
  * ([[NestedCmp.cmpTotal]] — inner NULLs rank above every value, where
  * Spark's sort ranks them below), direction-flipped when `desc`;
  * TOP-LEVEL NULL entries packed by the NULLS FIRST/LAST flag
  * independent of direction (duck defaults: ASC → last, DESC → last;
  * 'NULLS FIRST' spellings → first). The translator routes all sort
  * spellings here so flat and nested element types take one pinned
  * semantics. */
case class ListSortExpr(child: Expression, desc: Boolean, nullsFirst: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_list_sort"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_list_sort requires an array input, got ${other.simpleString}")
  }
  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }
  override def nullSafeEval(a: Any): Any =
    NestedCmp.sortArray(elemType, a.asInstanceOf[ArrayData], desc, nullsFirst)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val etRef = ctx.addReferenceObj("listSortEt", elemType)
      s"${ev.value} = graft.functions.NestedCmp.sortArray($etRef, $a, $desc, $nullsFirst);"
    })
  override protected def withNewChildInternal(c: Expression): ListSortExpr =
    copy(child = c)
}
