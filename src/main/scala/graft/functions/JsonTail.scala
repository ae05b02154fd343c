package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JSON-tail kernels (r10 batch 9, closing the loud batch-4 leftovers):
  * DuckDB's json_structure / json_merge_patch / json_contains. All three
  * probe-pinned on DuckDB 1.x — see the helper scaladocs for the exact
  * pinned rules. Malformed JSON errors loudly, matching duck. */
case class JsonStructureExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_json_structure"
  override def nullSafeEval(a: Any): Any =
    JsonTail.structure(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.JsonTail.structure($a);")
  override protected def withNewChildInternal(c: Expression): JsonStructureExpr =
    copy(child = c)
}

case class JsonContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_json_contains"
  override def nullSafeEval(h: Any, n: Any): Any =
    JsonTail.containsJson(h.asInstanceOf[UTF8String], n.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, n) =>
      s"${ev.value} = graft.functions.JsonTail.containsJson($h, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonContainsExpr =
    copy(left = l, right = r)
}

/** RFC 7386 merge patch with duck's SQL-NULL contract (probed): a NULL
  * PATCH yields NULL; a NULL TARGET is treated as absent (the patch
  * applies onto nothing), so the usual null-strict codegen cannot be
  * used — the left child's null flag feeds the helper instead. */
case class JsonMergePatchExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_json_merge_patch"
  override def nullable: Boolean = right.nullable
  override def eval(input: InternalRow): Any = {
    val p = right.eval(input)
    if (p == null) null
    else {
      val t = left.eval(input)
      JsonTail.mergePatch(t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val le = left.genCode(ctx)
    val re = right.genCode(ctx)
    val lv = ctx.freshName("mpLeft")
    ev.copy(code = code"""
      ${re.code}
      boolean ${ev.isNull} = ${re.isNull};
      UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        ${le.code}
        UTF8String $lv = ${le.isNull} ? null : ${le.value};
        ${ev.value} = graft.functions.JsonTail.mergePatch($lv, ${re.value});
      }""")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonMergePatchExpr =
    copy(left = l, right = r)
}

object JsonTail {
  private val mapper = new ObjectMapper()

  private def parse(s: UTF8String): JsonNode =
    try mapper.readTree(s.toString)
    catch {
      case e: Exception =>
        throw new IllegalArgumentException(s"malformed JSON: ${e.getMessage}")
    }

  // ---- json_structure --------------------------------------------------
  // Pinned rules (DuckDB 1.x probes): scalars → "UBIGINT" (non-negative
  // integral) / "BIGINT" (negative) / "DOUBLE" / "VARCHAR" / "BOOLEAN" /
  // "NULL"; '{}' → "JSON"; '[]' → ["NULL"]; arrays merge element
  // structures (NULL yields to anything, UBIGINT∪BIGINT=BIGINT,
  // int∪DOUBLE=DOUBLE, objects merge keys recursively, arrays merge
  // elements, anything else → "JSON").
  def structure(s: UTF8String): UTF8String =
    UTF8String.fromString(mapper.writeValueAsString(structNode(parse(s))))

  private def structNode(n: JsonNode): JsonNode = {
    if (n.isObject) {
      if (n.isEmpty) TextNode.valueOf("JSON")
      else {
        val o = mapper.createObjectNode()
        val it = n.fields()
        while (it.hasNext) { val e = it.next(); o.set[JsonNode](e.getKey, structNode(e.getValue)) }
        o
      }
    } else if (n.isArray) {
      val a = mapper.createArrayNode()
      if (n.isEmpty) a.add(TextNode.valueOf("NULL"))
      else {
        var merged: JsonNode = null
        val it = n.elements()
        while (it.hasNext) {
          val s2 = structNode(it.next())
          merged = if (merged == null) s2 else mergeStruct(merged, s2)
        }
        a.add(merged)
      }
      a
    } else if (n.isNull) TextNode.valueOf("NULL")
    else if (n.isTextual) TextNode.valueOf("VARCHAR")
    else if (n.isBoolean) TextNode.valueOf("BOOLEAN")
    else if (n.isIntegralNumber)
      TextNode.valueOf(if (n.bigIntegerValue().signum() < 0) "BIGINT" else "UBIGINT")
    else TextNode.valueOf("DOUBLE")
  }

  private val numWiden = Map("UBIGINT" -> 0, "BIGINT" -> 1, "DOUBLE" -> 2)
  private def mergeStruct(a: JsonNode, b: JsonNode): JsonNode = {
    if (a == b) return a
    (a, b) match {
      case (ta: TextNode, _) if ta.textValue() == "NULL" => b
      case (_, tb: TextNode) if tb.textValue() == "NULL" => a
      case (ta: TextNode, tb: TextNode)
          if numWiden.contains(ta.textValue()) && numWiden.contains(tb.textValue()) =>
        if (numWiden(ta.textValue()) >= numWiden(tb.textValue())) ta else tb
      case (oa: ObjectNode, ob: ObjectNode) =>
        val o = mapper.createObjectNode()
        val ia = oa.fields()
        while (ia.hasNext) {
          val e = ia.next()
          o.set[JsonNode](e.getKey,
            if (ob.has(e.getKey)) mergeStruct(e.getValue, ob.get(e.getKey)) else e.getValue)
        }
        val ib = ob.fields()
        while (ib.hasNext) { val e = ib.next(); if (!o.has(e.getKey)) o.set[JsonNode](e.getKey, e.getValue) }
        o
      case (aa: ArrayNode, ab: ArrayNode) =>
        val out = mapper.createArrayNode()
        out.add(mergeStruct(aa.get(0), ab.get(0)))
        out
      case _ => TextNode.valueOf("JSON")
    }
  }

  // ---- json_contains ---------------------------------------------------
  // Pinned: needle found ANYWHERE in the haystack (descends object values
  // and array elements). Object needles are partial (subset) matches;
  // array needles match when every element matches SOME element of an
  // array node; scalar needles match array membership or strict scalar
  // equality (1 vs 1.0 do NOT match — integer and double stay distinct).
  def containsJson(h: UTF8String, n: UTF8String): Boolean = {
    val needle = parse(n)
    descend(parse(h), needle)
  }

  private def descend(h: JsonNode, n: JsonNode): Boolean = {
    if (matches(h, n)) return true
    if (h.isObject || h.isArray) {
      val it = h.elements()
      while (it.hasNext) if (descend(it.next(), n)) return true
    }
    false
  }

  private def matches(h: JsonNode, n: JsonNode): Boolean = {
    if (n.isObject) {
      if (!h.isObject) return false
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        if (!h.has(e.getKey) || !matches(h.get(e.getKey), e.getValue)) return false
      }
      true
    } else if (n.isArray) {
      if (!h.isArray) return false
      val it = n.elements()
      while (it.hasNext) {
        val e = it.next()
        var found = false
        val ih = h.elements()
        while (ih.hasNext && !found) found = matches(ih.next(), e)
        if (!found) return false
      }
      true
    } else {
      if (h.isArray) {
        val ih = h.elements()
        while (ih.hasNext) if (matches(ih.next(), n)) return true
        false
      } else h == n // strict node equality: type + value
    }
  }

  // ---- json_merge_patch ------------------------------------------------
  // RFC 7386; SQL-NULL target = absent (probed: merge_patch(NULL, p) = p).
  def mergePatch(t: UTF8String, p: UTF8String): UTF8String = {
    val patch = parse(p)
    val target: JsonNode = if (t == null) mapper.nullNode() else parse(t)
    UTF8String.fromString(mapper.writeValueAsString(applyPatch(target, patch)))
  }

  private def applyPatch(t: JsonNode, p: JsonNode): JsonNode = {
    if (!p.isObject) return p
    val out = mapper.createObjectNode()
    if (t.isObject) {
      val it = t.fields()
      while (it.hasNext) { val e = it.next(); out.set[JsonNode](e.getKey, e.getValue) }
    }
    val ip = p.fields()
    while (ip.hasNext) {
      val e = ip.next()
      if (e.getValue.isNull) out.remove(e.getKey)
      else out.set[JsonNode](e.getKey,
        applyPatch(if (out.has(e.getKey)) out.get(e.getKey) else mapper.nullNode(), e.getValue))
    }
    out
  }
}
