package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fuzzy string-matching kernels (r7): the DuckDB similarity surface
  * Spark lacks as builtins (`/root/reference` passes these through to
  * DuckDB). All semantics probe-pinned on DuckDB 1.0:
  *   - damerau_levenshtein: TRUE (unrestricted) Damerau — 'ca'→'abc' is 2
  *     (delete-transpose), not OSA's 3 — via the alphabet-indexed DP;
  *   - jaro_similarity: standard Jaro, 0.0 when either side is empty
  *     (including both-empty — DuckDB returns 0.0 there, not 1.0);
  *   - jaro_winkler_similarity: Jaro + prefix boost ℓ·0.1·(1−jaro) with
  *     prefix capped at 4 and NO boost at jaro ≤ 0.7 (probed:
  *     'aXXXXX'/'aYYYYY' stays 0.444; 'abcdexxxx'/'abcdeyyyy' = 0.8222
  *     proves the cap).
  * Case-sensitive, char-based (probed: 'ABC' vs 'abc' → distance 3,
  * jaro 0.0). Codegen'd via static forwarders like the other kernels —
  * entity-resolution joins run these inside whole-stage codegen.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "damerau_levenshtein"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.damerau(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSim.damerau($a.toString(), $b.toString());")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
}

case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_similarity"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaro(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSim.jaro($a.toString(), $b.toString());")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSimilarity =
    copy(left = l, right = r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSim.jaroWinkler($a.toString(), $b.toString());")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSimilarity =
    copy(left = l, right = r)
}

object StringSim {

  /** True Damerau-Levenshtein (alphabet-indexed DP, transpositions may be
    * separated by edits). Static forwarder for generated code. */
  def damerau(a: String, b: String): Long = {
    val m = a.length; val n = b.length
    if (m == 0) return n.toLong
    if (n == 0) return m.toLong
    val inf = m + n
    val d = Array.ofDim[Int](m + 2, n + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= m) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= m) {
      var db = 0
      j = 1
      while (j <= n) {
        val kBoxed = da.get(b.charAt(j - 1))
        val k = if (kBoxed == null) 0 else kBoxed.intValue()
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        var best = d(i)(j) + cost
        if (d(i + 1)(j) + 1 < best) best = d(i + 1)(j) + 1
        if (d(i)(j + 1) + 1 < best) best = d(i)(j + 1) + 1
        val transp = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        if (transp < best) best = transp
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(m + 1)(n + 1).toLong
  }

  /** Standard Jaro; 0.0 when either side is empty (DuckDB-pinned). */
  def jaro(a: String, b: String): Double = {
    val m = a.length; val n = b.length
    if (m == 0 || n == 0) return 0.0
    val window = math.max(0, math.max(m, n) / 2 - 1)
    val aMatch = new Array[Boolean](m)
    val bMatch = new Array[Boolean](n)
    var matches = 0
    var i = 0
    while (i < m) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, n)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var halfTransp = 0
    var k = 0
    i = 0
    while (i < m) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) halfTransp += 1
        k += 1
      }
      i += 1
    }
    val t = halfTransp / 2.0
    val md = matches.toDouble
    (md / m + md / n + (md - t) / md) / 3.0
  }

  /** Jaro-Winkler: prefix cap 4, scale 0.1, boost only above jaro 0.7. */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val cap = math.min(4, math.min(a.length, b.length))
    var p = 0
    while (p < cap && a.charAt(p) == b.charAt(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }
}
