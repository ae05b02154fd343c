package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fuzzy string-matching kernels (r7; r14 re-pinned to BYTE semantics —
  * the str fuzz mode caught every one of these diverging on non-ASCII:
  * DuckDB's similarity functions operate on the raw UTF-8 BYTES, probed
  * levenshtein('é','X') = 2, jaro_similarity('über','uber') = 0.7833 —
  * the byte answer, not the codepoint 0.8333):
  *   - levenshtein: classic DP over bytes (duck's levenshtein/editdist3);
  *   - damerau_levenshtein: TRUE (unrestricted) Damerau — 'ca'→'abc' is 2
  *     (delete-transpose), not OSA's 3 — via the alphabet-indexed DP;
  *   - jaro_similarity: standard Jaro, 0.0 when either side is empty
  *     (including both-empty — DuckDB returns 0.0 there, not 1.0);
  *   - jaro_winkler_similarity: Jaro + prefix boost ℓ·0.1·(1−jaro) with
  *     prefix capped at 4 and NO boost at jaro ≤ 0.7 (probed:
  *     'aXXXXX'/'aYYYYY' stays 0.444; 'abcdexxxx'/'abcdeyyyy' = 0.8222
  *     proves the cap);
  *   - mismatches/hamming: positionwise differing-BYTE count; duck
  *     ERRORS on unequal byte lengths → NULL here (error-path divergence
  *     only, documented).
  * Case-sensitive (probed: 'ABC' vs 'abc' → distance 3, jaro 0.0).
  * ASCII inputs are bit-identical to the r7 char-based pins. Codegen'd
  * via static forwarders like the other kernels — entity-resolution
  * joins run these inside whole-stage codegen.
  */
case class GraftLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_levenshtein"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.levenshtein(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSim.levenshtein($a.getBytes(), $b.getBytes());")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftLevenshtein =
    copy(left = l, right = r)
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "damerau_levenshtein"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.damerau(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSim.damerau($a.getBytes(), $b.getBytes());")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
}

case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_similarity"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaro(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSim.jaro($a.getBytes(), $b.getBytes());")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSimilarity =
    copy(left = l, right = r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSim.jaroWinkler($a.getBytes(), $b.getBytes());")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSimilarity =
    copy(left = l, right = r)
}

/** Positionwise differing-byte count; NULL on unequal byte lengths
  * (duck errors there — documented error-path divergence). */
case class MismatchesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mismatches"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = StringSim.mismatches(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)
    if (r < 0) null else r
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("mmTmp")
      s"""long $tmp = graft.functions.StringSim.mismatches($a.getBytes(), $b.getBytes());
         |if ($tmp < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MismatchesExpr =
    copy(left = l, right = r)
}

object StringSim {

  /** Classic Levenshtein DP over UTF-8 bytes (duck's levenshtein).
    * Static forwarder for generated code. */
  def levenshtein(a: Array[Byte], b: Array[Byte]): Long = {
    val m = a.length; val n = b.length
    if (m == 0) return n.toLong
    if (n == 0) return m.toLong
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      cur(0) = i
      j = 1
      while (j <= n) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        var best = prev(j - 1) + cost
        if (prev(j) + 1 < best) best = prev(j) + 1
        if (cur(j - 1) + 1 < best) best = cur(j - 1) + 1
        cur(j) = best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n).toLong
  }

  /** -1 = unequal lengths (expression maps to NULL). */
  def mismatches(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length != b.length) return -1L
    var c = 0L
    var i = 0
    while (i < a.length) { if (a(i) != b(i)) c += 1L; i += 1 }
    c
  }

  /** True Damerau-Levenshtein over bytes (alphabet-indexed DP,
    * transpositions may be separated by edits). */
  def damerau(a: Array[Byte], b: Array[Byte]): Long = {
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
    val da = new Array[Int](256) // last row seen per byte value (1-based)
    i = 1
    while (i <= m) {
      var db = 0
      j = 1
      while (j <= n) {
        val k = da(b(j - 1) & 0xff)
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        var best = d(i)(j) + cost
        if (d(i + 1)(j) + 1 < best) best = d(i + 1)(j) + 1
        if (d(i)(j + 1) + 1 < best) best = d(i)(j + 1) + 1
        val transp = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        if (transp < best) best = transp
        d(i + 1)(j + 1) = best
        j += 1
      }
      da(a(i - 1) & 0xff) = i
      i += 1
    }
    d(m + 1)(n + 1).toLong
  }

  /** Standard Jaro over bytes; 0.0 when either side is empty
    * (DuckDB-pinned). */
  def jaro(a: Array[Byte], b: Array[Byte]): Double = {
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
        if (!bMatch(j) && a(i) == b(j)) {
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
        if (a(i) != b(k)) halfTransp += 1
        k += 1
      }
      i += 1
    }
    // INTEGER halving (r14 str fuzz, reverse-engineered from duck's
    // 0.42014 on a 3-match/3-half-transposition pair): duck FLOORS the
    // transposition count — t = half/2 in integer arithmetic — where
    // the textbook form keeps the 0.5. Even half counts are identical.
    val t = (halfTransp / 2).toDouble
    val md = matches.toDouble
    (md / m + md / n + (md - t) / md) / 3.0
  }

  /** Jaro-Winkler: prefix cap 4, scale 0.1, boost only above jaro 0.7. */
  def jaroWinkler(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val cap = math.min(4, math.min(a.length, b.length))
    var p = 0
    while (p < cap && a(p) == b(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }
}
