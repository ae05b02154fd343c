package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First-match-only `regexp_replace(str, pattern, replacement)`.
  *
  * DuckDB's 3-arg `regexp_replace` replaces only the FIRST match (the `'g'`
  * flag makes it global); Spark's builtin always replaces every match. The
  * dialect layer maps the flagged form onto Spark's builtin and the 3-arg
  * form onto this expression, closing the divergence SURVEY §2.9 documented.
  *
  * Replacement strings use DuckDB/RE2 conventions: `\1`..`\9` are group
  * backreferences and `$` is literal — [[RegexpReplaceFirst.toJavaReplacement]]
  * converts once per distinct replacement to Java's `$1` syntax.
  *
  * Codegen'd (no UDF): the compiled Pattern and converted replacement are
  * cached per distinct value in a small per-instance holder, so the
  * constant-pattern hot path compiles the regex once per task.
  */
case class RegexpReplaceFirst(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_replace_first"

  @transient private lazy val cache = new RegexpReplaceFirst.Cache

  override def nullSafeEval(s: Any, p: Any, r: Any): Any =
    cache.replaceFirst(s.asInstanceOf[UTF8String].toString,
      p.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cacheRef = ctx.addReferenceObj("rrfCache", cache,
      classOf[RegexpReplaceFirst.Cache].getName)
    nullSafeCodeGen(ctx, ev, (s, p, r) =>
      s"${ev.value} = $cacheRef.replaceFirst($s.toString(), $p.toString(), $r.toString());")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RegexpReplaceFirst =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RegexpReplaceFirst {

  /** DuckDB/RE2 replacement → Java replacement: `\N` → `$N`, `\\` → `\\`
    * (literal backslash), bare `$` → `\$` (literal dollar). */
  def toJavaReplacement(repl: String): String = {
    val out = new java.lang.StringBuilder(repl.length + 8)
    var i = 0
    while (i < repl.length) {
      val c = repl.charAt(i)
      if (c == '\\' && i + 1 < repl.length) {
        val n = repl.charAt(i + 1)
        if (n >= '0' && n <= '9') { out.append('$').append(n); i += 2 } // \N → $N
        else if (n == '\\') { out.append("\\\\"); i += 2 } // \\ → one literal backslash
        else { out.append("\\\\"); i += 1 } // stray backslash → literal
      } else if (c == '\\') { out.append("\\\\"); i += 1 } // trailing backslash
      else if (c == '$') { out.append("\\$"); i += 1 } // $ is literal in RE2 repl
      else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Per-expression-instance cache: last compiled pattern + last converted
    * replacement (the overwhelmingly common case is both constant). Not
    * thread-safe state is fine — one instance per task after serialization. */
  final class Cache extends java.io.Serializable {
    @transient private var lastPatternStr: String = _
    @transient private var lastPattern: Pattern = _
    @transient private var lastReplSrc: String = _
    @transient private var lastRepl: String = _

    def replaceFirst(s: String, p: String, r: String): UTF8String = {
      if (lastPattern == null || p != lastPatternStr) {
        lastPatternStr = p
        lastPattern = Pattern.compile(p)
      }
      if (lastRepl == null || r != lastReplSrc) {
        lastReplSrc = r
        lastRepl = toJavaReplacement(r)
      }
      UTF8String.fromString(lastPattern.matcher(s).replaceFirst(lastRepl))
    }
  }
}
