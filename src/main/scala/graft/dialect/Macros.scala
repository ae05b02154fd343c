package graft.dialect

import org.apache.spark.sql.SparkSession
import Lexer._

/** DuckDB `CREATE MACRO` support (scalar macros).
  *
  * The reference passes `CREATE MACRO f(x) AS x + 1` to DuckDB unmodified
  * (`/root/reference/main.py:231`); Spark SQL has no SQL-defined scalar
  * functions usable this way, so the dialect layer keeps a per-session
  * macro registry and expands calls textually (token-level, quote-aware)
  * before translation:
  *
  *   CREATE [OR REPLACE] MACRO add_tax(p, rate := 0.07) AS p * (1 + rate)
  *   SELECT add_tax(o_totalprice) ...   →   SELECT ((o_totalprice) * (1 + (0.07))) ...
  *
  * Arguments substitute positionally; trailing parameters may carry
  * `:= default` values. Every substituted argument and the whole body are
  * parenthesized, so operator precedence survives textual expansion.
  * Macros may call macros (expansion iterates to a fixpoint, depth-capped
  * against recursion). Registry scope is the SparkSession, mirroring
  * DuckDB's per-connection catalog of temp macros.
  */
object Macros {

  final case class Macro(params: Seq[String], defaults: Map[String, String], body: String)

  private val registry: java.util.Map[SparkSession, Map[String, Macro]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Map[String, Macro]]())

  private val createRe =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP\s+|TEMPORARY\s+)?MACRO\s+([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)""".r
  private val dropRe =
    """(?is)\s*DROP\s+MACRO\s+(?:IF\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""".r

  /** If `sql` is CREATE/DROP MACRO, apply it to the session registry and
    * return true (the caller returns an empty result, as DuckDB does). */
  def tryDdl(spark: SparkSession, sql: String): Boolean = sql match {
    case createRe(name, rest) =>
      // split "params) AS body" at the matching close paren, token-aware
      val toks = lex("(" + rest)
      val close = {
        var d = 0; var i = 0; var at = -1
        while (i < toks.length && at < 0) {
          toks(i) match {
            case Punct("(") => d += 1
            case Punct(")") => d -= 1; if (d == 0) at = i
            case _ =>
          }
          i += 1
        }
        at
      }
      require(close > 0, s"malformed CREATE MACRO: $sql")
      val paramToks = splitTop(toks.slice(1, close))
      val params = scala.collection.mutable.ArrayBuffer[String]()
      val defaults = scala.collection.mutable.Map[String, String]()
      paramToks.filter(_.exists(!_.isInstanceOf[Ws])).foreach { p =>
        val nw = p.filterNot(_.isInstanceOf[Ws])
        nw.head match {
          case id: Ident =>
            params += id.text.toLowerCase
            if (nw.length >= 2 && nw(1) == Punct(":=")) {
              val eq = p.indexWhere(_ == Punct(":="))
              defaults(id.text.toLowerCase) = render(p.drop(eq + 1)).trim
            }
          case other => throw new IllegalArgumentException(s"bad macro param: ${other.text}")
        }
      }
      val after = render(toks.slice(close + 1, toks.length)).trim
      // table macros: `AS TABLE SELECT …` — the stored body is the bare
      // SELECT; expansion parenthesizes it, which is a valid FROM-position
      // subquery in both engines
      val body = after.replaceFirst("(?is)^AS\\s+(TABLE\\s+)?", "").stripSuffix(";").trim
      require(body.nonEmpty, s"CREATE MACRO has no body: $sql")
      registry.synchronized {
        val cur = Option(registry.get(spark)).getOrElse(Map.empty)
        registry.put(spark, cur + (name.toLowerCase -> Macro(params.toSeq, defaults.toMap, body)))
      }
      true
    case dropRe(name) =>
      registry.synchronized {
        val cur = Option(registry.get(spark)).getOrElse(Map.empty)
        registry.put(spark, cur - name.toLowerCase)
      }
      true
    case _ => false
  }

  private def splitTop(toks: Vector[Tok]): Vector[Vector[Tok]] = {
    val out = scala.collection.mutable.ArrayBuffer[Vector[Tok]]()
    var cur = scala.collection.mutable.ArrayBuffer[Tok]()
    var d = 0
    toks.foreach {
      case t @ (Punct("(") | Punct("[")) => d += 1; cur += t
      case t @ (Punct(")") | Punct("]")) => d -= 1; cur += t
      case Punct(",") if d == 0 => out += cur.toVector; cur = scala.collection.mutable.ArrayBuffer[Tok]()
      case t => cur += t
    }
    out += cur.toVector
    out.toVector
  }

  /** Expand macro calls in `sql` against the session registry (leftmost
    * call first, iterated to a fixpoint, depth-capped against recursive
    * macros). No-op when the session has no macros. */
  def expand(spark: SparkSession, sql: String): String = {
    val macros = Option(registry.get(spark)).getOrElse(Map.empty)
    if (macros.isEmpty) return sql
    var out = sql
    var steps = 0
    var rewritten = expandOnce(lex(out), macros)
    // expandOnce rewrites ONE leftmost call per step, so the step cap must
    // comfortably exceed any legitimate call-site count (a wide projection
    // can invoke a macro hundreds of times); the length cap catches
    // recursive macros early — their expansion grows without bound.
    while (rewritten != null && steps < 2000 && out.length <= 500000) {
      out = rewritten
      steps += 1
      rewritten = expandOnce(lex(out), macros)
    }
    // A non-null rewrite at either cap means the fixpoint was never
    // reached (self/mutually-recursive macros). Surface the error rather
    // than passing half-expanded SQL to the translator (DuckDB errors on
    // recursive macros at CREATE time; we detect at expansion).
    if (rewritten != null)
      throw new IllegalArgumentException(
        s"macro expansion did not reach a fixpoint after $steps steps " +
          s"(${out.length} chars) — recursive macro? SQL: ${sql.take(200)}")
    out
  }

  /** One leftmost macro-call expansion; null when nothing expanded. */
  private def expandOnce(toks: Vector[Tok], macros: Map[String, Macro]): String = {
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case id: Ident if macros.contains(id.text.toLowerCase) => {
          var open = i + 1
          while (open < toks.length && toks(open).isInstanceOf[Ws]) open += 1
          if (open < toks.length && toks(open) == Punct("(")) {
            var d = 0; var close = open; var found = -1
            while (close < toks.length && found < 0) {
              toks(close) match {
                case Punct("(") => d += 1
                case Punct(")") => d -= 1; if (d == 0) found = close
                case _ =>
              }
              close += 1
            }
            if (found > 0) {
              val m = macros(id.text.toLowerCase)
              val argToks = splitTop(toks.slice(open + 1, found))
                .filter(_.exists(!_.isInstanceOf[Ws]))
              val args = argToks.map(a => render(a).trim)
              if (args.length <= m.params.length &&
                m.params.drop(args.length).forall(m.defaults.contains)) {
                val bound = m.params.zipWithIndex.map { case (p, k) =>
                  p -> (if (k < args.length) args(k) else m.defaults(p))
                }.toMap
                // Substitute param identifiers, but never one that is
                // dot-qualified (t.x where x is a param is a column of t,
                // not the macro argument — substituting would corrupt it).
                // A param BEFORE a dot (x.field) stays substitutable:
                // struct-field access on the argument is legitimate.
                val bts = lex(m.body)
                def afterDot(k: Int): Boolean = {
                  var p = k - 1
                  while (p >= 0 && bts(p).isInstanceOf[Ws]) p -= 1
                  p >= 0 && bts(p) == Punct(".")
                }
                val bodyToks = bts.zipWithIndex.map {
                  case (pid: Ident, k)
                      if bound.contains(pid.text.toLowerCase) && !afterDot(k) =>
                    Ident("(" + bound(pid.text.toLowerCase) + ")")
                  case (t, _) => t
                }
                val repl = "(" + render(bodyToks) + ")"
                return render(toks.slice(0, i)) + repl +
                  render(toks.slice(found + 1, toks.length))
              }
            }
          }
        }
        case _ =>
      }
      i += 1
    }
    null
  }
}
