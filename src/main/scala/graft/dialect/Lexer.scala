package graft.dialect

/** Minimal quote/comment-aware SQL lexer.
  *
  * The reference rewrites client SQL with bare regexes
  * (`/root/reference/main.py:252-259` FORMAT strip,
  * `/root/reference/main.py:769-777` catalog-prefix strip), which breaks on
  * string literals containing keywords. We tokenize first so every rewrite in
  * [[Translator]] is string- and comment-safe.
  */
object Lexer {
  sealed trait Tok { def text: String }
  /** Bare or double-quoted identifier / keyword. `upper` is "" for quoted. */
  final case class Ident(text: String) extends Tok {
    val upper: String = if (text.startsWith("\"")) "" else text.toUpperCase
  }
  /** Single-quoted string literal, quotes included, '' escapes preserved. */
  final case class Str(text: String) extends Tok {
    def value: String = text.substring(1, text.length - 1).replace("''", "'")
  }
  final case class Num(text: String) extends Tok
  /** Operator / punctuation (possibly multi-char: <=, >=, <>, !=, ==, ||, ::). */
  final case class Punct(text: String) extends Tok
  /** Whitespace or comment run. */
  final case class Ws(text: String) extends Tok

  // longest-first within a shared prefix: "!~~*" before "!~~" before "!~"
  // before "!=", "~~*" before "~~" (r10 batch 10: the ~~-family LIKE and
  // ~ regex operator spellings)
  private val multiChar = Seq("!~~*", "!~~", "~~*", "~~", "!~",
    "<=", ">=", "<>", "!=", "==", "||", "::", "->>", "->", "**", "//", ":=")

  def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    def isIdentStart(c: Char) = c.isLetter || c == '_'
    def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) {
        val s = i; while (i < n && sql(i).isWhitespace) i += 1
        out += Ws(sql.substring(s, i))
      } else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        val s = i; while (i < n && sql(i) != '\n') i += 1
        out += Ws(sql.substring(s, i))
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        val s = i; i += 2
        while (i + 1 < n && !(sql(i) == '*' && sql(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
        out += Ws(sql.substring(s, i))
      } else if (c == '\'') {
        val s = i; i += 1
        var done = false
        while (i < n && !done) {
          if (sql(i) == '\'') {
            if (i + 1 < n && sql(i + 1) == '\'') i += 2 else { done = true; i += 1 }
          } else i += 1
        }
        out += Str(sql.substring(s, i))
      } else if (c == '"' || c == '`') {
        val quote = c
        val s = i; i += 1
        while (i < n && sql(i) != quote) i += 1
        i = math.min(n, i + 1)
        out += Ident(sql.substring(s, i))
      } else if (c.isDigit || (c == '.' && i + 1 < n && sql(i + 1).isDigit)) {
        val s = i
        while (i < n && (sql(i).isDigit || sql(i) == '.' || sql(i) == 'e' || sql(i) == 'E' ||
          ((sql(i) == '+' || sql(i) == '-') && i > s && (sql(i - 1) == 'e' || sql(i - 1) == 'E')))) i += 1
        out += Num(sql.substring(s, i))
      } else if (isIdentStart(c)) {
        val s = i; while (i < n && isIdentChar(sql(i))) i += 1
        out += Ident(sql.substring(s, i))
      } else {
        multiChar.find(op => sql.startsWith(op, i)) match {
          case Some(op) => out += Punct(op); i += op.length
          case None     => out += Punct(c.toString); i += 1
        }
      }
    }
    out.result()
  }

  def render(toks: Seq[Tok]): String = toks.map(_.text).mkString

  /** Indices of non-whitespace tokens. */
  def sig(toks: Vector[Tok]): Vector[Int] =
    toks.indices.filterNot(toks(_).isInstanceOf[Ws]).toVector
}
