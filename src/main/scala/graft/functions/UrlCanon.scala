package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization kernel (r10): fragment strip, lowercase
  * scheme/host (path keeps case — case-sensitive by RFC 3986), default
  * :80/:443 port drop, utm_* query params dropped and the remainder
  * SORTED, trailing-slash run stripped (empty path → "/").
  *
  * A single codegen scan: the built-in composition needed higher-order
  * array functions (filter/array_sort with lambdas), which are
  * CodegenFallback in Spark — interpreted per row, measured ~10× slower
  * than this kernel at sf≈1. */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_canon"
  override def nullSafeEval(a: Any): Any =
    UrlCanon.canon(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.UrlCanon.canon($a);")
  override protected def withNewChildInternal(c: Expression): UrlCanonicalize =
    copy(child = c)
}

object UrlCanon {
  def canon(u: UTF8String): UTF8String = {
    var s = u.toString
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    val sep = s.indexOf("://")
    val (scheme, rest) =
      if (sep >= 0) (s.substring(0, sep).toLowerCase(java.util.Locale.ROOT), s.substring(sep + 3))
      else ("", s)
    // Authority ends at the FIRST of '/' or '?' (fragment already
    // stripped): a URL with a query but no path ("http://ex.com?b=1")
    // is valid — the query must not fold into the host (r11 fix).
    val cut = rest.indexWhere(c => c == '/' || c == '?')
    val hostPort = if (cut >= 0) rest.substring(0, cut) else rest
    val pathQ =
      if (cut < 0) "/"
      else if (rest.charAt(cut) == '?') "/" + rest.substring(cut)
      else rest.substring(cut)
    val colon = hostPort.indexOf(':')
    val host =
      (if (colon >= 0) hostPort.substring(0, colon) else hostPort).toLowerCase(java.util.Locale.ROOT)
    val port = if (colon >= 0) hostPort.substring(colon + 1) else ""
    val portPart =
      if (port.isEmpty || (scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443")) ""
      else ":" + port
    val q = pathQ.indexOf('?')
    val path0 = if (q >= 0) pathQ.substring(0, q) else pathQ
    val query = if (q >= 0) pathQ.substring(q + 1) else ""
    var pEnd = path0.length
    while (pEnd > 0 && path0.charAt(pEnd - 1) == '/') pEnd -= 1
    val path = if (pEnd == 0) "/" else path0.substring(0, pEnd)
    val params = query.split("&", -1)
      .filter(p => p.nonEmpty && !p.startsWith("utm_"))
      .sorted
    val qPart = if (params.isEmpty) "" else "?" + params.mkString("&")
    val sb = new java.lang.StringBuilder(s.length)
    if (sep >= 0) { sb.append(scheme); sb.append("://") }
    sb.append(host).append(portPart).append(path).append(qPart)
    UTF8String.fromString(sb.toString)
  }
}
