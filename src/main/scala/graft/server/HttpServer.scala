package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import org.apache.spark.sql.SparkSession
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** ClickHouse-compatible HTTP API (reference `main.py:262-358`):
  *
  *  - `GET/POST /` — `query` param (POST body appended), `default_format`,
  *    `database`, `query_id` (cache replay), basic auth → tenant
  *  - `POST /` with `INSERT INTO t` + JSONEachRow body — bulk ingest
  *  - `GET /play` — SQL play UI
  *  - `GET /ping` — health check "Ok"
  *
  * Built on the JDK's HttpServer (zero extra deps; the env has no egress).
  * Each request runs on a cloned SparkSession scoped to its tenant database,
  * so concurrent queries and inserts don't share mutable session state —
  * the reference's "concurrent inserts and querying" claim
  * (`README.md:14`) maps to Spark's natural multi-session concurrency.
  */
final class HttpServer(spark: SparkSession, port: Int = 8123, uiDir: Option[String] = None) {

  private val tenants = new TenantManager(spark)
  private val cache = new ResultCache(10)
  private var server: JdkHttpServer = _

  def start(): Int = {
    server = JdkHttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", handle _)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split('&').toIndexedSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8"))
        case Array(k) => Some(java.net.URLDecoder.decode(k, "UTF-8") -> "")
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)

  private def respond(ex: HttpExchange, code: Int, bytes: Array[Byte],
      contentType: String = "application/json; charset=UTF-8"): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case e: Throwable =>
        // if streaming already sent headers, this respond throws — the
        // connection just closes with a truncated chunked body, which is
        // the correct wire signal for a mid-stream failure
        try respond(ex, 500, Option(e.getMessage).getOrElse("internal error")
          .getBytes(StandardCharsets.UTF_8), "text/plain")
        catch { case _: Throwable => ex.close() }
    }

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val noQuery = {
      val p = queryParams(ex)
      p.get("query").isEmpty && p.get("query_id").isEmpty
    }
    path match {
      case "/ping" => respond(ex, 200, "Ok\n".getBytes, "text/plain")
      case p if p.startsWith("/flight/") => serveFlight(ex, p)
      // GET and HEAD both land on the console when no query is present
      // (reference routes them identically, main.py:262,279-280)
      case "/play" | "/" if (ex.getRequestMethod == "GET" ||
        ex.getRequestMethod == "HEAD") && noQuery => serveUi(ex)
      // reference: unknown paths fall back to the UI (404→index.html,
      // main.py:340-352) so deep links into the console work
      case p if p != "/" && ex.getRequestMethod == "GET" && noQuery => serveUi(ex)
      case _ => serveQuery(ex)
    }
  }

  /** Flight semantics over HTTP: the gRPC transport's jars are not
    * available in this environment (zero egress — see README), so the
    * byte-level Flight handlers ([[graft.flight.FlightActions]]) are
    * exposed as HTTP endpoints with the same request/response payloads a
    * Flight transport would carry:
    *
    *  - `POST /flight/do_get` — ticket bytes (raw SQL or JSON `{query}`)
    *    in the body → Arrow IPC stream of the result
    *  - `POST /flight/do_put?table=t` — Arrow IPC body → append; returns
    *    the `{rows_inserted: int64}` Arrow response table
    *  - `POST /flight/do_exchange?table=t` — per-batch insert loop, same
    *    response table
    *  - `GET /flight/info?query=…` — result schema WITHOUT execution, as
    *    a schema-only Arrow IPC stream; `?path=<command>` — path-mode
    *    FlightInfo for the canned catalog flights (ticket echoed in the
    *    `X-Flight-Ticket` header)
    *  - `GET /flight/list_flights` — msgpack+zstd envelope of FlightInfo
    *    entries; no filter → the 4 canned catalog flights, the reference's
    *    `airport-list-flights-filter-catalog/-schema` headers (or
    *    `catalog`/`schema` params) → table listing
    *  - `GET /flight/list_schemas?catalog=…` — msgpack+zstd Airport
    *    envelope
    */
  private def serveFlight(ex: HttpExchange, path: String): Unit = {
    import graft.flight.FlightActions
    import graft.arrowio.ArrowIO
    val params = queryParams(ex)
    // read the request body lazily: the ingest endpoints decode it
    // incrementally from the stream instead (bounded driver memory)
    def body(): Array[Byte] = ex.getRequestBody.readAllBytes()
    val auth = tenants.parseAuthHeader(
      Option(ex.getRequestHeaders.getFirst("Authorization")))
    val session = tenants.sessionFor(auth, params.get("database"))
    val arrowType = "application/vnd.apache.arrow.stream"
    path match {
      case "/flight/do_get" =>
        val bodyBytes = body()
        val ticket = if (bodyBytes.nonEmpty) bodyBytes
          else params.getOrElse("ticket", "").getBytes(StandardCharsets.UTF_8)
        if (ticket.isEmpty) { respond(ex, 400, "no ticket\n".getBytes, "text/plain"); return }
        val sql = FlightActions.parseTicket(ticket)
        val df = graft.engine.Engine.sqlScript(session, sql)
        // chunked: each sealed record batch flushes to the client — a huge
        // result never becomes one driver-side array (gRPC do_get likewise
        // sends a stream of batches)
        ex.getResponseHeaders.set("Content-Type", arrowType)
        ex.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
        ex.sendResponseHeaders(200, 0)
        val os = new java.io.BufferedOutputStream(ex.getResponseBody, 64 * 1024)
        try { ArrowIO.toArrowStreamTo(df, os); os.flush() }
        finally { try os.close() catch { case _: Throwable => }; ex.close() }
      case "/flight/do_put" | "/flight/do_exchange" =>
        params.get("table") match {
          case None => respond(ex, 400, "missing table param\n".getBytes, "text/plain")
          case Some(table) =>
            // both routes use the incremental per-batch append (the
            // reference's do_exchange shape, main.py:1057-1075) reading
            // straight from the request stream — the upload body is never
            // materialized driver-side
            val resp = FlightActions.doExchange(session, table, ex.getRequestBody)
            respond(ex, 200, resp, arrowType)
        }
      case "/flight/info" =>
        // path mode first (reference main.py:834-851): ?path=show_databases
        // names a canned flight — reply is its schema-only IPC stream, the
        // ticket SQL echoed in a header so the client can do_get it
        params.get("path") match {
          case Some(p) =>
            FlightActions.pathFlightInfo(session, p) match {
              case Some((schema, ticket)) =>
                ex.getResponseHeaders.set("X-Flight-Ticket", ticket)
                respond(ex, 200, ArrowIO.schemaIpc(schema), arrowType)
              case None =>
                respond(ex, 404, s"no flight for path $p\n".getBytes, "text/plain")
            }
            return
          case None =>
        }
        val sql = params.getOrElse("query", new String(body(), StandardCharsets.UTF_8))
        if (sql.trim.isEmpty) { respond(ex, 400, "no query\n".getBytes, "text/plain"); return }
        // schema without execution (S20): an empty-limit plan carries the
        // analyzed schema through the IPC stream header
        val df = graft.engine.Engine.sql(session, sql).limit(0)
        respond(ex, 200, ArrowIO.toArrowStream(df), arrowType)
      case "/flight/list_flights" =>
        // filters arrive as the reference's airport-* headers or as query
        // params; both filters present → table listing, else canned flights
        def filter(header: String, param: String): Option[String] =
          Option(ex.getRequestHeaders.getFirst(header)).orElse(params.get(param))
        respond(ex, 200, FlightActions.listFlightsEnvelope(session,
          filter("airport-list-flights-filter-catalog", "catalog"),
          filter("airport-list-flights-filter-schema", "schema")),
          "application/octet-stream")
      case "/flight/list_schemas" =>
        respond(ex, 200,
          FlightActions.listSchemas(session, params.getOrElse("catalog", "spark_catalog")),
          "application/octet-stream")
      case _ =>
        respond(ex, 404, s"unknown flight endpoint $path\n".getBytes, "text/plain")
    }
  }

  private def serveUi(ex: HttpExchange): Unit = {
    val html = uiDir.map(d => new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d, "index.html")), StandardCharsets.UTF_8))
      .getOrElse(PlayUi.html)
    val bytes = html.getBytes(StandardCharsets.UTF_8)
    if (ex.getRequestMethod == "HEAD") {
      ex.getResponseHeaders.set("Content-Type", "text/html; charset=UTF-8")
      ex.getResponseHeaders.set("Content-Length", bytes.length.toString)
      ex.sendResponseHeaders(200, -1)
      ex.close()
    } else respond(ex, 200, bytes, "text/html; charset=UTF-8")
  }

  private def serveQuery(ex: HttpExchange): Unit = {
    val params = queryParams(ex)
    val auth = tenants.parseAuthHeader(
      Option(ex.getRequestHeaders.getFirst("Authorization")))
    val defaultFormat = params.getOrElse("default_format", "JSONCompact")
    val queryId = params.get("query_id")
    val paramQuery = params.getOrElse("query", "")

    // POST INSERT with NDJSON body (reference main.py:228-229,196-211):
    // the body streams straight off the socket into chunked appends — it
    // is never read into a String (a large bulk insert would OOM the
    // server; the other branches below still need the full body as SQL)
    val insertTarget = if (ex.getRequestMethod == "POST" && paramQuery.nonEmpty)
      QueryExecutor.insertTarget(paramQuery) else None
    if (insertTarget.isDefined) {
      val session = tenants.sessionFor(auth, params.get("database"))
      QueryExecutor.runInsertStream(session, insertTarget.get, ex.getRequestBody) match {
        case Right(r) =>
          queryId.foreach(id => cache.put(id, r.bytes))
          respond(ex, 200, r.bytes)
        case Left(err) =>
          respond(ex, 400, (err + "\n").getBytes(StandardCharsets.UTF_8), "text/plain")
      }
      return
    }

    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

    // cache replay: query_id with no query (reference main.py:276-278)
    if (paramQuery.isEmpty && body.isEmpty && queryId.nonEmpty) {
      cache.get(queryId.get) match {
        case Some(bytes) => respond(ex, 200, bytes); return
        case None => respond(ex, 404, "query_id not cached\n".getBytes, "text/plain"); return
      }
    }

    val session = tenants.sessionFor(auth, params.get("database"))

    val sql = if (paramQuery.nonEmpty && body.nonEmpty) s"$paramQuery\n$body"
      else if (paramQuery.nonEmpty) paramQuery else body
    if (sql.trim.isEmpty) { respond(ex, 400, "no query\n".getBytes, "text/plain"); return }
    // HEAD: execute, report Content-Length + Accept-Ranges, no body
    // (reference main.py:290-298 — it too must produce the bytes to
    // know the length)
    if (ex.getRequestMethod == "HEAD") {
      QueryExecutor.run(session, sql, defaultFormat) match {
        case Right(r) =>
          ex.getResponseHeaders.set("Content-Type", "application/json; charset=UTF-8")
          ex.getResponseHeaders.set("Accept-Ranges", "bytes")
          ex.getResponseHeaders.set("Content-Length", r.bytes.length.toString)
          ex.sendResponseHeaders(200, -1)
          ex.close()
        case Left(err) =>
          respond(ex, 400, (err + "\n").getBytes(StandardCharsets.UTF_8), "text/plain")
      }
      return
    }
    QueryExecutor.prepare(session, sql, defaultFormat) match {
      case Left(err) =>
        respond(ex, 400, (err + "\n").getBytes(StandardCharsets.UTF_8), "text/plain")
      case Right(p) =>
        // chunked streaming (length 0): the encoder flushes per batch,
        // so a huge SELECT never materializes its body on the driver.
        // Analysis already happened in prepare — only runtime failures
        // can strike mid-stream (client sees a truncated chunked body).
        ex.getResponseHeaders.set("Content-Type", "application/json; charset=UTF-8")
        ex.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
        ex.sendResponseHeaders(200, 0)
        val os = new java.io.BufferedOutputStream(ex.getResponseBody, 64 * 1024)
        // query_id caching needs the bytes — tee them only when asked
        val cacheBuf = queryId.map(_ => new java.io.ByteArrayOutputStream())
        val sink: java.io.OutputStream = cacheBuf match {
          case Some(b) => new TeeOutputStream(os, b)
          case None => os
        }
        try {
          graft.formats.Encoders.encodeTo(p.df, p.format, p.t0, sink)
          sink.flush()
          // cache only a COMPLETE result — a mid-stream failure must
          // not leave a truncated body replayable under its query_id
          cacheBuf.foreach(b => cache.put(queryId.get, b.toByteArray))
        } finally {
          try os.close() catch { case _: Throwable => }
          ex.close()
        }
    }
  }

  /** Duplicates writes into the cache buffer; flush/close act on the
    * response stream only. */
  private final class TeeOutputStream(main: java.io.OutputStream,
      copy: java.io.OutputStream) extends java.io.OutputStream {
    override def write(b: Int): Unit = { main.write(b); copy.write(b) }
    override def write(buf: Array[Byte], off: Int, len: Int): Unit = {
      main.write(buf, off, len); copy.write(buf, off, len)
    }
    override def flush(): Unit = main.flush()
    override def close(): Unit = main.close()
  }
}

/** Standalone entry point (reference S24 lifecycle, `main.py:1107-1127`). */
object HttpServerMain {
  def main(args: Array[String]): Unit = {
    val port = sys.env.getOrElse("GRAFT_HTTP_PORT", "8123").toInt
    val spark = graft.engine.Engine.localSession()
    sys.env.get("SPARK_GRAFT_SF_DIR").foreach(d => graft.engine.Engine.registerTables(spark, d))
    graft.functions.GraftFunctions.register(spark)
    val s = new HttpServer(spark, port, sys.env.get("GRAFT_UI_DIR"))
    val actual = s.start()
    println(s"graft-spark HTTP listening on :$actual")
    Thread.currentThread.join()
  }
}
