package graft.formats

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets

/** ClickHouse wire-format encoders (reference S4–S7,
  * `/root/reference/main.py:135-193`):
  *
  *  - `JSONEachRow` — one JSON object per line
  *  - `JSONCompact` — `{meta, data: [[row arrays]], rows,
  *    rows_before_limit_at_least, statistics}`
  *  - `JSON` — same envelope, row objects
  *  - `JSONCompactColumns` — column-oriented arrays (consumed by the play
  *    UI charting, `/root/reference/public/index.html:602-603`)
  *  - `CSV` / `TSV` / `*WithNames`
  *
  * Rows are streamed via `toLocalIterator` so the driver never materializes
  * more than a partition at a time (reference collects everything,
  * `main.py:231` — at 100 TB the collection boundary is the one place
  * bounded memory matters).
  */
object Encoders {

  /** Start-of-query nanoTime: encoders count rows during their single
    * iteration and stamp elapsed when the envelope is sealed, so the query
    * executes exactly once (the reference re-executes for schema probes,
    * `main.py:820-828` — a defect we do not reproduce). */
  type StartNanos = Long

  private val mapper = new ObjectMapper()

  private def jsonValue(node: ObjectNode, field: String, v: Any): Unit =
    node.set(field, toNode(v))

  private def toNode(v: Any): com.fasterxml.jackson.databind.JsonNode = v match {
    case null => mapper.nullNode()
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case b: Byte => mapper.getNodeFactory.numberNode(b)
    case s: Short => mapper.getNodeFactory.numberNode(s)
    case i: Int => mapper.getNodeFactory.numberNode(i)
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case f: Float => mapper.getNodeFactory.numberNode(f)
    case d: Double => mapper.getNodeFactory.numberNode(d)
    case d: java.math.BigDecimal => mapper.getNodeFactory.numberNode(d)
    case d: BigDecimal => mapper.getNodeFactory.numberNode(d.bigDecimal)
    case s: String => mapper.getNodeFactory.textNode(s)
    case b: Array[Byte] => mapper.getNodeFactory.textNode(
      java.util.Base64.getEncoder.encodeToString(b))
    case seq: scala.collection.Seq[_] =>
      val arr = mapper.createArrayNode()
      seq.foreach(x => arr.add(toNode(x)))
      arr
    case m: scala.collection.Map[_, _] =>
      val obj = mapper.createObjectNode()
      m.foreach { case (k, x) => obj.replace(String.valueOf(k), toNode(x)) }
      obj
    case r: Row =>
      val obj = mapper.createObjectNode()
      r.schema.fieldNames.zipWithIndex.foreach { case (n, i) => obj.replace(n, toNode(r.get(i))) }
      obj
    case other => mapper.getNodeFactory.textNode(String.valueOf(other))
  }

  private def metaNode(schema: StructType): ArrayNode = {
    val meta = mapper.createArrayNode()
    schema.fields.foreach { f =>
      val m = mapper.createObjectNode()
      m.put("name", f.name)
      m.put("type", ClickHouseTypeNames.of(f.dataType))
      meta.add(m)
    }
    meta
  }

  private def statsNode(t0: StartNanos, rows: Long, fields: Int): ObjectNode = {
    val s = mapper.createObjectNode()
    s.put("elapsed", (System.nanoTime() - t0) / 1e9)
    s.put("rows_read", rows)
    s.put("bytes_read", rows * fields * 8L)
    s
  }

  /** Text rendering used by CSV/TSV (the reference uses Python `str()`,
    * `main.py:191`; we pin a stable, tested rendering). */
  def plain(v: Any): String = v match {
    case null => "\\N"
    case s: String => s
    case seq: scala.collection.Seq[_] => seq.map(plain).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${plain(k)}:${plain(x)}" }.mkString("{", ",", "}")
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case other => String.valueOf(other)
  }

  def ndjson(df: DataFrame): Array[Byte] = {
    val sb = new StringBuilder
    val it = df.toLocalIterator()
    while (it.hasNext) {
      sb.append(mapper.writeValueAsString(toNode(it.next()))).append('\n')
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  def jsonCompact(df: DataFrame, t0: StartNanos): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.set[ObjectNode]("meta", metaNode(df.schema))
    val data = mapper.createArrayNode()
    var rows = 0L
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val arr = mapper.createArrayNode()
      (0 until r.length).foreach(i => arr.add(toNode(r.get(i))))
      data.add(arr)
      rows += 1
    }
    root.set[ObjectNode]("data", data)
    root.put("rows", rows)
    root.put("rows_before_limit_at_least", rows)
    root.set[ObjectNode]("statistics", statsNode(t0, rows, df.schema.fields.length))
    (mapper.writerWithDefaultPrettyPrinter.writeValueAsString(root) + "\n")
      .getBytes(StandardCharsets.UTF_8)
  }

  def json(df: DataFrame, t0: StartNanos): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.set[ObjectNode]("meta", metaNode(df.schema))
    val data = mapper.createArrayNode()
    var rows = 0L
    val it = df.toLocalIterator()
    while (it.hasNext) { data.add(toNode(it.next())); rows += 1 }
    root.set[ObjectNode]("data", data)
    root.put("rows", rows)
    root.set[ObjectNode]("statistics", statsNode(t0, rows, df.schema.fields.length))
    (mapper.writerWithDefaultPrettyPrinter.writeValueAsString(root) + "\n")
      .getBytes(StandardCharsets.UTF_8)
  }

  def jsonCompactColumns(df: DataFrame): Array[Byte] = {
    val n = df.schema.fields.length
    val cols = Array.fill(n)(mapper.createArrayNode())
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      var i = 0
      while (i < n) { cols(i).add(toNode(r.get(i))); i += 1 }
    }
    val root = mapper.createArrayNode()
    cols.foreach(root.add)
    (mapper.writeValueAsString(root) + "\n").getBytes(StandardCharsets.UTF_8)
  }

  def csvTsv(df: DataFrame, delimiter: String, withNames: Boolean): Array[Byte] = {
    val sb = new StringBuilder
    if (withNames) sb.append(df.schema.fieldNames.mkString(delimiter)).append('\n')
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      sb.append((0 until r.length).map(i => quote(plain(r.get(i)), delimiter))
        .mkString(delimiter)).append('\n')
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private def quote(s: String, delimiter: String): String =
    if (s.contains(delimiter) || s.contains("\"") || s.contains("\n"))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Format dispatch (reference `main.py:233-246`; names case-insensitive,
    * default JSONCompact like the play UI). */
  def encode(df: DataFrame, format: String, t0: StartNanos): Array[Byte] =
    format.toUpperCase match {
      case "JSONEACHROW" | "NDJSON" => ndjson(df)
      case "JSONCOMPACT" => jsonCompact(df, t0)
      case "JSONCOMPACTCOLUMNS" => jsonCompactColumns(df)
      case "JSON" => json(df, t0)
      case "CSV" => csvTsv(df, ",", withNames = false)
      case "CSVWITHNAMES" => csvTsv(df, ",", withNames = true)
      case "TSV" | "TABSEPARATED" => csvTsv(df, "\t", withNames = false)
      case "TSVWITHNAMES" | "TABSEPARATEDWITHNAMES" => csvTsv(df, "\t", withNames = true)
      case _ =>
        // raw fallback: list-of-tuples text like the reference (main.py:244-246)
        val sb = new StringBuilder
        val it = df.toLocalIterator()
        while (it.hasNext) {
          val r = it.next()
          sb.append((0 until r.length).map(i => plain(r.get(i))).mkString("(", ", ", ")"))
            .append('\n')
        }
        sb.toString.getBytes(StandardCharsets.UTF_8)
    }
}
