package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dialect.{Sanitizer, Translator}

/** Session + catalog glue: registers the fixture tables as temp views and
  * executes dialect-translated SQL.
  *
  * Plays the role of the reference's connection manager
  * (`/root/reference/main.py:71-132`): there the engine is a per-tenant
  * embedded DuckDB; here it is one shared SparkSession with views/databases
  * as the namespace.
  */
object Engine {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register each `<dir>/<table>.parquet` as a temp view named by file stem
    * (the driver's DuckDB oracle does the same). Idempotent; re-registers
    * only when the directory changes for this session. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    val key = "graft.registered.dir"
    val cur = spark.conf.getOption(key)
    if (!cur.contains(dir)) {
      // Parquet TIMESTAMP(NANOS) (events.ts) is rejected by Spark's reader
      // unless read as raw long; we convert back to TimestampType at micro
      // precision (Spark's native resolution — DuckDB keeps ns, a <1µs
      // truncation that cannot affect the declared queries, which never
      // project a ns timestamp).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      tableNames.foreach { t =>
        val path = s"$dir/$t.parquet"
        if (new java.io.File(path).exists()) {
          val raw = spark.read.parquet(path)
          val df = nanoLongCols(path).foldLeft(raw) { (d, c) =>
            d.withColumn(c, org.apache.spark.sql.functions.expr(
              s"timestamp_micros(CAST($c DIV 1000 AS BIGINT))"))
          }
          df.createOrReplaceTempView(t)
        }
      }
      spark.conf.set(key, dir)
    }
  }

  /** Columns annotated TIMESTAMP(NANOS) in the parquet footer — these come
    * back as raw long under nanosAsLong and need explicit conversion. */
  private def nanoLongCols(path: String): Seq[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
    import scala.jdk.CollectionConverters._
    try {
      val in = HadoopInputFile.fromPath(new Path(path), new Configuration())
      val reader = ParquetFileReader.open(in)
      try {
        reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
          case f if Option(f.getLogicalTypeAnnotation).exists {
            case t: TimestampLogicalTypeAnnotation => t.getUnit == TimeUnit.NANOS
            case _ => false
          } => f.getName
        }.toSeq
      } finally reader.close()
    } catch { case _: Throwable => Nil }
  }

  /** DuckDB `COPY <table | (query)> TO '<path>' (FORMAT X [, HEADER])` →
    * a distributed `df.write`. Returns the 1-row `Count` result DuckDB
    * produces. */
  private val copyToRe =
    "(?is)^\\s*COPY\\s+(.+?)\\s+TO\\s+'([^']+)'\\s*(?:\\(([^)]*)\\))?\\s*$".r

  private def runCopyTo(spark: SparkSession, source: String, path: String,
      opts: String): DataFrame = {
    val df =
      if (source.trim.startsWith("(")) sql(spark, source.trim.stripPrefix("(").stripSuffix(")"))
      else spark.table(source.trim)
    val optU = opts.toUpperCase
    val format =
      if (optU.contains("PARQUET")) "parquet"
      else if (optU.contains("JSON")) "json"
      else "csv"
    // single execution: the row count is observed during the write job
    // itself (a count()-then-save would scan the source twice — at 100 TB
    // an export query must not run twice)
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val writer = observed.write.mode("overwrite").format(format)
    val withHeader = if (format == "csv" && (optU.contains("HEADER") || optU.isEmpty))
      writer.option("header", "true") else writer
    withHeader.save(path)
    val n = obs.get("n").asInstanceOf[Long]
    import spark.implicits._
    Seq(n).toDF("Count")
  }

  private val summarizeRe = "(?is)^\\s*SUMMARIZE\\s+([\\w.`\"]+)\\s*$".r

  /** Translate one DuckDB-dialect statement and run it. */
  def sql(spark: SparkSession, duckSql: String): DataFrame = {
    duckSql match {
      case copyToRe(source, path, opts) =>
        return runCopyTo(spark, source, path, Option(opts).getOrElse(""))
      case summarizeRe(table) =>
        // DuckDB SUMMARIZE → per-column stats (Spark's summary())
        return spark.table(table.replaceAll("[`\"]", "")).summary()
      case _ =>
    }
    graft.functions.GraftFunctions.register(spark) // idempotent; version() etc.
    val t = Translator.translate(duckSql)
    t.views.foreach { v =>
      v.format match {
        case "csv" => spark.read.option("header", "true")
          .option("inferSchema", "true").csv(v.path).createOrReplaceTempView(v.name)
        case f => spark.read.format(f).load(v.path).createOrReplaceTempView(v.name)
      }
    }
    if (t.sql.contains("graft_infoschema_")) registerInfoSchema(spark)
    spark.sql(t.sql)
  }

  /** `information_schema` emulation (reference queries it for catalog
    * actions, `/root/reference/main.py:548-556,888-901`): snapshot views
    * over `spark.catalog`, refreshed per referencing query. */
  def registerInfoSchema(spark: SparkSession): Unit = {
    import spark.implicits._
    val dbs = spark.catalog.listDatabases().collect()
    dbs.map(d => (spark.catalog.currentCatalog(), d.name, "public"))
      .toSeq.toDF("catalog_name", "schema_name", "schema_owner")
      .createOrReplaceTempView("graft_infoschema_schemata")
    val tables = dbs.flatMap(d => spark.catalog.listTables(d.name).collect())
    tables.map(tb => (spark.catalog.currentCatalog(),
        Option(tb.namespace).map(_.mkString(".")).getOrElse(""), tb.name,
        tb.tableType))
      .toSeq.toDF("table_catalog", "table_schema", "table_name", "table_type")
      .createOrReplaceTempView("graft_infoschema_tables")
    val cols = tables.flatMap { tb =>
      val fq = (Option(tb.namespace).getOrElse(Array.empty[String]) :+ tb.name).mkString(".")
      try spark.catalog.listColumns(fq).collect().zipWithIndex.map { case (c, i) =>
        (Option(tb.namespace).map(_.mkString(".")).getOrElse(""), tb.name,
          c.name, i + 1, c.dataType, c.nullable)
      } catch { case _: Throwable => Array.empty[(String, String, String, Int, String, Boolean)] }
    }
    cols.toSeq
      .toDF("table_schema", "table_name", "column_name", "ordinal_position",
        "data_type", "is_nullable")
      .createOrReplaceTempView("graft_infoschema_columns")
  }

  /** Multi-statement ticket execution: run serially, return the last result
    * (reference behavior, `/root/reference/examples/flight_read.py:7`). */
  def sqlScript(spark: SparkSession, script: String): DataFrame = {
    val stmts = Sanitizer.splitStatements(script)
    require(stmts.nonEmpty, "empty SQL script")
    stmts.map(s => sql(spark, s)).last
  }

  /** Standard local session for tests/benchmarks: 32 shuffle partitions to
    * match local[32] (not the 200 default sized for real clusters), AQE on so
    * plans re-partition/de-skew at runtime the way they would at scale. */
  def localSession(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    // AQE on by default (the scale posture: runtime re-partitioning and skew
    // handling); SPARK_GRAFT_AQE=false trades it away for lower per-stage
    // latency on interactive/small workloads.
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
