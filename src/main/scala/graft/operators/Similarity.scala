package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, HyperplaneSig}

/** Similarity search over an embedding column (`array<float>`), SURVEY
  * §2.11 north star.
  *
  * Three tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k. One broadcast of the query
  *    vector, one scan, a TakeOrderedAndProject — the right baseline, and
  *    already distributed (scan parallelism = input splits).
  *  - [[annTopK]] / [[Dedup.embeddingPairs]]: random-hyperplane LSH buckets
  *    prune the scan to candidate buckets; recall is tunable via `planes` /
  *    `probes`.
  *  - [[buildAnnIndex]] + [[annTopKIndexed]]: the 100 TB path. Signatures
  *    are computed ONCE at ingest and persisted as a bucketed-by-signature
  *    table; each query derives its probe buckets driver-side (no Spark job
  *    over the corpus) and pushes them down as an IN filter, so the scan
  *    touches only candidate buckets.
  *
  * Hyperplanes are pseudo-random but fully deterministic (SplitMix64 of
  * (plane, dim), [[HyperplaneSig.component]]), so signatures are
  * reproducible across runs and clusters with no model to ship.
  */
object Similarity {

  /** `planes`-bit signature of a float vector: bit j = sign(v · r_j).
    * Backed by the codegen'd [[HyperplaneSig]] expression — one pass over
    * the vector for all planes. */
  def hyperplaneSignature(vec: Column, planes: Int): Column =
    GraftFunctions.hyperplane_sig(vec, planes)

  /** Exact cosine top-k against one query vector (broadcast). */
  def bruteForceTopK(
      emb: DataFrame,
      queryVec: DataFrame, // single row, one array<float> column named "qv"
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    emb.crossJoin(broadcast(queryVec))
      .select(col(idCol), GraftFunctions.cosine_sim(col(vecCol), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** ANN top-k: restrict the scan to the query's LSH bucket (plus
    * `probes` single-bit-flip neighbor buckets), exact cosine within. */
  def annTopK(
      emb: DataFrame,
      queryVec: DataFrame,
      k: Int,
      planes: Int = 8,
      probes: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val q = queryVec.select(col("qv"), hyperplaneSignature(col("qv"), planes).as("qsig"))
    val flips = (0 until math.min(probes, planes)).map(j =>
      col("qsig").bitwiseXOR(lit(1L << j)))
    val probeSigs = q.select(col("qv"),
      explode(array(col("qsig") +: flips: _*)).as("sig"))
    val bucketed = emb.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), planes).as("sig"))
    bucketed.join(broadcast(probeSigs), "sig")
      .select(col(idCol), GraftFunctions.cosine_sim(col(vecCol), col("qv")).as("cosine"))
      .dropDuplicates(idCol)
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Plane count that keeps expected bucket population near
    * `targetBucketSize` for a corpus of `corpusSize` vectors — the knob that
    * keeps the bucket self-join linear as data grows (2^planes buckets;
    * within-bucket pair work is quadratic in bucket size). Demo entries pin
    * small plane counts for recall on tiny fixtures; at 100 TB call this. */
  def planesFor(corpusSize: Long, targetBucketSize: Int = 256): Int = {
    require(corpusSize > 0 && targetBucketSize > 0)
    val p = math.ceil(math.log(corpusSize.toDouble / targetBucketSize) / math.log(2)).toInt
    math.min(64, math.max(1, p))
  }

  // ---- persisted-index tier (the 100 TB path) ---------------------------

  /** One-time index build: materialize the signature column and bucket the
    * table BY signature. Pay one signature pass + one shuffle at ingest;
    * every later query prunes to its probe buckets. */
  def buildAnnIndex(
      emb: DataFrame,
      indexTable: String,
      planes: Int = 8,
      numBuckets: Int = 16,
      vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    GraftFunctions.register(spark)
    // a previous JVM may have left the warehouse dir without a catalog
    // entry (fresh session, persistent cwd) — saveAsTable would then fail
    // on LOCATION_ALREADY_EXISTS
    if (!spark.catalog.tableExists(indexTable)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        .stripPrefix("file:")
      val stale = new java.io.File(wh, indexTable.toLowerCase)
      if (stale.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(stale)
      }
    }
    Partitioning.writeBucketed(
      emb.withColumn("sig", hyperplaneSignature(col(vecCol), planes)),
      indexTable, Seq("sig"), numBuckets)
  }

  /** ANN top-k against a persisted index. The query's signature and its
    * `probes` single-bit-flip neighbors are computed on the DRIVER
    * ([[HyperplaneSig.signatureOf]]) — no per-query signature job over the
    * corpus — and pushed down as `sig IN (...)`, which Spark's bucket
    * pruning turns into a candidate-buckets-only scan. */
  def annTopKIndexed(
      spark: SparkSession,
      indexTable: String,
      queryVec: Array[Float],
      k: Int,
      planes: Int = 8,
      probes: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(spark)
    val qsig = HyperplaneSig.signatureOf(queryVec, planes)
    val sigs = (qsig +: (0 until math.min(probes, planes)).map(j => qsig ^ (1L << j))).distinct
    // DisableUnnecessaryBucketedScan would demote the scan (no join wants
    // the distribution) and forfeit bucket PRUNING — the entire point of
    // the bucketed index. The conf must differ from the session default,
    // but flipping it on the shared session is a race: another thread
    // planning during the set→restore window silently loses its
    // auto-bucketed-scan demotion. Index scans therefore plan on a cached
    // per-base-session CLONE (shared catalog and executor pools, its own
    // SQLConf) that pins the conf off permanently.
    val s2 = indexScanSession(spark)
    GraftFunctions.register(s2)
    s2.table(indexTable)
      .filter(col("sig").isin(sigs: _*))
      .select(col(idCol),
        GraftFunctions.cosine_sim(col(vecCol), typedLit(queryVec.toSeq)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  // one scan-tuned clone per base session; WeakHashMap so a retired base
  // session doesn't pin its clone
  private val scanSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())

  private def indexScanSession(spark: SparkSession): SparkSession =
    scanSessions.synchronized {
      val cached = scanSessions.get(spark)
      if (cached != null) cached
      else {
        val s = spark.newSession()
        s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        scanSessions.put(spark, s)
        s
      }
    }
}
