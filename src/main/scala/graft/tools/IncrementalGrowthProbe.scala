package graft.tools

import graft.engine.Engine
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Production-regime growth probe for the incremental dedup family
  * (r11, VERDICT r10 #2): hold the INCREMENT fixed (p63's planted
  * near-dup copies of the base corpus) while the INDEXED corpus grows by
  * the given factors, and time only the incremental query — the nightly
  * crawl-against-growing-corpus shape the p62/p63 fixtures cannot show
  * (they scale increment and corpus together, so the candidate
  * cross-product grows quadratically; BASELINE.md round-10 recorded a
  * 4.4× at 3× data for exactly that reason).
  *
  * Corpus copies beyond the first are DECORRELATED (per-copy sign-flip
  * pattern over the dimensions), mirroring a real corpus where new
  * content is new: the planted increment keeps matching only the
  * original base copy, so the true-pair count is constant across
  * factors and any growth in runtime is index-side cost (bucket
  * occupancy + band-table scan), which is the claim under test.
  *
  * Plane count follows the p63 entry's own sizing rule
  * (`planesFor(n, 32)` clamped to [4, 12]) so bucket occupancy is what
  * production would see at each corpus size.
  *
  * r12 (VERDICT r11 #4): a `minhash` mode measures p62 the same way —
  * fixed increment = the p62 entry's own split (doc_id % 5 == 0),
  * indexed corpus = the complement grown by the factors, copies beyond
  * the first DECORRELATED textually (every token gets a per-copy
  * suffix, so every 3-token shingle window re-hashes and buckets fill
  * with genuinely new content; the increment keeps matching only the
  * original copy and the pair count stays constant). Band sizing is the
  * entry's own fixed (numHashes=64, bands=16, shingle=3) — minhash
  * banding does not scale with corpus size in the entry either, so
  * per-bucket occupancy genuinely rises with the factor (that cost is
  * the claim under test).
  *
  * Run: `sbt "runMain graft.tools.IncrementalGrowthProbe <sfDir>
  * [factors=1,3,10,30] [iters=3] [mode=embedding|minhash]"`. Prints one
  * line per factor: factor, corpus rows, (planes,) pair count,
  * min/median seconds. */
object IncrementalGrowthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factors: Seq[Int] =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(1, 3, 10, 30)
    val iters = if (args.length > 2) args(2).toInt else 3
    val mode = if (args.length > 3) args(3) else "embedding"
    val spark = Engine.localSession()
    Engine.registerTables(spark, sfDir)
    if (mode == "minhash") { minhashMode(spark, factors, iters); return }
    if (mode == "maint") { maintMode(spark, factors, iters); return }
    val base = spark.table("embeddings").select(col("vec_id"), col("embedding"))
    val nBase = base.count()
    // p63's fixed increment: elementwise-jittered copies of the base —
    // rebuilt per run (the between-run block drop would evict a shared
    // checkpoint; the rebuild cost is part of the entry's own shape)
    def planted = base.select((col("vec_id") + 10000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x * (lit(1.0) + lit(0.01) * ((i + 1) % 2))).cast("float"))
        .as("embedding"))
    def dropLeftoverBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    factors.foreach { f =>
      val copies = (0 until f).map { k =>
        if (k == 0) base
        else base.select((col("vec_id") + k.toLong * 1000000L).as("vec_id"),
          // sign-flip a k-dependent subset of dims: far from every other
          // copy in cosine, so buckets fill with genuinely new content
          transform(col("embedding"), (x, i) =>
            when((i * (k + 2)) % 5 < 2, -x).otherwise(x).cast("float"))
            .as("embedding"))
      }
      val corpus = copies.reduce(_ unionAll _)
      val n = nBase * f
      val p = math.max(4, math.min(Similarity.planesFor(n, 32), 12))
      val idx = s"graft_growth_idx_f$f"
      Dedup.buildEmbeddingIndex(corpus, idx, planesPerBand = p, bands = 5)
      def run(): (Long, Double) = {
        val t0 = System.nanoTime()
        val pairs = Dedup.embeddingPairsIncremental(planted, idx,
          minCosine = 0.99, planesPerBand = p, bands = 5).count()
        val t = (System.nanoTime() - t0) / 1e9
        dropLeftoverBlocks()
        (pairs, t)
      }
      run() // warmup
      val rs = (1 to iters).map(_ => run())
      val ts = rs.map(_._2).sorted
      println(f"GROWTH f=$f%-3d corpus=$n%-7d planes=$p pairs=${rs.head._1}%-6d " +
        f"min=${ts.head}%.2fs median=${ts(ts.length / 2)}%.2fs")
      spark.sql(s"DROP TABLE IF EXISTS $idx")
      spark.sql(s"DROP TABLE IF EXISTS ${idx}_bands")
    }
    spark.stop()
  }

  private def minhashMode(spark: org.apache.spark.sql.SparkSession,
      factors: Seq[Int], iters: Int): Unit = {
    val docs = spark.table("documents").select(col("doc_id"), col("text"))
    val corpusBase = docs.filter(col("doc_id") % 5 =!= 0)
    val nBase = corpusBase.count()
    def increment = docs.filter(col("doc_id") % 5 === 0)
    def dropLeftoverBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    factors.foreach { f =>
      val copies = (0 until f).map { k =>
        if (k == 0) corpusBase
        else corpusBase.select(
          (col("doc_id") + k.toLong * 10000000L).as("doc_id"),
          // per-copy token suffix: every 3-token shingle window hashes
          // differently, so the copy is band-space-decorrelated from the
          // original and from every other copy
          regexp_replace(col("text"), lit(" "), lit(s"_$k ")).as("text"))
      }
      val corpus = copies.reduce(_ unionAll _)
      val idx = s"graft_growth_mh_f$f"
      Dedup.buildMinhashIndex(corpus, idx)
      def run(): (Long, Double) = {
        val t0 = System.nanoTime()
        val pairs = Dedup.minhashPairsIncremental(increment, idx,
          threshold = 0.5).count()
        val t = (System.nanoTime() - t0) / 1e9
        dropLeftoverBlocks()
        (pairs, t)
      }
      run() // warmup
      val rs = (1 to iters).map(_ => run())
      val ts = rs.map(_._2).sorted
      println(f"GROWTH-MH f=$f%-3d corpus=${nBase * f}%-7d " +
        f"pairs=${rs.head._1}%-6d min=${ts.head}%.2fs median=${ts(ts.length / 2)}%.2fs")
      spark.sql(s"DROP TABLE IF EXISTS $idx")
      spark.sql(s"DROP TABLE IF EXISTS ${idx}_bands")
    }
    spark.stop()
  }

  /** r13 (VERDICT r12 #2): the STALE-GEOMETRY counterfactual the r11/r12
    * growth rows sized away. Build the index at the f=1 geometry, grow
    * the DECORRELATED corpus by each factor WITHOUT re-banding, measure
    * the increment, then run [[Dedup.maintainEmbeddingIndex]] (the
    * production occupancy trigger, default thresholds) and measure
    * again — the stale-vs-rebuilt delta is the cost the maintenance op
    * exists to reclaim. Pair counts must match before/after (the re-band
    * preserves the contract; duplicate-grade pairs survive any
    * geometry). */
  private def maintMode(spark: org.apache.spark.sql.SparkSession,
      factors: Seq[Int], iters: Int): Unit = {
    val base = spark.table("embeddings").select(col("vec_id"), col("embedding"))
    val nBase = base.count()
    val pStale = math.max(4, math.min(Similarity.planesFor(nBase, 32), 12))
    def planted = base.select((col("vec_id") + 10000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x * (lit(1.0) + lit(0.01) * ((i + 1) % 2))).cast("float"))
        .as("embedding"))
    def dropLeftoverBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    factors.foreach { f =>
      val copies = (0 until f).map { k =>
        if (k == 0) base
        else base.select((col("vec_id") + k.toLong * 1000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when((i * (k + 2)) % 5 < 2, -x).otherwise(x).cast("float"))
            .as("embedding"))
      }
      val corpus = copies.reduce(_ unionAll _)
      val idx = s"graft_maint_idx_f$f"
      // the index keeps the f=1 geometry — the live-index-that-grew shape
      Dedup.buildEmbeddingIndex(corpus, idx, planesPerBand = pStale, bands = 5)
      def run(p: Int): (Long, Double) = {
        val t0 = System.nanoTime()
        val pairs = Dedup.embeddingPairsIncremental(planted, idx,
          minCosine = 0.99, planesPerBand = p, bands = 5).count()
        val t = (System.nanoTime() - t0) / 1e9
        dropLeftoverBlocks()
        (pairs, t)
      }
      run(pStale) // warmup
      val staleRs = (1 to iters).map(_ => run(pStale))
      val staleTs = staleRs.map(_._2).sorted
      val tM0 = System.nanoTime()
      val h = Dedup.maintainEmbeddingIndex(spark, idx, bands = 5)
      val tMaint = (System.nanoTime() - tM0) / 1e9
      val pNow = h.targetGeometry
      if (h.rebuilt) run(pNow) // warmup on the new layout
      val newRs = (1 to iters).map(_ => run(if (h.rebuilt) pNow else pStale))
      val newTs = newRs.map(_._2).sorted
      println(f"MAINT f=$f%-3d corpus=${nBase * f}%-7d pStale=$pStale " +
        f"p95=${h.p95Occupancy}%.0f staleMed=${staleTs(staleTs.length / 2)}%.2fs " +
        f"rebuilt=${h.rebuilt} pNew=$pNow maint=${tMaint}%.2fs " +
        f"newMed=${newTs(newTs.length / 2)}%.2fs " +
        f"pairsStale=${staleRs.head._1} pairsNew=${newRs.head._1}")
      spark.sql(s"DROP TABLE IF EXISTS $idx")
      spark.sql(s"DROP TABLE IF EXISTS ${idx}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${idx}_meta")
    }
    spark.stop()
  }
}
