package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Deduplication operators for training-data pipelines (SURVEY §2.11).
  *
  * Every variant is shuffle-bounded: candidate generation always goes
  * through a `groupBy`/join on a bucket key (hash, LSH band, simhash band),
  * never a cross join — the O(n²) pair space is only materialized inside
  * buckets, which stay small under any reasonable hash. This is the property
  * that survives 100 TB; the exact-verify step then touches only candidate
  * pairs.
  */
object Dedup {

  /** Exact dedup: first doc per md5(text) survives. One hash shuffle. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-dup groups: hash → surviving id + duplicate count. */
  def exactGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(idCol).as("keep_id"), count("*").as("dups"))

  /** Incremental (cross-corpus) exact dedup: keep the rows of `newDocs`
    * whose content hash does not appear anywhere in `oldDocs` — the
    * batch-refresh shape (dedup tonight's crawl against the corpus already
    * trained on), where re-deduplicating the full union would rescan
    * 100 TB for a 100 GB increment. The old side collapses to DISTINCT
    * 16-byte hashes before the left-anti join (ids and text dropped at the
    * scan), so the shuffle moves hashes, not documents, and AQE broadcasts
    * the hash set whenever it fits. Within-batch duplicates are
    * deliberately retained — that is [[exact]]'s job. */
  def incrementalDedup(newDocs: DataFrame, oldDocs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val oldH = oldDocs.select(md5(col(textCol)).as("__h")).distinct()
    newDocs.withColumn("__h", md5(col(textCol)))
      .join(oldH, Seq("__h"), "left_anti")
      .drop("__h")
  }

  /** Word shingles (n-grams of whitespace tokens) as strings. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = filter(split(lower(text), " "), t => t =!= "")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature: numHashes independent min-hashes of the shingle set.
    * Delegates to the one-pass [[graft.functions.MinHashSig]] expression —
    * the nested-transform column encoding recomputes shingling per hash
    * index and measured 180× slower. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    GraftFunctions.minhash_sig(shingleCol, numHashes)

  /** MinHash + LSH banding candidate pairs.
    *
    * bands × rowsPerBand = numHashes; docs sharing any band land in the same
    * bucket → pairs generated per-bucket via self-join on the band key (a
    * shuffle join on (band index, band hash), NOT a cross join). Pairs are
    * then exact-verified with true n-gram Jaccard >= threshold.
    *
    * `collapseExact` (default on — the 100 TB posture): exact-duplicate
    * docs are first collapsed to one representative per md5(text) and the
    * LSH runs on representatives only; member pairs are expanded back
    * afterward. Identical texts collide in EVERY band, so a cluster of k
    * copies costs the raw join k²·bands rows — real corpora (and the ×10
    * sf1 fixture) are full of exact dups, and collapsing them first cut the
    * sf1 raw-pair count ~100× (7.4 s → 1.7 s) with byte-identical output
    * (intra-cluster pairs have Jaccard exactly 1.0 ≥ any threshold;
    * inter-cluster pairs carry their representatives' Jaccard, which is a
    * pure function of the identical token sets).
    */
  def minhashPairs(
      docs: DataFrame,
      threshold: Double = 0.7,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id",
      collapseExact: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    GraftFunctions.register(docs.sparkSession)
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= "")
    // ONE corpus tokenize+hash pass (round 4): the distinct window-hash
    // sets feed BOTH the banding signature (MIN is duplicate-insensitive,
    // so minhash over the distinct set == minhash_tokens_sig) and the
    // exact-Jaccard verify below — previously two full passes.
    val scanned = docs.select(col(idCol).as("id"),
        md5(col(textCol)).as("__h"),
        GraftFunctions.token_window_hashes(toks, shingleSize).as("sh"))
      .withColumn("nsh", size(col("sh")))
    if (collapseExact) {
      // one groupBy shuffle (partial agg keeps it slim: one sh per group per
      // map partition); members ride along for the final expansion
      val groups = scanned.groupBy(col("__h"))
        .agg(min("id").as("id"), collect_list("id").as("members"),
          first("sh").as("sh"), first("nsh").as("nsh"))
        .localCheckpoint()
      val repPairs = minhashPairsOnBase(
        groups.select(col("id"), col("sh"), col("nsh")),
        threshold, numHashes, bands)
      expandClusterPairs(groups, repPairs, lit(1.0).as("jaccard"), "jaccard")
    } else {
      minhashPairsOnBase(scanned.select(col("id"), col("sh"), col("nsh"))
        .localCheckpoint(), threshold, numHashes, bands)
    }
  }

  /** The banding+verify core of [[minhashPairs]], over a pre-scanned
    * (id, sh, nsh) frame that is already materialized. */
  private def minhashPairsOnBase(
      basePre: DataFrame,
      threshold: Double,
      numHashes: Int,
      bands: Int): DataFrame = {
    val r = numHashes / bands
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("b"), xxhash64(slice(col("sig"), lit(b * r + 1), lit(r))).as("h"))
    }
    val base = basePre
    // slim banded signature: ids only — candidate pairs join text back later,
    // so the exploded (×bands) shuffle never carries document bodies.
    // localCheckpoint materializes the signatures once: the self-join would
    // otherwise recompute the 64-way rehash on BOTH sides.
    val banded = base.select(col("id"),
        GraftFunctions.minhash_from_hashes(col("sh"), numHashes).as("sig"))
      .withColumn("band", explode(array(bandStructs: _*)))
      .select(col("id"), col("band.b").as("band_id"), col("band.h").as("band_hash"))
      .localCheckpoint()
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("d1"), col("y.id").as("d2"))
      .dropDuplicates("d1", "d2")
    // exact verify on candidates only. Each DOC's precomputed hash set
    // (the same checkpointed `base` frame the banding read) joins to the
    // pairs — computing shingles per PAIR re-does each doc's set once per
    // candidate it appears in, which goes quadratic the moment the corpus
    // has duplicate clusters (measured 115 s → 12 s on 250k candidates
    // over 50k docs with 10-way dup groups). The union size comes from
    // |A∪B| = |A|+|B|−|A∩B| to save a second set op. Sets are DISTINCT
    // 64-bit window hashes ([[TokenWindowHashes]]), not shingle strings:
    // the pair join shuffles long arrays and intersects integers — same
    // Jaccard up to 2⁻⁶⁴ hash collisions.
    val shingled = base
    val withSh = cand
      .join(shingled.select(col("id").as("d1"), col("sh").as("sh1"), col("nsh").as("n1")), "d1")
      .join(shingled.select(col("id").as("d2"), col("sh").as("sh2"), col("nsh").as("n2")), "d2")
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
    withSh.withColumn("jaccard", inter / (col("n1") + col("n2") - inter))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Expand representative-level near-dup pairs back to member-level pairs.
    *
    * `groups`: (id = representative, members = all ids sharing its exact
    * text); `repPairs`: (d1, d2, <metric>) over representative ids.
    * Output = every intra-cluster pair (metric = `selfMetric`: identical
    * texts ⇒ Jaccard 1.0 / hamming 0) ∪ every cross-cluster member pair
    * carrying its representatives' metric (a pure function of the identical
    * texts, so this is exact, not an approximation). The expansion's row
    * count is the answer's row count — the quadratic blow-up lives in the
    * OUTPUT, never in a join of non-answer rows. */
  private def expandClusterPairs(
      groups: DataFrame,
      repPairs: DataFrame,
      selfMetric: Column,
      metricCol: String): DataFrame = {
    // selfMetric is evaluated once per GROUP (it may reference group
    // columns, e.g. the representative vector), then rides the explosion
    val intra = groups.filter(size(col("members")) > 1)
      .select(col("members"), selfMetric.as(metricCol))
      .select(explode(col("members")).as("a"), col("members"), col(metricCol))
      .select(col("a"), explode(col("members")).as("b"), col(metricCol))
      .filter(col("a") < col("b"))
      .select(col("a").as("d1"), col("b").as("d2"), col(metricCol))
    val inter = repPairs
      .join(groups.select(col("id").as("d1"), col("members").as("m1")), "d1")
      .join(groups.select(col("id").as("d2"), col("members").as("m2")), "d2")
      .select(explode(col("m1")).as("a"), col("m2"), col(metricCol))
      .select(col("a"), explode(col("m2")).as("b"), col(metricCol))
      .select(least(col("a"), col("b")).as("d1"),
        greatest(col("a"), col("b")).as("d2"), col(metricCol))
    intra.unionByName(inter)
  }

  /** SimHash near-dup pairs: 64-bit simhash, banded into `bands` chunks —
    * pairs within hamming distance `maxHamming` must share at least one
    * exact band (pigeonhole, needs maxHamming < bands), so candidates come
    * from an equi-join on (band index, band bits).
    *
    * `collapseExact` (default on): same exact-dup collapse as
    * [[minhashPairs]] — identical texts have identical simhash (hamming 0,
    * collides in every band), so clusters of exact copies go through the
    * banding join once per cluster instead of k² times. sf1: 9.0 s → 1.5 s,
    * output identical.
    *
    * `portable` (default off): hash tokens with [[graft.functions.SimHashMd5]]
    * instead of xxhash64 — every signature (hence the whole hamming-threshold
    * pair set) becomes reproducible in external SQL, which is what the
    * driver-checked oracle entry needs. Banding is pigeonhole-EXACT either
    * way: recall over the hamming threshold is 1.0 by construction, so the
    * output is the full deterministic pair set, not an approximation. */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      bands: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id",
      collapseExact: Boolean = true,
      portable: Boolean = false): DataFrame = {
    require(maxHamming < bands, "pigeonhole needs maxHamming < bands")
    GraftFunctions.register(docs.sparkSession)
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= "")
    val sig = if (portable) GraftFunctions.simhash_md5(toks)
      else GraftFunctions.simhash64(toks)
    val scanned = docs.select(col(idCol).as("id"), md5(col(textCol)).as("__h"),
      sig.as("sh"))
    simhashPairsFromSigs(scanned, maxHamming, bands, collapseExact)
  }

  /** Banded pair generation over precomputed signatures (id, __h, sh) —
    * shared by [[simhashPairs]] and [[Multimodal.binarySimhashPairs]]
    * (r7). With `collapseExact`, identical contents (same `__h`) ride the
    * banding once per cluster and expand afterwards. */
  private[operators] def simhashPairsFromSigs(scanned: DataFrame,
      maxHamming: Int, bands: Int, collapseExact: Boolean): DataFrame =
    if (collapseExact) {
      val groups = scanned.groupBy(col("__h"))
        .agg(min("id").as("id"), collect_list("id").as("members"),
          first("sh").as("sh"))
        .localCheckpoint()
      val repPairs = simhashPairsOnBase(groups.select(col("id"), col("sh")),
        maxHamming, bands)
      expandClusterPairs(groups, repPairs, lit(0).as("hamming"), "hamming")
    } else {
      simhashPairsOnBase(scanned.select(col("id"), col("sh")), maxHamming, bands)
    }

  /** The banding+hamming core of [[simhashPairs]] over (id, sh); also the
    * pair engine for [[Multimodal.binarySimhashPairs]] (r7). */
  private[operators] def simhashPairsOnBase(
      sh: DataFrame, maxHamming: Int, bands: Int): DataFrame = {
    val width = 64 / bands
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("b"),
        shiftrightunsigned(col("sh"), b * width)
          .bitwiseAND(lit(if (width == 64) -1L else (1L << width) - 1)).as("bits"))
    }
    // localCheckpoint: the self-join would otherwise recompute
    // tokenize+simhash on BOTH sides (same 2× minhashPairs measured);
    // the frame is ids + three longs × bands rows — cheap to hold
    val banded = sh.withColumn("band", explode(array(bandStructs: _*)))
      .select(col("id"), col("sh"), col("band.b").as("band_id"), col("band.bits").as("band_bits"))
      .localCheckpoint()
    banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_bits") === col("y.band_bits") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("d1"), col("y.id").as("d2"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      // filter BEFORE the dedup shuffle: hamming is a pure function of the
      // pair, so the order is semantically free — but a multi-band collision
      // (duplicate clusters collide in every band) multiplies raw pairs, and
      // deduping them first shuffles the whole raw pair set (measured 38 s
      // vs 7 s on 24.5M raw pairs at sf1)
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("d1", "d2")
  }

  /** Exact n-gram Jaccard over prefix-bucketed candidates (deterministic —
    * oracle-checkable; the LSH variants above are the scale path for when no
    * cheap bucket key exists).
    *
    * Skew guard (round-2 verdict #3): a prefix bucket holds every doc
    * sharing its first `prefixLen` chars — on real corpora (license
    * headers, templated pages) one bucket can hold millions of docs, and
    * the all-pairs equi-join inside it goes quadratic. Buckets over
    * `bucketCap` therefore switch from exhaustive enumeration to minhash
    * banding over the same token sets: candidates are band collisions
    * (bounded per doc), exact-verified with the same token Jaccard, and
    * only pairs at `overflowMinJaccard`+ survive. Semantics degrade
    * explicitly — an oversized bucket reports near-dup pairs, not all
    * pairs — because the all-pairs answer is itself quadratic in size
    * there. (If the bucket is millions of IDENTICAL docs, the pair OUTPUT
    * is inherently quadratic whatever the algorithm — that corpus wants
    * [[exactGroups]], not pairwise output.) Buckets under the cap are
    * byte-identical to the unguarded operator, so the fixture oracle
    * (q57/p02) is unaffected. */
  def ngramJaccardPairs(docs: DataFrame, prefixLen: Int = 40,
      bucketCap: Int = 1000, overflowMinJaccard: Double = 0.5): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // tokenize each doc ONCE (per-pair tokenization goes quadratic on
    // duplicate clusters — same fix as minhashPairs' verify step); union
    // size via |A∪B| = |A|+|B|−|A∩B|, value-identical to the two-sided form.
    // The window count shuffles on pfx — the same partitioning the pair
    // join needs anyway — and localCheckpoint materializes it once.
    val base = docs.select(col("doc_id"),
        substring(col("text"), 1, prefixLen).as("pfx"),
        array_distinct(split(col("text"), " ")).as("tk"))
      .withColumn("ntk", size(col("tk")))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("pfx")))
      .localCheckpoint()
    val inter = size(array_intersect(col("tk1"), col("tk2"))).cast("double")
    val jacBp = round(lit(10000.0) * inter / (col("n1") + col("n2") - inter))
      .cast("bigint").as("jac_bp")

    val small = base.filter(col("__bn") <= bucketCap)
    val a = small.select(col("doc_id").as("d1"), col("pfx"), col("tk").as("tk1"), col("ntk").as("n1"))
    val b = small.select(col("doc_id").as("d2"), col("pfx"), col("tk").as("tk2"), col("ntk").as("n2"))
    val smallPairs = a.join(b, Seq("pfx")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), jacBp)

    // overflow route: minhash banding over the SAME distinct-token sets the
    // Jaccard uses (64 hashes, 16 bands of 4 → LSH threshold ≈ 0.5);
    // candidate pairs stay within their prefix bucket. Ids-only band join,
    // token arrays join back for the exact verify.
    val big = base.filter(col("__bn") > bucketCap)
    val numHashes = 64
    val bands = 16
    val rowsPerBand = numHashes / bands
    val bandStructs = (0 until bands).map { bi =>
      struct(lit(bi).as("b"),
        xxhash64(slice(col("sig"), lit(bi * rowsPerBand + 1), lit(rowsPerBand))).as("h"))
    }
    val banded = big.select(col("doc_id").as("id"), col("pfx"),
        GraftFunctions.minhash_sig(col("tk"), numHashes).as("sig"))
      .withColumn("band", explode(array(bandStructs: _*)))
      .select(col("id"), col("pfx"), col("band.b").as("band_id"), col("band.h").as("band_hash"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.pfx") === col("y.pfx") &&
          col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("d1"), col("y.id").as("d2"))
      .dropDuplicates("d1", "d2")
    val toks = base.select(col("doc_id"), col("tk"), col("ntk"))
    val bigPairs = cand
      .join(toks.select(col("doc_id").as("d1"), col("tk").as("tk1"), col("ntk").as("n1")), "d1")
      .join(toks.select(col("doc_id").as("d2"), col("tk").as("tk2"), col("ntk").as("n2")), "d2")
      .select(col("d1"), col("d2"), jacBp)
      .filter(col("jac_bp") >= math.round(overflowMinJaccard * 10000))

    smallPairs.unionByName(bigPairs)
  }

  /** Embedding near-dup pairs: banded random-hyperplane LSH + exact cosine
    * verify.
    *
    * One 64-bit signature of `bands × planesPerBand` hyperplane bits per
    * vector, sliced into `bands` bucket keys (same banding trick as
    * [[simhashPairs]]) — a pair is a candidate if it collides in ANY band.
    * Banding is what reconciles recall with bounded work: per-band bucket
    * population shrinks as 2^planesPerBand (candidate pairs stay
    * ≈ bands × n × bucketSize/2 — linear in n for a fixed bucket target),
    * while multi-band OR keeps recall high for true near-dups
    * (1 − (1 − s^p)^bands with s the per-plane collision probability; for
    * duplicate-grade pairs, cosine ≥ 0.99, s ≈ 0.95 and recall stays
    * ≥ 0.95 — asserted on clustered fixtures in OperatorsSpec). A single
    * wide signature (the previous shape) loses recall exponentially in
    * `planes`, and a single narrow one goes quadratic — size
    * `planesPerBand` with [[Similarity.planesFor]] against the per-band
    * bucket target.
    *
    * Shuffle shape mirrors [[minhashPairs]]: the exploded ×bands join
    * carries ids only; vectors join back onto deduped candidate pairs for
    * the exact verify. */
  def embeddingPairs(
      emb: DataFrame,
      minCosine: Double = 0.95,
      planesPerBand: Int = 12,
      bands: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      collapseExact: Boolean = true): DataFrame = {
    require(planesPerBand >= 1 && bands >= 1 && planesPerBand * bands <= 64,
      "need 1 <= planesPerBand * bands <= 64")
    GraftFunctions.register(emb.sparkSession)
    val totalPlanes = planesPerBand * bands
    val mask = if (planesPerBand == 64) -1L else (1L << planesPerBand) - 1
    if (collapseExact) {
      // same exact-dup collapse as minhash/simhash, keyed on the vector
      // itself: identical vectors have identical signatures and collide in
      // every band, so k exact copies cost the band join k² rows. Real
      // embedding corpora are full of exact dups (re-crawled documents
      // embed identically); the ×30 sf3 fixture made the uncollapsed path
      // 7.6× super-linear (2.8 s at sf1 → 21 s at sf3; collapsed: linear).
      // Intra-cluster metric = cosine_sim(v, v) — the SAME FP expression
      // the uncollapsed path evaluates for identical arrays (not lit(1.0),
      // which differs in the last ulp).
      val groups = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
        .groupBy(col("v"))
        .agg(min("id").as("id"), collect_list("id").as("members"))
        .localCheckpoint()
      val repPairs = embeddingPairsOnBase(
        groups.select(col("id"), col("v")), minCosine, planesPerBand, bands)
      return expandClusterPairs(groups, repPairs,
        GraftFunctions.cosine_sim(col("v"), col("v")).as("cosine"), "cosine")
        .filter(col("cosine") >= minCosine)
    }
    embeddingPairsOnBase(emb.select(col(idCol).as("id"), col(vecCol).as("v")),
      minCosine, planesPerBand, bands)
  }

  /** The banding+verify core of [[embeddingPairs]] over (id, v). */
  private def embeddingPairsOnBase(
      ids: DataFrame,
      minCosine: Double,
      planesPerBand: Int,
      bands: Int): DataFrame = {
    val totalPlanes = planesPerBand * bands
    val mask = if (planesPerBand == 64) -1L else (1L << planesPerBand) - 1
    val base = ids.select(col("id"), col("v"),
      Similarity.hyperplaneSignature(col("v"), totalPlanes).as("sig"))
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("b"),
        shiftrightunsigned(col("sig"), b * planesPerBand).bitwiseAND(lit(mask)).as("bits"))
    }
    // ids-only banded frame; localCheckpoint so the self-join doesn't
    // recompute the signature pass on both sides
    val banded = base.select(col("id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("id"), col("band.b").as("band_id"), col("band.bits").as("band_bits"))
      .localCheckpoint()
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_bits") === col("y.band_bits") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("d1"), col("y.id").as("d2"))
      // dedup BEFORE the vector join: multi-band collisions (true dup
      // clusters collide in every band) would otherwise multiply the
      // expensive cosine work; the pair dedup shuffles ids only
      .dropDuplicates("d1", "d2")
    val vecs = base.select(col("id"), col("v"))
    cand
      .join(vecs.select(col("id").as("d1"), col("v").as("v1")), "d1")
      .join(vecs.select(col("id").as("d2"), col("v").as("v2")), "d2")
      .select(col("d1"), col("d2"),
        GraftFunctions.cosine_sim(col("v1"), col("v2")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  // ---- incremental fuzzy dedup against persisted indexes (r9) ----------
  //
  // The batch-refresh shape for NEAR-dups: tonight's crawl dedups against
  // the 100 TB corpus already trained on. Re-banding the full union would
  // re-scan the corpus text for every increment; instead the corpus pays
  // ONE index build at ingest — per doc/vector, its band keys plus exactly
  // the per-item state the exact verify needs (distinct window-hash set /
  // the vector) — and each increment joins its own bands against that
  // table. Only CROSS (new × old) pairs are emitted; within-increment
  // pairs are minhashPairs/embeddingPairs' job. Query-side parameters
  // (numHashes/bands/shingleSize, planesPerBand/bands) MUST match the
  // build — they define the signature space the index is keyed in.

  /** One-time persisted minhash band index, TWO tables (r10, VERDICT r9
    * #7): `indexTable` holds per-doc verify state (id, sh, nsh — `sh` the
    * distinct token-window hash set so the increment-side Jaccard verify
    * reads the INDEX, never the corpus text); `indexTable_bands` holds the
    * PRE-EXPLODED (band_id, band_hash, id) rows bucketed by the band key.
    * The r9 layout stored bands as an array the increment re-exploded and
    * re-shuffled every run; pre-exploding moves that cost to the one-time
    * build, and the bucket layout lets a huge increment sort-merge against
    * the index with ZERO index-side exchange (PlanAudit-asserted). One
    * corpus scan total (the banding scan is checkpointed across both
    * writes). */
  def buildMinhashIndex(docs: DataFrame, indexTable: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      textCol: String = "text", idCol: String = "doc_id",
      numBuckets: Int = 16): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    Similarity.dropStaleWarehouseDir(spark, indexTable)
    Similarity.dropStaleWarehouseDir(spark, indexTable + "_bands")
    val scanned =
      minhashScan(docs, numHashes, bands, shingleSize, textCol, idCol)
        .localCheckpoint()
    scanned.select(col("id"), col("sh"), col("nsh"))
      .write.format("parquet").mode("overwrite").saveAsTable(indexTable)
    Partitioning.writeBucketed(
      scanned.select(col("id"), explode(col("bands")).as("band"))
        .select(col("band.b").as("band_id"), col("band.h").as("band_hash"),
          col("id"))
        // r14: geometry rides WITH the keys it bakes (crash atomicity)
        .withColumn("nh", lit(numHashes)).withColumn("nb", lit(bands)),
      indexTable + "_bands", Seq("band_id", "band_hash"), numBuckets)
    // r13: persist the geometry so maintainMinhashIndex can compare it
    writeMeta(spark, indexTable, Map("num_hashes" -> numHashes.toLong,
      "bands" -> bands.toLong, "shingle_size" -> shingleSize.toLong))
  }

  /** Incremental cross-corpus near-dup pairs (new_id, old_id, jaccard):
    * bands the increment (one scan, checkpointed), joins its band keys
    * against the persisted index (AQE broadcasts the increment side when
    * it fits), and exact-verifies candidates with the hash sets — new
    * side from the checkpoint, old side column-pruned from the index. */
  def minhashPairsIncremental(newDocs: DataFrame, indexTable: String,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = newDocs.sparkSession
    GraftFunctions.register(spark)
    val bandsTable = indexTable + "_bands"
    // r14: probe geometry comes from the band table itself when embedded
    // (post-maintenance the stored geometry may differ from the caller's
    // build-time args; probing at the wrong width would silently miss
    // every candidate)
    val (nhEff, bandsEff) = bandTableGeometry(spark, bandsTable, "nh", "nb")
      .getOrElse((numHashes, bands))
    val newScanned =
      minhashScan(newDocs, nhEff, bandsEff, shingleSize, textCol, idCol)
        .localCheckpoint()
    val newBanded = newScanned
      .select(col("id").as("nid"), explode(col("bands")).as("band"))
      .select(col("nid"), col("band.b").as("band_id"), col("band.h").as("band_hash"))
    val idx = spark.table(indexTable)
    // r10 layout: pre-exploded bucketed band table — no per-increment
    // explode, and the bucket layout satisfies the join's distribution so
    // the index side never shuffles. Falls back to exploding the r9
    // array-column layout for indexes persisted before the change.
    val oldBanded =
      if (spark.catalog.tableExists(bandsTable))
        spark.table(bandsTable)
          .select(col("id").as("oid"), col("band_id"), col("band_hash"))
      else idx
        .select(col("id").as("oid"), explode(col("bands")).as("band"))
        .select(col("oid"), col("band.b").as("band_id"), col("band.h").as("band_hash"))
    val cand = oldBanded.join(newBanded, Seq("band_id", "band_hash"))
      .select(col("nid").as("d1"), col("oid").as("d2"))
      .dropDuplicates("d1", "d2")
    val withSh = cand
      .join(newScanned.select(col("id").as("d1"), col("sh").as("sh1"), col("nsh").as("n1")), "d1")
      .join(idx.select(col("id").as("d2"), col("sh").as("sh2"), col("nsh").as("n2")), "d2")
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
    withSh.withColumn("jaccard", inter / (col("n1") + col("n2") - inter))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** The shared one-pass tokenize→hash→sign→band scan of
    * [[buildMinhashIndex]] and [[minhashPairsIncremental]]:
    * (id, bands array<struct<b,h>>, sh, nsh). */
  private def minhashScan(docs: DataFrame, numHashes: Int, bands: Int,
      shingleSize: Int, textCol: String, idCol: String): DataFrame = {
    val r = numHashes / bands
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= "")
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("b"),
        xxhash64(slice(col("sig"), lit(b * r + 1), lit(r))).as("h"))
    }
    docs.select(col(idCol).as("id"),
        GraftFunctions.token_window_hashes(toks, shingleSize).as("sh"))
      .withColumn("nsh", size(col("sh")))
      .withColumn("sig", GraftFunctions.minhash_from_hashes(col("sh"), numHashes))
      .select(col("id"), array(bandStructs: _*).as("bands"), col("sh"), col("nsh"))
  }

  /** Banded bit-slices of a hyperplane signature column:
    * (idAs, band_id, band_bits) — shared by [[buildEmbeddingIndex]] and
    * [[embeddingPairsIncremental]]. */
  private def embBandSlices(df: DataFrame, idAs: String,
      planesPerBand: Int, bands: Int): DataFrame = {
    val mask = if (planesPerBand == 64) -1L else (1L << planesPerBand) - 1
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("b"),
        shiftrightunsigned(col("sig"), b * planesPerBand)
          .bitwiseAND(lit(mask)).as("bits"))
    }
    df.select(col("id").as(idAs), explode(array(bandStructs: _*)).as("band"))
      .select(col(idAs), col("band.b").as("band_id"), col("band.bits").as("band_bits"))
  }

  /** One-time persisted hyperplane-signature index for incremental
    * embedding near-dup: (id, v, sig) per vector, plus (r10, VERDICT r9
    * #7) the pre-exploded `indexTable_bands` table (band_id, band_bits,
    * id) bucketed by band key, so increments pay zero index-side
    * explode/shuffle. The band tables bake the (planesPerBand, bands)
    * used here — query-side parameters must match the build (documented
    * contract of this family). */
  def buildEmbeddingIndex(emb: DataFrame, indexTable: String,
      planesPerBand: Int = 12, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numBuckets: Int = 16): Unit = {
    require(planesPerBand >= 1 && bands >= 1 && planesPerBand * bands <= 64,
      "need 1 <= planesPerBand * bands <= 64")
    val spark = emb.sparkSession
    GraftFunctions.register(spark)
    Similarity.dropStaleWarehouseDir(spark, indexTable)
    Similarity.dropStaleWarehouseDir(spark, indexTable + "_bands")
    val sigDf = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig",
        Similarity.hyperplaneSignature(col("v"), planesPerBand * bands))
      .localCheckpoint()
    sigDf.write.format("parquet").mode("overwrite").saveAsTable(indexTable)
    Partitioning.writeBucketed(
      embBandSlices(sigDf, "id", planesPerBand, bands)
        .select(col("band_id"), col("band_bits"), col("id"))
        // r14: geometry rides WITH the keys it bakes (crash atomicity)
        .withColumn("pp", lit(planesPerBand)).withColumn("nb", lit(bands)),
      indexTable + "_bands", Seq("band_id", "band_bits"), numBuckets)
    // r13: persist the geometry so maintainEmbeddingIndex can compare it
    writeMeta(spark, indexTable, Map("planes_per_band" -> planesPerBand.toLong,
      "bands" -> bands.toLong))
  }

  /** Incremental cross-corpus embedding near-dup pairs
    * (new_id, old_id, cosine) — [[minhashPairsIncremental]]'s shape over
    * banded hyperplane signatures; the exact-cosine verify pulls old
    * vectors from the index, never the source corpus. */
  def embeddingPairsIncremental(newEmb: DataFrame, indexTable: String,
      minCosine: Double = 0.95, planesPerBand: Int = 12, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(planesPerBand >= 1 && bands >= 1 && planesPerBand * bands <= 64,
      "need 1 <= planesPerBand * bands <= 64")
    val spark = newEmb.sparkSession
    GraftFunctions.register(spark)
    val bandsTable = indexTable + "_bands"
    // r14: probe geometry from the band table itself when embedded —
    // post-maintenance indexes carry a different width than the build
    val (ppEff, bandsEff) = bandTableGeometry(spark, bandsTable, "pp", "nb")
      .getOrElse((planesPerBand, bands))
    val newScanned = newEmb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig",
        Similarity.hyperplaneSignature(col("v"), ppEff * bandsEff))
      .localCheckpoint()
    val idx = spark.table(indexTable)
    // r10 layout: pre-exploded bucketed band table (zero index-side
    // explode/shuffle); falls back to slicing the r9 layout's sig column
    val oldBanded =
      if (spark.catalog.tableExists(bandsTable))
        spark.table(bandsTable)
          .select(col("id").as("oid"), col("band_id"), col("band_bits"))
      else embBandSlices(idx, "oid", ppEff, bandsEff)
    val cand = oldBanded.join(embBandSlices(newScanned, "nid", ppEff, bandsEff),
        Seq("band_id", "band_bits"))
      .select(col("nid").as("d1"), col("oid").as("d2"))
      .dropDuplicates("d1", "d2")
    cand
      .join(newScanned.select(col("id").as("d1"), col("v").as("v1")), "d1")
      .join(idx.select(col("id").as("d2"), col("v").as("v2")), "d2")
      .select(col("d1"), col("d2"),
        GraftFunctions.cosine_sim(col("v1"), col("v2")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  // ---- occupancy-triggered index maintenance (r13, VERDICT r12 #2) ----
  //
  // The growth probes re-size band geometry PER CORPUS (planesFor), but a
  // PERSISTED index is built once at a fixed geometry: a live embedding
  // index whose corpus grows 30× without re-banding sees per-bucket
  // occupancy grow ~30× and candidate work ~900× — degrading toward the
  // quadratic the sizing rule exists to avoid. These ops measure bucket
  // occupancy with ONE aggregation over the persisted band table, and
  // when the p95 crosses the trigger, rebuild the band geometry FROM
  // STORED VERIFY STATE ONLY — the embedding index re-signs its stored
  // vectors, the minhash index re-signs its stored window-hash sets;
  // NEITHER path reads corpus text (the p62 invariant PlanAudit asserts;
  // the ops don't even take the corpus as an argument). Geometry is
  // persisted in `<indexTable>_meta` (builds write it; pre-r13 indexes
  // fall back to the caller's `currentPlanesPerBand`/current-geometry
  // args).

  /** One health/maintenance report: occupancy BEFORE any rebuild;
    * `rebuilt` tells whether the geometry changed. */
  case class IndexHealth(
      items: Long, buckets: Long, p95Occupancy: Double, maxOccupancy: Long,
      currentGeometry: Int, targetGeometry: Int, rebuilt: Boolean)

  private def writeMeta(spark: SparkSession, table: String,
      fields: Map[String, Long]): Unit = {
    import spark.implicits._
    Similarity.dropStaleWarehouseDir(spark, table + "_meta")
    fields.toSeq.sortBy(_._1).toDF("k", "v")
      .coalesce(1)
      .write.format("parquet").mode("overwrite").saveAsTable(table + "_meta")
  }

  private def readMeta(spark: SparkSession, table: String): Map[String, Long] =
    if (spark.catalog.tableExists(table + "_meta"))
      spark.table(table + "_meta").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    else Map.empty

  /** Geometry embedded in the band table ITSELF (r14, r13 ADVICE low:
    * the rebuild's three writes are not atomic — a crash between the
    * index overwrite and the band rewrite left sigs at the new width
    * while bands/meta described the old geometry, silently losing
    * recall). The band table is the artifact whose KEYS bake the
    * geometry, so two constant columns written with it make the pair
    * atomic by construction: whichever band table a crash leaves behind
    * describes itself, queries derive probe geometry from it, and every
    * crash point yields a self-consistent (possibly pre-rebuild) view.
    * `_meta` stays as a convenience cache written last; pre-r14 band
    * tables (no geometry columns) return None and fall back to
    * meta/caller args. Cost: two RLE-dictionary parquet columns ≈ 0. */
  private def bandTableGeometry(spark: SparkSession, bandsTable: String,
      c1: String, c2: String): Option[(Int, Int)] =
    if (spark.catalog.tableExists(bandsTable) &&
        spark.table(bandsTable).columns.contains(c1))
      spark.table(bandsTable).select(col(c1), col(c2)).limit(1).collect()
        .headOption.map(r => (r.getInt(0), r.getInt(1)))
    else None

  /** p95/max occupancy over a persisted band table — one aggregation,
    * two shuffles of (key, count) rows, nothing driver-side but the
    * 5-field summary. `totalRows` (sum of bucket sizes = the band
    * table's row count) rides the same job (r16, guide §1.2): both
    * maintenance ops used to pay a SECOND full-scan count() for the
    * indexed-item count, which is just totalRows / bands — every id
    * emits exactly one band row per band, by construction of both
    * build paths. */
  private def bandOccupancy(spark: SparkSession, bandsTable: String,
      keyCols: Seq[String]): (Long, Double, Long, Long) = {
    val occ = spark.table(bandsTable)
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("buckets"),
        expr("percentile_approx(n, 0.95, 10000)").as("p95"),
        max(col("n")).as("mx"),
        sum(col("n")).as("total"))
      .head()
    // r17 (ADVICE r16): an EMPTY band table returns NULL for p95 (and
    // max) — guard like the total column; the skip-count fast path made
    // an empty index reachable here.
    (occ.getLong(0),
      if (occ.isNullAt(1)) 0.0 else occ.getAs[Number](1).doubleValue(),
      if (occ.isNullAt(2)) 0L else occ.getLong(2),
      if (occ.isNullAt(3)) 0L else occ.getLong(3))
  }

  /** Occupancy-triggered re-band of a persisted EMBEDDING index: when the
    * p95 bucket occupancy exceeds `occupancyFactor × targetBucket` and
    * the sizing rule (planesFor clamped to [4, min(12, 64/bands)], the
    * growth probes' rule) asks for more planes than the index carries,
    * re-sign the STORED vectors at the new width and rewrite the index +
    * band tables. Zero corpus scans — the only inputs are the index's own
    * tables. */
  def maintainEmbeddingIndex(spark: SparkSession, indexTable: String,
      bands: Int = 4, targetBucket: Int = 32, occupancyFactor: Double = 4.0,
      currentPlanesPerBand: Int = 12, numBuckets: Int = 16): IndexHealth = {
    GraftFunctions.register(spark)
    // lazy (r16): the meta read is a Spark job; the band table's embedded
    // geometry is the authority (r14) and answers on every post-r14 index,
    // so only pre-r14 layouts pay for the fallback read
    lazy val meta = readMeta(spark, indexTable)
    // geometry authority order (r14): the band table's own embedded
    // columns (atomic with its keys) > the _meta cache > caller args
    val storedGeom = bandTableGeometry(spark, indexTable + "_bands", "pp", "nb")
    val pCur = storedGeom.map(_._1)
      .getOrElse(
        meta.getOrElse("planes_per_band", currentPlanesPerBand.toLong).toInt)
    // item count = band rows / STORED band count (caller `bands` is the
    // target geometry; the table's own nb describes what's on disk)
    val nbStored = storedGeom.map(_._2)
      .orElse(meta.get("bands").map(_.toInt))
    val nbCur = nbStored.getOrElse(bands)
    val (buckets, p95, mx, bandRows) =
      bandOccupancy(spark, indexTable + "_bands", Seq("band_id", "band_bits"))
    // r17 (ADVICE r16): when NO stored geometry exists (neither band-table
    // columns nor _meta — a pre-r13 layout), dividing by the CALLER's
    // target `bands` silently mis-sizes n if the on-disk band count
    // differs; fall back to the geometry-independent index count instead
    // (the pre-r16 behavior for exactly this layout class).
    val n = nbStored match {
      case Some(nb) => bandRows / math.max(1, nb)
      case None     => spark.table(indexTable).count()
    }
    val pMax = math.min(12, 64 / bands)
    val pNew = math.max(4, math.min(Similarity.planesFor(math.max(1, n),
      targetBucket), pMax))
    val trigger = p95 > occupancyFactor * targetBucket && pNew > pCur
    if (trigger) {
      // re-sign from the index's own stored vectors; localCheckpoint cuts
      // the lineage so overwriting the table we just read is safe
      val sigDf = spark.table(indexTable).select(col("id"), col("v"))
        .withColumn("sig",
          Similarity.hyperplaneSignature(col("v"), pNew * bands))
        .localCheckpoint()
      // band table FIRST (r14 crash-atomicity): it carries its own
      // geometry, so a crash at any point leaves a self-consistent view
      // — old bands+old geometry before this write commits, new after.
      // The index's sig column (below) is only the r9-layout fallback;
      // queries sign probes at the band table's geometry and verify
      // with `v`, never the stored sig.
      Partitioning.writeBucketed(
        embBandSlices(sigDf, "id", pNew, bands)
          .select(col("band_id"), col("band_bits"), col("id"))
          .withColumn("pp", lit(pNew)).withColumn("nb", lit(bands)),
        indexTable + "_bands", Seq("band_id", "band_bits"), numBuckets)
      sigDf.write.format("parquet").mode("overwrite").saveAsTable(indexTable)
      writeMeta(spark, indexTable,
        Map("planes_per_band" -> pNew.toLong, "bands" -> bands.toLong))
    }
    IndexHealth(n, buckets, p95, mx, pCur, pNew, trigger)
  }

  /** Occupancy-triggered re-band of a persisted MINHASH index: when the
    * p95 band-bucket occupancy exceeds the trigger, re-sign the STORED
    * window-hash sets (`sh`) at the caller's new (numHashes, bands)
    * geometry and rewrite the band table — the verify-state table
    * (id, sh, nsh) is geometry-independent and is NOT rewritten. More
    * hashes per band (numHashes/bands) lowers the random-collision rate,
    * shrinking hot buckets; duplicate-grade pairs (the fixture contract)
    * keep recall ≈ 1 at any r. Zero corpus scans. */
  def maintainMinhashIndex(spark: SparkSession, indexTable: String,
      numHashes: Int = 128, bands: Int = 16, targetBucket: Int = 32,
      occupancyFactor: Double = 4.0, numBuckets: Int = 16): IndexHealth = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    GraftFunctions.register(spark)
    // lazy (r16): see maintainEmbeddingIndex — band-table geometry is the
    // authority, the meta job only runs on pre-r14 layouts
    lazy val meta = readMeta(spark, indexTable)
    // geometry authority order (r14): band-table-embedded > meta > default
    val storedGeom = bandTableGeometry(spark, indexTable + "_bands", "nh", "nb")
    val rCur = storedGeom
      .map { case (nh, nb) => nh / math.max(1, nb) }
      .getOrElse(meta.get("num_hashes").map(_.toInt).getOrElse(64) /
        math.max(1, meta.get("bands").map(_.toInt).getOrElse(16)))
    val nbStored = storedGeom.map(_._2)
      .orElse(meta.get("bands").map(_.toInt))
    val rNew = numHashes / bands
    val (buckets, p95, mx, bandRows) =
      bandOccupancy(spark, indexTable + "_bands", Seq("band_id", "band_hash"))
    // r17 (ADVICE r16): see maintainEmbeddingIndex — without stored
    // geometry the divisor is a guess; use the geometry-independent count.
    val n = nbStored match {
      case Some(nb) => bandRows / math.max(1, nb)
      case None     => spark.table(indexTable).count()
    }
    val trigger = p95 > occupancyFactor * targetBucket && rNew > rCur
    if (trigger) {
      val r = numHashes / bands
      val bandStructs = (0 until bands).map { b =>
        struct(lit(b).as("b"),
          xxhash64(slice(col("sig"), lit(b * r + 1), lit(r))).as("h"))
      }
      val rebanded = spark.table(indexTable).select(col("id"), col("sh"))
        .withColumn("sig",
          GraftFunctions.minhash_from_hashes(col("sh"), numHashes))
        .select(col("id"), explode(array(bandStructs: _*)).as("band"))
        .select(col("band.b").as("band_id"), col("band.h").as("band_hash"),
          col("id"))
        // r14: geometry rides WITH the keys (crash atomicity — the
        // verify-state table is geometry-independent, so the band table
        // is the ONLY artifact the rebuild replaces, one atomic write)
        .withColumn("nh", lit(numHashes)).withColumn("nb", lit(bands))
        .localCheckpoint()
      Partitioning.writeBucketed(rebanded, indexTable + "_bands",
        Seq("band_id", "band_hash"), numBuckets)
      writeMeta(spark, indexTable,
        Map("num_hashes" -> numHashes.toLong, "bands" -> bands.toLong))
    }
    IndexHealth(n, buckets, p95, mx, rCur, rNew, trigger)
  }

  /** C4-style line-level dedup: every later occurrence of a line that
    * appears anywhere earlier in the corpus (order = (doc_id, position)) is
    * dropped; each doc is reassembled from its surviving lines in original
    * order. Docs whose every line was seen before disappear entirely —
    * C4's own semantics for fully-duplicated documents.
    *
    * Two hash shuffles, both skew-tolerant at 100 TB: the keep-first rank
    * partitions BY LINE CONTENT (a line duplicated across millions of docs
    * is one partition whose row_number costs one local sort — candidate
    * state never multiplies), and the reassembly partitions by doc_id.
    * Nothing is driver-side; no join at all.
    *
    * Returns (doc_id, kept_lines, text). */
  /** Span-level substring dedup (r7 — the missing dedup modality between
    * doc-level [[exact]]/[[minhashPairs]] and line-level [[lineDedup]]):
    * remove every token covered by a DUPLICATED k-token window, keeping
    * the globally first occurrence — the "dedup repeated ~50-token spans
    * across documents" step of a training pipeline (boilerplate, quoted
    * passages, licence blocks), at exact-content granularity.
    *
    * Policy (exact, deterministic): a window occurrence (doc, pos) is
    * duplicate iff some occurrence of the same k-token content has a
    * smaller (doc_id, pos); a token is removed iff ANY of the ≤k windows
    * covering it is duplicate; kept tokens reassemble in order (so the
    * first copy of a span survives intact, later copies are cut —
    * overlapping within-doc repeats collapse to their first window, the
    * suffix-array substring-dedup semantics restated windowed).
    *
    * Scale shape: the [[graft.functions.WindowMd5s]] kernel emits one
    * 16-byte digest per position in one byte scan, so window CONTENT
    * (k× the corpus) never materializes or shuffles; the
    * [[graft.functions.RemoveTokenPositions]] kernel rewrites each doc in
    * one O(n + r) byte scan, so the corpus itself is never exploded to
    * token rows. Two keyed shuffles over small rows — the digest-keyed
    * keep-first window (32-char keys + ids, the [[lineDedup]] shape) and
    * the doc-keyed collapse of removed positions — plus one doc-keyed
    * join of the (typically tiny) removal arrays back onto the corpus
    * scan, which AQE broadcasts when it fits. Never a cross join; skew is
    * bounded by the digest space. Returns (doc_id, n_tokens, kept_tokens,
    * text) — one row per input doc, fully-removed docs with kept_tokens=0
    * and text ''; text is always the single-space token re-join (the
    * whitespace normalization the reassembly defines).
    */
  def spanDedup(docs: DataFrame, k: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val occ = d.select(col("doc_id"),
      posexplode(call_function("window_md5s", col("text"), lit(k)))
        .as(Seq("pos", "wh")))
    val keepFirst = Window.partitionBy("wh").orderBy("doc_id", "pos")
    // r7 second pass: aggregate one int per DUPLICATE WINDOW (its start),
    // not k ints per window — the 16× coverage expansion moved out of the
    // shuffle into the remove_token_spans kernel, which merges overlapping
    // spans in its linear walk (no distinct needed)
    val rem = occ.withColumn("__rn", row_number().over(keepFirst))
      .filter(col("__rn") > 1)
      .select(col("doc_id").as("rdoc"), col("pos"))
      .groupBy("rdoc")
      .agg(array_sort(collect_set(col("pos"))).as("rem"))
    d.join(rem, d("doc_id") === col("rdoc"), "left")
      .select(col("doc_id"),
        element_at(TextAnalysis.tokenSetHits(col("text"), Nil), 1)
          .cast("long").as("n_tokens"),
        call_function("remove_token_spans", col("text"),
          coalesce(col("rem"), expr("CAST(array() AS ARRAY<INT>)")), lit(k))
          .as("text"))
      .select(col("doc_id"), col("n_tokens"),
        element_at(TextAnalysis.tokenSetHits(col("text"), Nil), 1)
          .cast("long").as("kept_tokens"),
        col("text"))
  }

  /** Per-group boilerplate span removal (r7 — the frequency-threshold twin
    * of [[spanDedup]]): a k-token window whose content occurs in at least
    * `minDocs` DISTINCT documents of the same group (source / domain /
    * site) is boilerplate — nav text, licence footers, cookie banners —
    * and EVERY occurrence is cut, first copy included (unlike
    * [[spanDedup]]'s keep-first policy, which is the right call for
    * quoted prose but keeps one copy of the banner). This is the
    * CCNet/RefinedWeb-style per-site boilerplate pass, exact-content.
    *
    * Scale shape: one [[graft.functions.WindowMd5s]] kernel scan (window
    * content never materializes), one (group, digest)-keyed partial-agg
    * shuffle for the distinct-doc counts — high-frequency digests are by
    * definition few, so the surviving boilerplate key set is small and is
    * broadcast back against the same kernel scan (no second corpus-wide
    * shuffle on the detection side) — then the [[spanDedup]] doc-keyed
    * removal collapse + O(n + r) [[graft.functions.RemoveTokenPositions]]
    * rewrite. Never a cross join; the corpus is never token-exploded.
    * Returns (doc_id, source, n_tokens, kept_tokens, text).
    */
  def boilerplateSpans(docs: DataFrame, k: Int = 16, minDocs: Int = 4,
      textCol: String = "text", idCol: String = "doc_id",
      groupCol: String = "source"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val d = docs.select(col(idCol).as("doc_id"), col(groupCol).as("__grp"),
      col(textCol).as("text"))
    // r17 (guide §2.4 — one exchange, one kernel scan): the r7-r16 form
    // ran the window_md5s kernel scan TWICE (detection branch + removal
    // branch — the adjudicated "cheap re-scan vs 16×-row checkpoint"
    // trade), and the detection's countDistinct exchange ALREADY shipped
    // ~the occurrence rows (partial distinct only collapses in-doc window
    // repeats, which real prose barely has). Repartitioning the exploded
    // frame ONCE by (__grp, wh) makes that same shuffle serve both
    // consumers: hash(__grp, wh) satisfies the distinct-count agg's
    // clustering (grp, wh, doc) AND the detection join's distribution, so
    // the agg runs with no further exchange and AQE reuses the ONE
    // shuffle stage for both branches — one kernel scan, same shuffled
    // bytes (+4 B/row for pos), no 16×-row checkpoint. A/B (TimeQuery
    // min, adjacent JVMs): sf0.1 1.226 → 1.041 s (−15%), sf≈1 (the
    // duplication-degenerate ×10 corpus) 7.385 → 5.648 s (−24%).
    // the explicit doc_id null-filter is inferred on the REMOVAL branch
    // anyway (right side of the reassembly left-outer join); stating it
    // here puts it on BOTH branches so the two exchange subtrees
    // canonicalize identically. Semantics-free: countDistinct ignores
    // NULL doc_ids and a NULL rdoc never matches the reassembly join.
    val occ = d.select(col("doc_id"), col("__grp"),
      posexplode(call_function("window_md5s", col("text"), lit(k)))
        .as(Seq("pos", "wh")))
      .where(col("doc_id").isNotNull)
      .repartition(col("__grp"), col("wh"))
    // the throwaway max(pos) keeps `pos` flowing through the detection
    // branch: column pruning would otherwise project it away BELOW the
    // repartition, making the two exchange subtrees canonically
    // different and defeating the stage reuse this shape exists for
    // (verified in the final AQE plan: with it, the removal join reads a
    // ReusedExchange; without it, two scans+shuffles)
    // (__mp >= 0 is vacuous — posexplode is 0-based — but referencing it
    // in the filter stops the optimizer pruning the unused aggregate and
    // with it the `pos` column)
    val boiler = occ.groupBy("__grp", "wh")
      .agg(countDistinct(col("doc_id")).as("__nd"), max(col("pos")).as("__mp"))
      .filter(col("__nd") >= minDocs && col("__mp") >= 0)
      .select(col("__grp"), col("wh"))
    // NO broadcast hint on the boiler side: a healthy corpus has a small
    // boilerplate set (AQE broadcasts it at runtime), but under heavy
    // whole-corpus duplication EVERY window crosses the threshold and the
    // set is corpus-sized — the hint would force a corpus-scale broadcast
    // build (measured degenerate at the ×10-copy sf≈1 bench corpus); the
    // unhinted join lets AQE pick a co-partitioned SMJ there (both sides
    // are already hash(__grp, wh) — zero further exchange). Spans
    // aggregate as one start per matched window; remove_token_spans
    // merges overlaps in-kernel.
    val rem = occ.join(boiler, Seq("__grp", "wh"))
      .select(col("doc_id").as("rdoc"), col("pos"))
      .groupBy("rdoc")
      .agg(array_sort(collect_set(col("pos"))).as("rem"))
    d.join(rem, d("doc_id") === col("rdoc"), "left")
      .select(col("doc_id"), col("__grp"),
        element_at(TextAnalysis.tokenSetHits(col("text"), Nil), 1)
          .cast("long").as("n_tokens"),
        call_function("remove_token_spans", col("text"),
          coalesce(col("rem"), expr("CAST(array() AS ARRAY<INT>)")), lit(k))
          .as("text"))
      .select(col("doc_id"), col("__grp").as("source"), col("n_tokens"),
        element_at(TextAnalysis.tokenSetHits(col("text"), Nil), 1)
          .cast("long").as("kept_tokens"),
        col("text"))
  }

  def lineDedup(docs: DataFrame, sep: String = "\n",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lines = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val keepFirst = Window.partitionBy("line").orderBy("doc_id", "pos")
    lines.withColumn("__rn", row_number().over(keepFirst))
      .filter(col("__rn") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_lines"),
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s("line"))).as("text"))
  }

  /** Per-group novelty curve (r7): process groups (sources) in their
    * natural order and report, per group, how much of its window content
    * is NEW — total k-token window occurrences, distinct windows, and
    * novel windows (those whose lexicographically-first containing group
    * is this one). The "marginal value of each source" report that decides
    * whether adding a crawl slice to the mix buys new data or re-buys
    * what's already there.
    *
    * Scale shape (r17, guide §2.4 — share one exchange): one
    * [[graft.functions.WindowMd5s]] kernel scan, ONE digest-keyed
    * shuffle that both the (digest, group) occurrence agg and the
    * first-owner min-over-digest WINDOW run on (hash(wh) satisfies the
    * agg's (wh, source) clustering, so the agg→window chain plans with
    * no second exchange — the r7-r16 form paid a hash(wh, source)
    * exchange AND a hash(wh) exchange back to back; see
    * plans/r17/p49_source_novelty_before.txt), then a final tiny
    * per-group agg (map-side partial to |groups| rows before its
    * exchange). Window content never materializes or shuffles. The
    * trade: the occurrence rows shuffle un-combined (the old first
    * exchange shipped map-side (wh, source, cnt) partials) — in-map
    * duplicate (wh, source) pairs are rare in prose corpora, so one
    * full exchange of ~the same rows beats two of slightly fewer. */
  def sourceNovelty(docs: DataFrame, k: Int = 8,
      textCol: String = "text", groupCol: String = "source"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val sw = docs.select(col(groupCol).as("source"),
        explode(call_function("window_md5s", col(textCol), lit(k))).as("wh"))
      .repartition(col("wh"))
      .groupBy("wh", "source")
      .agg(count(lit(1)).as("occ"))
    val perDigest = Window.partitionBy("wh")
    sw.withColumn("__owner", min(col("source")).over(perDigest))
      .groupBy("source")
      .agg(sum(col("occ")).as("total_occurrences"),
        count(lit(1)).as("distinct_windows"),
        sum(when(col("source") === col("__owner"), 1L).otherwise(0L))
          .as("novel_windows"))
  }
}
