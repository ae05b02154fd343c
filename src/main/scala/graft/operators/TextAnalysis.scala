package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.11 north
  * star): token counting, quality scoring, language ID, fingerprinting.
  *
  * All pure column expressions — they stay inside whole-stage codegen, read
  * only the `text` column from parquet (column pruning applies), and involve
  * zero shuffles, so they scale linearly with input splits.
  *
  * Ratios are emitted in integer basis points / micro-units so results are
  * bit-identical against the DuckDB oracle (FP-division-then-round on exact
  * integers is IEEE-deterministic; see SURVEY §2.12 preamble).
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (matches DuckDB
    * `list_filter(string_split(text,' '), x -> x <> '')`). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** `token_set_hits(text, sets…)`: array<int> of [n_tokens, hits per set]
    * in ONE codegen byte scan — the lambda `size(filter(...))` chains it
    * replaces are interpreted per element. */
  def tokenSetHits(text: Column, sets: Seq[Seq[String]]): Column =
    call_function("token_set_hits",
      text +: sets.map(ws => array(ws.map(lit): _*)): _*)

  def tokenCount(text: Column): Column =
    element_at(tokenSetHits(text, Nil), 1)

  val defaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordHits(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    element_at(tokenSetHits(text, Seq(stopwords)), 2)

  /** doc_id, n_tokens, punct_cnt, stop_bp (stopword ratio in basis points). */
  def qualityScored(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        tokenSetHits(col("text"), Seq(defaultStopwords)).as("__h"),
        call_function("ascii_char_count", col("text"), lit(".,!?;:")).as("punct_cnt"))
      .select(col("doc_id"), element_at(col("__h"), 1).as("n_tokens"),
        col("punct_cnt"), element_at(col("__h"), 2).as("stop_hits"))
      .withColumn("stop_bp",
        expr("CAST(round(10000.0 * stop_hits / n_tokens) AS BIGINT)"))
      .select(col("doc_id"), col("n_tokens"), col("punct_cnt"), col("stop_bp"))

  /** n-gram-heuristic language ID: stopword hits per language, argmax with a
    * fixed tie order (en > de > fr > es). */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "una"))

  def langId(docs: DataFrame): DataFrame = {
    // all four language hit counts from ONE scan of the lowered text
    val withHits = docs
      .withColumn("__h", tokenSetHits(lower(col("text")), langStopwords.map(_._2)))
      .select(col("doc_id") +: langStopwords.zipWithIndex.map { case ((lang, _), i) =>
        element_at(col("__h"), i + 2).as(s"__$lang")
      }: _*)
    withHits.select(col("doc_id"),
      expr("""CASE WHEN __en >= __de AND __en >= __fr AND __en >= __es THEN 'en'
             |WHEN __de >= __fr AND __de >= __es THEN 'de'
             |WHEN __fr >= __es THEN 'fr' ELSE 'es' END""".stripMargin).as("pred"))
  }

  /** Normalization fingerprint: md5 of lowercased text with everything but
    * [a-z0-9 ] stripped — stable under punctuation/case edits. The strip+
    * trim runs as one native byte scan instead of the regex engine. */
  def fingerprint(text: Column): Column =
    md5(call_function("strip_to_alnum_space", lower(text)))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Sliding context-window chunking — the long-document training prep
    * step: each doc's whitespace tokens are cut into windows of `window`
    * tokens advancing by `stride` (overlap = window − stride). Chunk count
    * is 1 for docs within one window, else ceil((n−window)/stride)+1, so
    * every token is covered and the last window may run short. Pure
    * per-row explode — zero shuffles, scales as a scan.
    * Returns (doc_id, chunk_idx, n_toks, chunk). */
  def chunkWindows(docs: DataFrame, window: Int = 32, stride: Int = 24): DataFrame = {
    // chunk-inside-the-row, then explode (r7): the chunk_windows kernel
    // emits every window as its own string in ONE byte scan, so each
    // generated row carries only its own ≤`window` tokens. The previous
    // explode-then-slice shape copied the FULL token array into every
    // chunk row — O(n·n/stride) bytes per doc, quadratic in doc length
    // (invisible in corpus-growth audits, ruinous on one 100k-token doc;
    // r6 verdict task #2) — and the transform/slice HOF alternative runs
    // interpreted per element. Total kernel output is ~window/stride ≈
    // 1.33× the input — linear. n_toks of a clean single-space chunk is
    // spaces+1; the tokenless doc's single empty chunk is 0.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
        posexplode(call_function("chunk_windows",
          col("text"), lit(window), lit(stride))).as(Seq("chunk_idx", "ck")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        when(col("ck") === "", 0L)
          .otherwise(size(split(col("ck"), " ")).cast("long")).as("n_toks"),
        col("ck").as("chunk"))
  }

  /** Per-source quality-percentile gate — domain-stratified curation: keep
    * the top `frac` of docs within each source by stopword-ratio score
    * (integer basis points, deterministic; ties broken by doc_id). One
    * shuffle keyed by source; rank and per-source count share the same
    * window partitioning, so it is one exchange + one sort at any scale. */
  def topQualityPerSource(docs: DataFrame, frac: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val scored = docs.select(col("doc_id"), col("source"),
        tokenSetHits(col("text"), Seq(defaultStopwords)).as("__h"))
      .select(col("doc_id"), col("source"),
        expr("CAST(round(10000.0 * element_at(__h, 2) / element_at(__h, 1)) AS BIGINT)").as("score"))
    val w = Window.partitionBy("source").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("source")))
      .filter(col("__rn") <= ceil(col("__n") * frac))
      .select("doc_id", "source", "score")
  }

  /** Unigram-LM surprisal score — the model-free stand-in for perplexity
    * filtering: token surprisal from the corpus's OWN unigram counts,
    * per-doc mean −ln p(token) in micro-nats. Per-token costs are quantized
    * to integer micro-nats BEFORE the per-doc sum, so the aggregate is an
    * integer sum — order-free under distributed aggregation and
    * cross-engine exact (FP enters only in the per-token ln, pinned by the
    * gate like the q118 libm family). The cost table is a broadcast join:
    * a unigram vocab stays broadcastable even for a very large corpus
    * (prune by min count upstream if it ever would not).
    * Returns (doc_id, n_tokens, surprisal_micro). */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    // The token stream is consumed twice (vocab aggregate + cost re-join).
    // r5 shapes measured at sf≈1 under Bench's honest protocol (cached
    // blocks + broadcasts dropped between iterations — earlier persist
    // numbers were flattered by cross-iteration cache reuse):
    // materializing the stream to share one tokenize pass LOSES — persist
    // (MEMORY_AND_DISK) 3.5 s, localCheckpoint ~2.9 s, pre-agg to
    // (doc, tok) counts ~3.3 s — because columnar/block serialization of
    // the full stream costs more than the second codegen tokenize
    // (double-pass: ~2.6 s). Kept the double pass, and made each pass
    // cheap: the `token_hashes` kernel emits 64-bit token hashes in one
    // byte scan — no per-token string ever allocates (split+explode+
    // xxhash64 of the string tokens measured 2.24 s) — so both
    // aggregates, the shuffle, and the broadcast hash map carry longs.
    // lower() stays OUTSIDE the kernel so Unicode case-folding matches
    // the oracle on any corpus. Hash-key concession as dup_gram_stats: a
    // 64-bit collision would merge two tokens' counts — ~distinct²/2⁶⁴
    // odds, deterministic, and the oracle row would flag it on the
    // fixture.
    val toks = docs.select(col("doc_id"),
      explode(call_function("token_hashes", lower(col("text")))).as("th"))
    // distinct names: `N`/`n` would collide under case-insensitive
    // resolution (both engines resolve identifiers case-insensitively)
    val vocab = toks.groupBy("th").agg(count(lit(1)).as("tok_n"))
    val total = vocab.agg(sum("tok_n").as("tot_n"))
    val costs = vocab.crossJoin(broadcast(total))
      .select(col("th"),
        expr("CAST(round(1000000.0 * ln(CAST(tot_n AS DOUBLE) / CAST(tok_n AS DOUBLE))) AS BIGINT)").as("cost"))
    toks.join(broadcast(costs), "th")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("CAST(round(CAST(sum(cost) AS DOUBLE) / count(1)) AS BIGINT)").as("surprisal_micro"))
  }

  /** PII scrubbing — the redaction step of a corpus pipeline. Patterns are
    * deliberately lookaround-free character-class regexes so RE2 (DuckDB)
    * and the JDK engine produce identical matches; both engines use
    * leftmost-first semantics. */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "\\+?[0-9][0-9 ()-]{5,}[0-9]"

  /** Scrubbed text via the linear-scan [[graft.functions.PiiScrub]] kernel
    * (property-checked byte-identical to the two-regexp_replace form it
    * replaced; ~13× faster at sf≈1). Requires GraftFunctions.register. */
  def scrubPii(text: Column): Column =
    element_at(call_function("pii_scrub", text), 1)

  /** BPE-ish pre-tokenization (SURVEY §2.11: "whitespace + a BPE-ish
    * regex"): letter runs, digit runs, and punctuation runs become separate
    * tokens — the shape GPT-style pre-tokenizers produce ("don't!" → don,
    * ', t, !). The pattern avoids RE2/Java divergences (no lookaround, no
    * \p classes), so the count is oracle-checkable cross-engine. */
  val bpeTokenPattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  def bpeTokenCount(text: Column): Column =
    // a native linear-scan run classifier, not the regex engine: one class
    // lookup per byte vs NFA stepping per token. ExpressionsSpec
    // property-checks it against regexp_count on random strings.
    call_function("bpe_token_count", text)

  /** Within-document repetition signal (the Gopher-style "repetitive doc"
    * quality gate): fraction of word 2-grams that are duplicates, in basis
    * points. Pure per-row column expressions — zero shuffles; docs under 2
    * tokens have no 2-grams and are dropped (mirrors the oracle's
    * `len(grams) > 0` guard). sequence() is guarded by the >= 2 filter:
    * Spark's sequence(1, 0) counts DOWN, it is not empty. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    // one-scan kernel (n_grams, n_distinct) instead of materializing a
    // string per gram + array_distinct: 5.0 s -> sub-second at sf≈1
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
        call_function("dup_gram_stats", lower(col("text"))).as("__s"))
      .select(col("doc_id"),
        element_at(col("__s"), 1).as("n_grams"),
        element_at(col("__s"), 2).as("__nd"))
      .filter(col("n_grams") > 0)
      .select(col("doc_id"), col("n_grams"),
        expr("CAST(round(10000.0 * (n_grams - __nd) / n_grams) AS BIGINT)")
          .as("dup_bp"))
  }

  /** End-to-end corpus curation — the composed 100 TB shape: quality gate
    * (min whitespace-token count) → language gate → exact-dedup keep-first.
    * ONE scan of the corpus (all gates are codegen column expressions over
    * `text`) and ONE shuffle (the dedup groupBy); emits one row per kept
    * unique document: (content hash, kept doc_id, duplicate count). */
  def curate(docs: DataFrame, minTokens: Int = 40, lang: String = "en"): DataFrame =
    gate(docs, minTokens, lang)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dups"))

  /** The quality/language gates of [[curate]] without the dedup collapse
    * (r5, for pipeline composition): rows with ≥ `minTokens` whitespace
    * tokens whose argmax stopword language is `lang`. Returns
    * (doc_id, text). One token_set_hits scan yields the token count AND
    * all four language hit counts (lower() preserves 0x20 spaces, so the
    * count over lowered text equals the oracle's count over raw text). */
  def gate(docs: DataFrame, minTokens: Int = 40, lang: String = "en"): DataFrame = {
    val withHits = docs
      .withColumn("__h", tokenSetHits(lower(col("text")), langStopwords.map(_._2)))
      .select((Seq(col("doc_id"), col("text"),
        element_at(col("__h"), 1).as("__ntok")) ++
          langStopwords.zipWithIndex.map { case ((l, _), i) =>
            element_at(col("__h"), i + 2).as(s"__$l")
          }): _*)
    withHits
      .withColumn("__pred",
        expr("""CASE WHEN __en >= __de AND __en >= __fr AND __en >= __es THEN 'en'
               |WHEN __de >= __fr AND __de >= __es THEN 'de'
               |WHEN __fr >= __es THEN 'fr' ELSE 'es' END""".stripMargin))
      .filter(col("__ntok") >= minTokens && col("__pred") === lang)
      .select("doc_id", "text")
  }

  /** Per-group length-tail trim (r7): drop the shortest and longest
    * `frac` of documents of each group by RANK, keeping the middle — the
    * outlier-length filter (truncated pages, concatenation blobs) that a
    * percentile threshold approximates, restated rank-exact so it is
    * deterministic and engine-independent (no FP percentile
    * interpolation; ties broken by doc_id).
    *
    * Scale shape: one [[graft.functions.TokenSetHits]] kernel scan for
    * token counts, then ONE group-keyed window partitioning shared by the
    * rank and the group count (the p31 quality-gate shape) — a single
    * shuffle, no join, no driver-side percentile pass. */
  def trimLengthTails(docs: DataFrame, frac: Double = 0.1,
      textCol: String = "text", idCol: String = "doc_id",
      groupCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val d = docs.select(col(idCol).as("doc_id"), col(groupCol).as("source"),
      element_at(tokenSetHits(col(textCol), Nil), 1).cast("long").as("n_tok"))
    val byLen = Window.partitionBy("source").orderBy(col("n_tok"), col("doc_id"))
    val whole = Window.partitionBy("source")
    d.withColumn("__rk", row_number().over(byLen))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rk") > floor(col("__n") * frac) &&
        col("__rk") <= col("__n") - floor(col("__n") * frac))
      .select(col("doc_id"), col("source"), col("n_tok"))
  }
}
