package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Similarity search over an embedding column (`array<float>`), SURVEY
  * §2.11 north star.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k. One broadcast of the query
  *    vector, one scan, a TakeOrderedAndProject — the right baseline, and
  *    already distributed (scan parallelism = input splits).
  *  - [[annTopK]] / [[Dedup.embeddingPairs]]: random-hyperplane LSH buckets
  *    prune the scan to candidate buckets; recall is tunable via `planes` /
  *    `probes`. At 100 TB the bucketed path turns a full-corpus scan per
  *    query into a bucket-sized scan.
  *
  * Hyperplanes are pseudo-random but fully deterministic (seeded xxhash64 of
  * (plane, dim)), so signatures are reproducible across runs and clusters.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component g(plane, dim) in
    * [-1, 1): derived from xxhash64 — no materialized model, recomputed
    * inside codegen. */
  private def gauss(plane: Column, dim: Column): Column =
    (pmod(xxhash64(plane, dim), lit(2000003L)) - lit(1000001L)).cast("double") / lit(1000001.0)

  /** `planes`-bit signature of a float vector: bit j = sign(v · r_j). */
  def hyperplaneSignature(vec: Column, planes: Int): Column = {
    val dims = size(vec)
    (0 until planes).map { j =>
      val dot = aggregate(sequence(lit(0), dims - 1), lit(0.0d),
        (s, i) => s + element_at(vec, i + 1).cast("double") * gauss(lit(j), i))
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

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
}
