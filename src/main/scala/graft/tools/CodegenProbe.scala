package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.fallback", "false")                 // fail loud if WSCG breaks
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")       // no interpreted expr fallback
      .config("spark.ui.enabled", "false").config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "k l m n o p")).toDF("id", "text")
      .withColumn("toks", split(col("text"), " "))
    val out = df.selectExpr("id", "simhash64(toks) AS sh",
      "minhash_sig(toks, 16) AS ms", "minhash_tokens_sig(toks, 3, 16) AS mts",
      "cosine_sim(array(1.0f, 2.0f), array(2.0f, 4.0f)) AS cs",
      // round-4 expressions
      "bpe_token_count(text) AS bt",
      "regexp_replace_first(text, '[a-e]', '*') AS rr",
      "minhash_from_hashes(token_window_hashes(toks, 3), 16) AS mfh",
      "hyperplane_sig(array(1.0f, 2.0f), 4) AS hs",
      // r8 kernel
      "size(token_counts(text)) AS tc").collect()
    println("CODEGEN_ONLY_OK rows=" + out.length + " sh0=" + out(0).getLong(1) +
      " ms_len=" + out(0).getSeq[Long](2).length + " cs=" + out(0).getDouble(4) +
      " bt=" + out(0).getInt(5) + " rr=" + out(0).getString(6) +
      " mfh_len=" + out(0).getSeq[Long](7).length +
      " tc=" + out(0).getInt(9))
    spark.stop()
  }
}
