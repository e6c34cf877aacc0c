package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.minhashExprs
import graft.operators.Dedup
import graft.queries.PipelineQueries

/** One-off measurement: is {hamming(simhash) <= maxBits} a superset of
  * {token-set jaccard >= T} on the planted corpus, and what do the two
  * distributions look like near the boundary? Drives the choice of verify
  * threshold for the dedup_simhash oracle graduation. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .appName("simhash-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = PipelineQueries.docsWithPlants(spark, dir)

    // all-pairs token-set jaccard (sf0.01 is small enough to brute force)
    val toks = docs.select(col("doc_id").as("id"),
      array_distinct(graft.functions.TextFunctions.tokens(
        graft.functions.TextFunctions.normalized(col("text")))).as("t"),
      minhashExprs.simhashLongs(minhashExprs.tokenHashes(col("text"))).as("sh"))
      .cache()
    val a = toks.select(col("id").as("id_a"), col("t").as("t_a"), col("sh").as("sh_a"))
    val b = toks.select(col("id").as("id_b"), col("t").as("t_b"), col("sh").as("sh_b"))
    val pairs = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("t_a"), col("t_b")).as("jaccard"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .cache()

    println("== jaccard >= 0.5 pairs: hamming distribution ==")
    pairs.where(col("jaccard") >= 0.5)
      .groupBy(col("hamming")).agg(count(lit(1)).as("n"),
        min(col("jaccard")).as("min_j"), max(col("jaccard")).as("max_j"))
      .orderBy("hamming").show(100, truncate = false)

    println("== hamming <= 6 pairs: jaccard distribution ==")
    pairs.where(col("hamming") <= 6)
      .groupBy(col("hamming")).agg(count(lit(1)).as("n"),
        min(col("jaccard")).as("min_j"), max(col("jaccard")).as("max_j"))
      .orderBy("hamming").show(100, truncate = false)

    for (t <- Seq(0.6, 0.7, 0.8, 0.9)) {
      val truth = pairs.where(col("jaccard") >= t)
      val missed = truth.where(col("hamming") > 3).count()
      val nT = truth.count()
      println(s"T=$t truth=$nT missedByHamming3=$missed")
    }
    spark.stop()
  }
}
