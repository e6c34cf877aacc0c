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

    // --- planted-projection graduation measurements (round 6) ---
    println("== planted pairs: per-plant simhash hamming ==")
    pairs.where(col("id_b") === col("id_a") + PipelineQueries.PlantShift)
      .select(col("id_a"), col("hamming"))
      .orderBy(col("id_a")).show(30, truncate = false)

    println("== full pipeline recall on plants (dedup_simhash maxBits=3) ==")
    val found = Dedup.simhashPairs(docs, "doc_id", "text", maxBits = 3)
      .where(col("id_b") === col("id_a") + PipelineQueries.PlantShift).count()
    println(s"plantsFoundByPipeline=$found / 20")

    println("== organic (non-plant) pairs at hamming <= 3 ==")
    pairs.where(col("id_b") =!= col("id_a") + PipelineQueries.PlantShift &&
        col("hamming") <= 3)
      .orderBy(col("hamming")).show(30, truncate = false)

    // --- portable simhash: organic landscape + plant recall (round 6) ---
    println("== PORTABLE simhash: all pairs at hamming <= 3 (plant flag) ==")
    val psh = Dedup.simhashPortable(docs, "doc_id", "text")
    val pa = psh.select(col("id").as("id_a"), col("simhash").as("sh_a"))
    val pb = psh.select(col("id").as("id_b"), col("simhash").as("sh_b"))
    pa.crossJoin(pb).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"),
        (col("id_b") === col("id_a") + PipelineQueries.PlantShift).as("is_plant"))
      .where(col("hamming") <= 3)
      .orderBy(col("id_a"), col("id_b")).show(100, truncate = false)

    // --- ngram graduation: banding recall on plants (round 6) ---
    println("== ngram: exact trigram jaccard of each planted pair ==")
    val tri = docs.select(col("doc_id"),
      minhashExprs.charShingleSet(col("text"), 3).as("sh3"))
    val exact = tri.where(col("doc_id") < 20)
      .select(col("doc_id").as("id_a"), col("sh3").as("sh_a"))
      .join(tri.where(col("doc_id") >= PipelineQueries.PlantShift)
        .select((col("doc_id") - PipelineQueries.PlantShift).as("id_a"),
          col("sh3").as("sh_b")), "id_a")
      .withColumn("inter", minhashExprs.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("inter").cast("double")
        / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .select(col("id_a"), round(col("jaccard"), 6).as("jaccard"))
      .cache()
    exact.orderBy("id_a").show(30, truncate = false)
    val nTruth = exact.where(col("jaccard") >= 0.6).count()
    val viaPipe = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.6)
      .where(col("id_b") === col("id_a") + PipelineQueries.PlantShift).count()
    println(s"ngramPlantTruthAtJ0.6=$nTruth pipelineFound=$viaPipe " +
      s"(banding recall on plants = ${if (nTruth == viaPipe) "1" else "MISS"})")
    spark.stop()
  }
}
