package graft.demo

import org.apache.spark.sql.functions._

import graft.functions.{exprs, TextFunctions}
import graft.operators.{CorpusOps, Dedup, Sampling}
import graft.queries.PipelineQueries

/** Stage-wise wall profile of the corpus_pipeline_full composition (r12
  * verdict item 8): mirrors corpusPipelineFullQ stage by stage, forcing
  * each persisted frame in order and timing the INCREMENTAL cost, so the
  * 4-6 s bench median decomposes into named stages instead of one number.
  * Caches are released first (the bench measures cold cost; so does
  * this). Mirror, not refactor: the contract query stays one declarative
  * plan, this probe exists to attribute its cost. */
object PipeFullProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.localBuilder(32, "graft-pipefullprof")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (round <- 1 to 3) {
      println(s"round $round (cold):")
      Dedup.unpersistAll()
      val norm = Dedup.track(graft.queries.Queries.t(spark, dir, "documents")
        .select(col("doc_id"), exprs.nfcNormalize(col("text")).as("text"))
        .persist())
      time("normalize (materialize)")(norm.count())
      val bench = graft.queries.Queries.t(spark, dir, "documents")
        .where(col("doc_id") < 20)
        .select((col("doc_id") + PipelineQueries.PlantShift).as("doc_id"),
          concat(col("text"), lit(" graft planted near duplicate suffix"))
            .as("text"))
      val contaminated = Dedup.decontaminate(norm, bench,
          "doc_id", "text", w = 3, minShared = 5)
        .select(col("doc_id")).distinct()
      val deconed = Dedup.track(
        norm.join(contaminated, Seq("doc_id"), "left_anti").persist())
      time("decontaminate + anti-join")(deconed.count())
      val clean = Dedup.track(Dedup.stripBoilerplate(deconed, "doc_id",
        "text", k = 8, w = 4, minDocs = 25).persist())
      time("stripBoilerplate")(clean.count())
      val keepers = Dedup.exactTextGroups(clean, "doc_id", "text")
        .select(col("keeper_id").as("doc_id"))
      val surviving = clean.join(keepers, "doc_id")
        .where(TextFunctions.qualityScore(col("text")) >= 0.3)
      val sampled = time("dedup+quality+budget sample")(
        Sampling.tokenBudgetSample(
            surviving.select(col("doc_id"),
              TextFunctions.tokenCount(col("text")).as("n_tokens")),
            "doc_id", "n_tokens", budget = 2000L)
          .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
          .localCheckpoint(true))
      time("pack + join-back")(
        CorpusOps.packSequences(sampled.select("doc_id", "n_tokens"),
            "doc_id", "n_tokens", budget = 256, numGroups = 16)
          .select(col("id").as("doc_id"), col("n_tokens"),
            col("grp").cast("long").as("grp"), col("pack_id"))
          .join(sampled.select(col("doc_id"), col("cum_tokens")), "doc_id")
          .count())
      val t0 = System.nanoTime()
      Dedup.unpersistAll()
      val full = PipelineQueries.corpusPipelineFullQ(spark, dir).count()
      println(f"  one-shot contract entry      ${(System.nanoTime() - t0) / 1e9}%6.2f s ($full rows)")
    }
    spark.stop()
  }
}
