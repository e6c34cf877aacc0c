package graft.demo

import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries
import graft.functions.minhashExprs

/** Mechanism probe for `dedup_ngram_clusters_scale`'s sf10 wall (r17
  * verdict #2): reproduces the entry's candidate-generation pipeline stage
  * by stage and prints the volume at each step — bucket-occupancy
  * histogram, Σ m·min(reps,m) candidate bound, distinct candidate count,
  * signature-prefilter survivor count, verified pair count — so the
  * dominating term (bucket pile-up vs verify-join width vs distinct
  * shuffle) is measured, not guessed. Run per SF dir:
  * `tools/run_graft.sh graft.demo.NgcProbe /tmp/graft_sf1`. */
object NgcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.localBuilder(cpus, "ngc-probe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val threshold = 0.6
    val numHashes = 32
    val reps = 64
    val docs = PipelineQueries.docsWithPlants(spark, dir)
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val withSig = docs.select(col("doc_id").as("id"),
        minhashExprs.charShingleSet(col("text"), 3).as("sh"))
      .withColumn("sig", minhashExprs.minhashSig(col("sh"), numHashes))
      .cache()
    timed("sig.count")(println(s"docs=${withSig.count()}"))
    println(withSig.select(avg(size(col("sh"))).as("avg_sh"),
      max(size(col("sh"))).as("max_sh")).collect().mkString)

    val exploded = graft.operators.ScaleOps.capBuckets(
      withSig.select(col("id"),
          explode(graft.operators.Dedup.bandKeys(col("sig"), 4, 8)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey")),
      Seq("band", "bkey"), 1000, "ngc_probe").cache()
    timed("exploded.count")(println(s"bucket_rows=${exploded.count()}"))

    // bucket occupancy histogram + the candidate bound Σ m·min(reps,m)
    val occ = exploded.groupBy("band", "bkey").agg(count(lit(1)).as("m"))
      .cache()
    timed("occupancy") {
      occ.select(
          count(lit(1)).as("buckets"),
          max(col("m")).as("max_m"),
          expr("percentile_approx(m, array(0.5,0.9,0.99))").as("m_q"),
          sum(col("m") * least(col("m") - 1, lit(reps.toLong))).as("cand_bound"))
        .show(false)
      occ.select(width_bucket(log10(col("m").cast("double")), lit(0.0), lit(4.0), lit(8)).as("b"))
        .groupBy("b").count().orderBy("b").show(false)
    }

    val anchors = exploded.groupBy(col("band"), col("bkey"))
      .agg(slice(array_sort(collect_set(col("id"))), 1, reps).as("rs"))
      .select(col("band"), col("bkey"), explode(col("rs")).as("rep_id"))
    val candidates = exploded.join(anchors, Seq("band", "bkey"))
      .where(col("id") =!= col("rep_id"))
      .select(least(col("id"), col("rep_id")).as("id_a"),
        greatest(col("id"), col("rep_id")).as("id_b"))
    val rawCand = timed("candidates.raw")(candidates.count())
    val cand = candidates.distinct().cache()
    val nCand = timed("candidates.distinct")(cand.count())
    println(s"cand_raw=$rawCand cand_distinct=$nCand")

    // signature prefilter selectivity measured on the NARROW (sig-only)
    // join — what a sig-first verify would ship the wide arrays for
    val sigOnly = withSig.select(col("id"), col("sig"))
    val surv = timed("sig_prefilter") {
      cand.join(sigOnly.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
        .join(sigOnly.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
        .where(minhashExprs.arrayAgreeCount(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes >= threshold - 0.2)
        .count()
    }
    println(s"sig_survivors=$surv (${"%.2f".format(100.0 * surv / math.max(nCand, 1L))}% of candidates)")

    val verified = timed("verify_full") {
      graft.operators.Dedup.verifyShingleCandidates(
        cand, withSig, threshold, numHashes).count()
    }
    println(s"verified_pairs=$verified")
    spark.stop()
  }
}
