package graft.demo

import org.apache.spark.sql.functions._
import graft.functions.{minhashExprs}

/** Diagnose the dedup_ngram_lsh sf10 cap breach (r15 scale leg): is the
  * blowup candidate-volume (bucket tuning) or OUTPUT cardinality (the
  * corpus genuinely holds quadratically many J >= 0.6 trigram pairs — the
  * sfN fixture plants `copies` perturbed copies of every base doc, and a
  * 20% token swap leaves the CHARACTER-trigram Jaccard of copy pairs far
  * above the word-level measures it was tuned to break)?
  *
  * Prints: (1) trigram-J quantiles over sampled same-base copy pairs,
  * (2) band-bucket size distribution + exact candidate-pair count
  * Σ C(size,2), (3) the candidate count that survives the signature
  * prefilter. Usage: runMain graft.demo.NgramLshDiag [sfDir] [docStep]
  */
object NgramLshDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val docStep = args.lift(1).map(_.toLong).getOrElse(5000L)
    val spark = graft.GraftSession.localBuilder(32, "graft-ngramdiag")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // (1) same-base copy pairs: base id b < docStep, copies at b + i*docStep
    val sh = docs.where(col("doc_id") % docStep < 50) // 50 bases x all copies
      .select(col("doc_id"),
        minhashExprs.charShingleSet(col("text"), 3).as("sh"))
      .withColumn("base", col("doc_id") % docStep)
      .cache()
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.base") === col("b.base") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter",
        minhashExprs.sortedIntersectCount(col("a.sh"), col("b.sh")))
      .withColumn("j", col("inter").cast("double") /
        (size(col("a.sh")) + size(col("b.sh")) - col("inter")))
    val q = pairs.stat.approxQuantile("j", Array(0.05, 0.25, 0.5, 0.75, 0.95), 0.001)
    val nPairs = pairs.count()
    val ge06 = pairs.where(col("j") >= 0.6).count()
    println(f"[ngramdiag] copy-pair trigram-J over $nPairs sampled pairs: " +
      f"p5=${q(0)}%.3f p25=${q(1)}%.3f p50=${q(2)}%.3f p75=${q(3)}%.3f " +
      f"p95=${q(4)}%.3f; J>=0.6: $ge06 (${100.0 * ge06 / math.max(1, nPairs)}%.1f%%)")

    // (2) band-bucket distribution for the REAL entry's banding (4x8 over 32)
    val withSig = docs
      .select(col("doc_id").as("id"),
        minhashExprs.charShingleSet(col("text"), 3).as("sh"))
      .withColumn("sig", minhashExprs.minhashSig(col("sh"), 32))
    val banded = withSig
      .select(col("id"), explode(graft.operators.Dedup.bandKeys(
        col("sig"), 4, 8)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val sizes = banded.groupBy("band", "bkey").agg(count(lit(1)).as("s")).cache()
    val dist = sizes.agg(count(lit(1)).as("buckets"), max(col("s")).as("max_s"),
      expr("percentile_approx(s, array(0.5, 0.9, 0.99), 1000)").as("p"),
      sum(col("s") * (col("s") - 1) / 2).as("cand_pairs"),
      sum(when(col("s") > 1000, col("s")).otherwise(0L)).as("over_cap_members"))
      .collect()(0)
    println(s"[ngramdiag] buckets=${dist.getAs[Long]("buckets")} " +
      s"max=${dist.getAs[Long]("max_s")} p50/p90/p99=${dist.getAs[Seq[Any]]("p")} " +
      s"candidate_pairs=${dist.getAs[Any]("cand_pairs")} " +
      s"members_in_over-1000-buckets=${dist.getAs[Any]("over_cap_members")}")
    spark.stop()
  }
}
