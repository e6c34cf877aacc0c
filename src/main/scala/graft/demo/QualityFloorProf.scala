package graft.demo

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextFunctions
import graft.operators.Sampling

/** Stage attribution for the quality_floor watch item (r16 verdict #7):
  * where do the entry's ~2.5 s go — the composite-score projection (paid
  * TWICE: once under the cutoff aggregate, once under the join probe), the
  * KLL cutoff aggregate, or the join+filter? n=3 medians per leg. */
object QualityFloorProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localBuilder(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "qf-prof")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // page cache warm
    val scored = docs.select(col("doc_id"), col("source"),
      TextFunctions.qualityScore(col("text")).as("quality"))
    val tScore = med(scored.foreach(_ => ()))
    val cuts = scored.groupBy(col("source"))
      .agg(graft.functions.exprs.kllQuantiles(
        round(col("quality").cast("double"), 6), 1 << 13, Seq(0.25)).as("c"))
    val tCuts = med(cuts.collect())
    val tFull = med(Sampling.qualityFloor(scored, "doc_id", "source",
      "quality", p = 0.25).count())
    // component legs of the score itself
    def leg(c: org.apache.spark.sql.Column): Double =
      med(docs.select(sum(c.cast("double"))).collect())
    val tTok = leg(TextFunctions.tokenCount(col("text")))
    val tPunct = leg(TextFunctions.punctCount(col("text")))
    val tStop = leg(TextFunctions.stopwordRatio(col("text")))
    val tAvg = leg(TextFunctions.avgWordLen(col("text")))
    println(f"== qf-prof sf=$sfDir: score_scan=$tScore%.2f cuts_agg=$tCuts%.2f full=$tFull%.2f | tokenCount=$tTok%.2f punct=$tPunct%.2f stopword=$tStop%.2f avgWordLen=$tAvg%.2f ==")
    spark.stop()
  }
}

/** Formatted-plan dump for the same entry (separate main: keep timing runs
  * clean of explain output). */
object QualityFloorPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localBuilder(32, "qf-plan")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val scored = docs.select(col("doc_id"), col("source"),
      TextFunctions.qualityScore(col("text")).as("quality"))
    val full = Sampling.qualityFloor(scored, "doc_id", "source", "quality", p = 0.25)
    full.explain("formatted")
  }
}
