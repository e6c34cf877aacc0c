package graft.demo

import org.apache.spark.sql.SparkSession

/** One-off probe: where does decontamination_auto's overhead vs the bloom
  * branch come from? Times facade vs direct branch calls back-to-back in
  * one session, plus the memo-lookup cost in isolation. */
object DecontProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder(4, "graft-decont-probe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    // warm up codegen paths once
    graft.queries.PipelineQueries.decontaminationBloom(spark, dir).count()
    graft.operators.Dedup.unpersistAll()
    // bench order: exact -> auto -> bloom, per-query cache release
    (1 to 4).foreach { i =>
      time(s"exact direct #$i") {
        graft.queries.PipelineQueries.decontamination(spark, dir).count()
      }
      graft.operators.Dedup.unpersistAll()
      time(s"auto facade #$i") {
        graft.queries.PipelineQueries.decontaminationAuto(spark, dir).count()
      }
      graft.operators.Dedup.unpersistAll()
      time(s"bloom direct #$i") {
        graft.queries.PipelineQueries.decontaminationBloom(spark, dir).count()
      }
      graft.operators.Dedup.unpersistAll()
    }
    // memo-lookup cost in isolation (plan canonicalization + hash)
    val docs = graft.queries.PipelineQueries.docsWithPlants(spark, dir)
    val corpus = docs.where(org.apache.spark.sql.functions.col("doc_id") <
      graft.queries.PipelineQueries.PlantShift)
    val bench = docs.where(org.apache.spark.sql.functions.col("doc_id") >=
      graft.queries.PipelineQueries.PlantShift)
    time("memo key computation x10") {
      (1 to 10).foreach { _ =>
        corpus.queryExecution.optimizedPlan.canonicalized.hashCode
        bench.queryExecution.optimizedPlan.canonicalized.hashCode
      }
      10L
    }
    println(s"memo size = ${graft.operators.Dedup.decisionCacheSize}")
    spark.stop()
  }
}
