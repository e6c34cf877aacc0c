package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.PipelineQueries

/** Timing breakdown of the dedup_keeplist contract query: signature+pairs
  * cost vs connected-components loop cost (round count is logged by
  * Dedup.clusters itself). */
object KeeplistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("keeplist-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = PipelineQueries.docsWithPlants(spark, dir).cache()
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val pairs = time("minhashPairs (materialized)") {
        val p = Dedup.minhashPairs(docs, "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.7).cache()
        p.count(); p
      }
      println(s"pairs = ${pairs.count()}")
      time("clusters loop") {
        Dedup.clusters(docs.select(col("doc_id").as("id")), pairs).count()
      }
      time("full keepList (fresh pairs)") {
        val p2 = Dedup.minhashPairs(docs, "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.7)
        Dedup.keepList(docs, "doc_id", p2).count()
      }
      pairs.unpersist()
      Dedup.unpersistAll()
    }
    spark.stop()
  }
}
