package graft.demo

import org.apache.spark.sql.functions._

/** Fourth-decade scale leg (r17 verdict #8): run the one family pair whose
  * exponent story carries the 100 TB claims — the cluster-form n-gram
  * near-dup (`Dedup.ngramJaccardClusters`) and the measured-k SemDeDup
  * facade (`Clustering.semanticDedupAuto`) — on the [[MakeSf30]] content
  * fixture (~1.5M docs / 600k vectors: 3× the sf10 corpus, 30× sf1),
  * OPERATOR-LEVEL on the raw tables (the fixture's wide id step is outside
  * the planted-contract convention; the ~20 plant rows the contract
  * entries add are noise at this scale anyway). Prints per-operator wall +
  * output rows; run under the leg convention
  * (`SPARK_GRAFT_CPUS=4 SPARK_DRIVER_MEM=8g`) for comparability with the
  * BASELINE exponent table.
  * Usage: `tools/run_graft.sh graft.demo.FourthDecadeProbe /tmp/graft_sf30`. */
object FourthDecadeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.localBuilder(cpus, "fourth-decade")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[$tag] wall=${(System.nanoTime() - t0) / 1e9}%.1f s rows=$rows")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs=${docs.count()}")
    timed("ngram_clusters") {
      graft.operators.Dedup.ngramJaccardClusters(
        docs, "doc_id", "text", n = 3, threshold = 0.6).count()
    }
    graft.operators.Dedup.unpersistAll()

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"vectors=${emb.count()}")
    timed("semantic_dedup_auto") {
      graft.operators.Clustering.semanticDedupAuto(
        emb, "vec_id", "embedding", tau = 0.95, cellTarget = 1000).count()
    }
    spark.stop()
  }
}
