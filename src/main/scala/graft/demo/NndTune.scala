package graft.demo

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** nnDescent parameter sweep (recall vs the exact graph at 500 nodes) plus
  * a corpus-scale leg: defaults over an arbitrary embeddings dir (pass the
  * parquet path, e.g. /tmp/graft_sf1/embeddings.parquet) with recall
  * measured against the true full-corpus top-k of a 200-query sample. */
object NndTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder(32, "graft-nndtune")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = edges(Similarity.knnGraph(e, "vec_id", "embedding", k = 5))
    for (ex <- Seq(2, 3, 4); it <- Seq(2, 3, 4, 5)) {
      val t0 = System.nanoTime()
      val got = edges(Similarity.nnDescent(e, "vec_id", "embedding",
        k = 5, iterations = it, expand = ex))
      val r = (got & exact).size.toDouble / exact.size
      println(f"[nndtune] expand=$ex it=$it recall=$r%.3f " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // sample-rate (ρ) sweep at the defaults: candidate volume ∝ ρ²
    for (rho <- Seq(1.0, 0.7, 0.5)) {
      val t0 = System.nanoTime()
      val got = edges(Similarity.nnDescent(e, "vec_id", "embedding",
        k = 5, rho = rho))
      val r = (got & exact).size.toDouble / exact.size
      println(f"[nndtune] rho=$rho recall=$r%.3f " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // corpus-scale leg: the full graph at defaults; recall vs the TRUE
    // top-k (brute force against the whole corpus) of a 200-query sample
    args.headOption.foreach { path =>
      val big = spark.read.parquet(path)
      val n = big.count()
      val sample = big.where(col("vec_id") < 200)
      val truth = edges(Similarity.bruteForceTopK(sample, big,
        "vec_id", "embedding", k = 10))
      for (rho <- Seq(1.0, 0.7, 0.5)) {
        val t0 = System.nanoTime()
        val g = Similarity.nnDescent(big, "vec_id", "embedding", k = 10,
            rho = rho)
          .localCheckpoint(true)
        val nEdges = g.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val gotS = edges(g.where(col("query_id") < 200))
        val r = (gotS & truth).size.toDouble / truth.size
        println(f"[nndtune] SCALE $path: n=$n rho=$rho edges=$nEdges " +
          f"wall=$wall%.1f s sampled-recall@10=$r%.3f")
      }
    }
    spark.stop()
  }
}
