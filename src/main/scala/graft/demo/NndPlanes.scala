package graft.demo

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off: recall/wall at finer seed buckets (nPlanes sweep) — does a 3x
  * cheaper LSH seed still let 3-4 rounds reach the recall plateau?
  * Usage: runMain graft.demo.NndPlanes [embPath] [planesCsv] [itCsv] [qmod] */
object NndPlanes {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_sf1/embeddings.parquet")
    val planesSweep = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(8, 10, 12))
    val itSweep = args.lift(2).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(0, 3, 4))
    // truth queries = every qmod-th vector; raise on big corpora to bound
    // the brute-force truth pass (10k queries x 200k corpus is ~2G dots)
    val qmod = args.lift(3).map(_.toInt).getOrElse(20)
    val spark = graft.GraftSession.localBuilder(32, "graft-nndplanes")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(path).localCheckpoint(true)
    val truth = Similarity
      .bruteForceTopK(e.where(col("vec_id") % qmod === 0), e,
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val qids = truth.map(_._1)
    for (planes <- planesSweep; it <- itSweep) {
      val t0 = System.nanoTime()
      val g = Similarity.nnDescent(e, "vec_id", "embedding", k = 5,
          iterations = it, nPlanes = planes)
        .localCheckpoint(true)
      g.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val got = g.where(col("query_id") % qmod === 0)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet.filter(p => qids(p._1))
      val recall = (got & truth).size.toDouble / truth.size
      println(f"[nndplanes] planes=$planes it=$it wall=$wall%.2f s recall=$recall%.3f")
    }
    spark.stop()
  }
}
