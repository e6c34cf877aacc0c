package graft.demo

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.PipelineQueries

/** Measures [[Dedup.ngramJaccardClusters]]'s anchor-pruning fidelity
  * against the full pair-path components at several `reps` settings —
  * the evidence for the default. A component can only SPLIT under anchor
  * pruning (its edges are a subset of the pair path's, verified by the
  * same exact Jaccard), so the number of docs whose label diverges is the
  * complete error measure. Usage: runMain graft.demo.NgramClusterProbe
  * [sfDir] [reps,reps,...] */
object NgramClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val repsList = args.lift(1).getOrElse("4,8,16,32,64")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.GraftSession.localBuilder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      "ngram-cluster-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = PipelineQueries.docsWithPlants(spark, dir)
    val truth = Dedup.clusters(
        docs.select(col("doc_id").as("id")),
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.6))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truthComponents = truth.values.toSet.size
    println(s"""{"probe":"ngram_clusters","dir":"$dir","docs":${truth.size},"truth_components":$truthComponents}""")
    repsList.foreach { reps =>
      val t0 = System.nanoTime()
      val got = Dedup.ngramJaccardClusters(docs, "doc_id", "text",
          n = 3, threshold = 0.6, reps = reps)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      val diverged = truth.count { case (id, c) => got(id) != c }
      println(s"""{"reps":$reps,"diverged":$diverged,"components":${got.values.toSet.size},"sec":${math.rint(sec * 100) / 100}}""")
      Dedup.unpersistAll()
    }
    spark.stop()
  }
}
