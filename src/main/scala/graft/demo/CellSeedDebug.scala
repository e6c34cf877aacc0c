package graft.demo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.exprs
import graft.operators.{Clustering, Sampling}

/** Standalone reproduction of the r15 cell-chunk seed experiment — the
  * sweep measured recall FROZEN across descent rounds from a cell seed
  * (0.011 at 20k nodes) even though 49.5% of true edges are within-cell,
  * which says the descent loop got nothing usable from the seed. This
  * probe rebuilds the chunk seed and runs an instrumented descent round by
  * round (edge counts, candidate counts, per-round recall), to pin whether
  * the failure was the seed concept or the experiment plumbing. */
object CellSeedDebug {
  def main(args: Array[String]): Unit = {
    val path = args.headOption
      .getOrElse("/root/testdata/sf0.1/embeddings.parquet")
    val spark = graft.GraftSession.localBuilder(32, "graft-cellseeddebug")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(path).localCheckpoint(true)
    val n = e.count()
    val k = 5; val kk = 15; val chunkSize = 30
    val truth = graft.operators.Similarity
      .bruteForceTopK(e.where(col("vec_id") % 20 === 0), e,
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val qids = truth.map(_._1)
    def recall(df: DataFrame): Double = {
      val got = df.where(col("query_id") % 20 === 0)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet.filter(p => qids(p._1))
      (got & truth).size.toDouble / truth.size
    }

    // ---- the chunk seed, exactly as the r15 sweep built it ----
    val assigned = Clustering.kmeansAssign(e, "vec_id", "embedding", k = 16)
      .select(col("vec_id").as("__nid"), col("cell"))
      .join(e.select(col("vec_id").as("__nid"),
        col("embedding").as("__nv")), "__nid")
    val sizes = assigned.groupBy(col("cell")).agg(count(lit(1)).as("__csz"))
    val chunked = assigned.join(broadcast(sizes), "cell")
      .select(col("__nid"), col("__nv"), col("cell"),
        pmod(xxhash64(col("__nid"), lit(7L)),
          greatest(ceil(col("__csz") / chunkSize), lit(1L))).as("chunk"))
    val scored0 = chunked.as("a").join(chunked.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.__nid") =!= col("b.__nid"))
      .select(col("a.__nid").as("query_id"), col("b.__nid").as("neighbor_id"),
        exprs.cosineSimilarity(col("a.__nv"), col("b.__nv")).as("cosine"))
    println(s"[cellseed] raw in-chunk pairs = ${scored0.count()}")
    // rankTopK is private; replicate with a window (debug-only)
    import org.apache.spark.sql.expressions.Window
    def topK(scored: DataFrame, kcap: Int): DataFrame = scored
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .where(col("rank") <= kcap)
    var edges = topK(scored0, kk).localCheckpoint(true)
    println(f"[cellseed] n=$n seedEdges=${edges.count()} " +
      f"seedRecall=${recall(edges.where(col("rank") <= k))}%.3f")

    val vecs = e.select(col("vec_id").as("__nid"), col("embedding").as("__nv"))
    for (it <- 1 to 4) {
      val undAll = edges
        .select(col("query_id").as("__src"), col("neighbor_id").as("__dst"))
        .union(edges
          .select(col("neighbor_id").as("__src"), col("query_id").as("__dst")))
      val non = undAll.as("a").join(undAll.as("b"),
          col("a.__dst") === col("b.__src") && col("a.__src") =!= col("b.__dst"))
        .select(col("a.__src").as("__src"), col("b.__dst").as("__dst"))
      val cand = non.union(undAll.where(col("__src") =!= col("__dst")))
        .distinct()
      val nCand = cand.count()
      val scored = cand
        .join(vecs.select(col("__nid").as("__src"), col("__nv").as("__sv")),
          "__src")
        .join(vecs.select(col("__nid").as("__dst"), col("__nv").as("__dv")),
          "__dst")
        .select(col("__src").as("query_id"), col("__dst").as("neighbor_id"),
          exprs.cosineSimilarity(col("__sv"), col("__dv")).as("cosine"))
      edges = topK(scored, kk).localCheckpoint(true)
      println(f"[cellseed] it=$it candidates=$nCand edges=${edges.count()} " +
        f"recall@k=${recall(edges.where(col("rank") <= k))}%.3f")
    }
    spark.stop()
  }
}
