package graft.demo

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** NN-descent seeding/round-count experiment (r14 verdict item 4). Two
  * measurements:
  *
  * 1. iterations × ρ sweep with sampled recall vs brute-force truth — the
  *    data behind [[Similarity.nnDescentIterationsFor]]'s scale-aware
  *    round count (at 20k nodes it=3 reaches 0.986; at 2k nodes it is
  *    still climbing at 0.704 — run against both decades).
  *
  * 2. The kmeans-cell seed CEILING: an IVF-cell chunk seed (pair nodes
  *    only within ~30-member hash chunks of their coarse cell) was the
  *    candidate cheap seed, and the cell-seeded descent measured recall
  *    FROZEN at 0.011 (20k) / 0.040 (2k) across it=0..5. [[CellSeedDebug]]
  *    pinned the mechanism: the descent explores only the CONNECTED
  *    COMPONENTS of its seed graph, and the chunk seed's components are
  *    the disjoint 30-node chunks themselves (candidate count frozen at
  *    the seed's own pair set, rounds 1-4 identical). This leg measures
  *    the within-CELL ceiling — the best even an uncapped (quadratic)
  *    cell seed could reach — as the fraction of TRUE top-5 edges whose
  *    endpoints share a kmeans cell: 0.495 at 20k nodes, itself far below
  *    LSH-seeded recall. Both legs kept here (not in the library) so the
  *    negative result stays reproducible without shipping the footgun.
  *
  * Usage: runMain graft.demo.NndSeed [embeddingsDir] (default sf1). */
object NndSeed {
  def main(args: Array[String]): Unit = {
    val path = args.headOption
      .getOrElse("/tmp/graft_sf1/embeddings.parquet")
    val spark = graft.GraftSession.localBuilder(32, "graft-nndseed")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(path).localCheckpoint(true)
    val n = e.count()
    // truth: exact top-5 for a deterministic ~1/20 query sample
    val sample = e.where(col("vec_id") % 20 === 0)
    val truthDf = Similarity
      .bruteForceTopK(sample, e, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val truth = truthDf.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val qids = truth.map(_._1)
    println(s"[nndseed] n=$n queries=${qids.size} truthEdges=${truth.size}")

    // leg 2: the cell-seed ceiling — what fraction of TRUE edges even
    // exists inside a 16-cell kmeans partition of this corpus
    val cells = graft.operators.Clustering.kmeansAssign(
      e, "vec_id", "embedding", k = 16)
    val withinCell = truthDf
      .join(cells.select(col("vec_id").as("query_id"),
        col("cell").as("qc")), "query_id")
      .join(cells.select(col("vec_id").as("neighbor_id"),
        col("cell").as("nc")), "neighbor_id")
      .where(col("qc") === col("nc")).count()
    println(f"[nndseed] cell-seed recall ceiling = " +
      f"${withinCell.toDouble / truth.size}%.3f " +
      f"($withinCell/${truth.size} true edges share a kmeans cell)")

    // leg 1: iterations × rho sweep (plus the auto facade)
    for (it <- Seq(0, 2, 3, 4, 5); rho <- Seq(1.0, 0.7)) {
      val t0 = System.nanoTime()
      val g = Similarity.nnDescent(e, "vec_id", "embedding", k = 5,
          iterations = it, rho = rho)
        .localCheckpoint(true)
      g.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val got = g.where(col("query_id") % 20 === 0)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
        .filter(p => qids(p._1))
      val recall = (got & truth).size.toDouble / truth.size
      println(f"[nndseed] it=$it rho=$rho wall=$wall%.2f s recall=$recall%.3f")
    }
    locally {
      val t0 = System.nanoTime()
      val g = Similarity.nnDescentAuto(e, "vec_id", "embedding", k = 5)
        .localCheckpoint(true)
      g.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val got = g.where(col("query_id") % 20 === 0)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
        .filter(p => qids(p._1))
      val recall = (got & truth).size.toDouble / truth.size
      println(f"[nndseed] AUTO (planes=${Similarity.nnDescentPlanesFor(n)}) " +
        f"wall=$wall%.2f s recall=$recall%.3f")
    }
    spark.stop()
  }
}
