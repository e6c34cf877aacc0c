package graft.demo

import org.apache.spark.sql.functions._

/** Scale probe for the DISTRIBUTED connected-components branch
  * ([[graft.operators.Dedup.clusters]] above `driverEdgeLimit` — min-label
  * propagation with the pointer-doubling shortcut), which the contract's
  * bounded fixtures never reach: ≥10M synthetic edges over ~10M nodes with
  * known ground truth.
  *
  * Graph shape (adversarial in both directions):
  *   - 100 CHAINS of 50k nodes each (5M edges, diameter 50k) — the
  *     worst case for plain label propagation (O(diameter) rounds); the
  *     pointer-doubling shortcut must converge in ~log2(50k) ≈ 16 rounds.
  *   - 100k STARS of 50 nodes each (4.9M edges) — the breadth case: wide
  *     fan-in per round, converges in O(1) rounds.
  *   - 1M untouched SINGLETON ids (the left-anti union-back path).
  *
  * Ground truth: every chain node labels to its chain base, every star node
  * to its hub, every singleton to itself — checked exactly over all 11M
  * labels, plus the distinct-component count. A reliable checkpoint dir is
  * set so [[graft.operators.Dedup.materializeRound]] exercises the
  * cluster-scale (fault-tolerant) lineage-truncation path, not
  * localCheckpoint. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder(32, "graft-ccprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)

    val nChains = 100L
    val chainLen = 50000L           // nodes per chain
    val chainBase = 0L              // chain c occupies [c*10^6, c*10^6+50k)
    val nStars = 100000L
    val starSize = 50L              // hub + 49 leaves
    val starBase = 1000000000L      // star s occupies [base + s*64, +50)
    val nSingle = 1000000L
    val singleBase = 2000000000L

    // chain edges: (c*1M + i, c*1M + i + 1) for i in [0, 50k-1)
    val chainEdges = spark.range(nChains * (chainLen - 1)).select(
      ((col("id") / (chainLen - 1)).cast("long") * 1000000L + chainBase
        + col("id") % (chainLen - 1)).as("id_a"),
      ((col("id") / (chainLen - 1)).cast("long") * 1000000L + chainBase
        + col("id") % (chainLen - 1) + 1L).as("id_b"))
    // star edges: (hub, hub + 1 + j) for j in [0, 49); REVERSED orientation
    // (id_a = leaf) half the time so the canonicalization path is exercised
    val starEdges = spark.range(nStars * (starSize - 1)).select(
      ((col("id") / (starSize - 1)).cast("long") * 64L + starBase).as("hub"),
      (col("id") % (starSize - 1) + 1L).as("j"))
      .select(
        when(col("j") % 2 === 0, col("hub"))
          .otherwise(col("hub") + col("j")).as("id_a"),
        when(col("j") % 2 === 0, col("hub") + col("j"))
          .otherwise(col("hub")).as("id_b"))
    val edges = chainEdges.unionByName(starEdges)

    val chainIds = spark.range(nChains * chainLen).select(
      ((col("id") / chainLen).cast("long") * 1000000L + chainBase
        + col("id") % chainLen).as("id"))
    val starIds = spark.range(nStars * starSize).select(
      ((col("id") / starSize).cast("long") * 64L + starBase
        + col("id") % starSize).as("id"))
    val singleIds = spark.range(nSingle)
      .select((col("id") + singleBase).as("id"))
    val ids = chainIds.unionByName(starIds).unionByName(singleIds)

    val nEdges = edges.count()
    val nIds = ids.count()
    println(s"graph: $nEdges edges over $nIds ids " +
      s"($nChains chains x $chainLen, $nStars stars x $starSize, " +
      s"$nSingle singletons)")

    val t0 = System.nanoTime()
    // driverEdgeLimit=0 forces the distributed branch regardless of |E|
    val labels = graft.operators.Dedup.clusters(
      ids, edges, maxIter = 50, driverEdgeLimit = 0L)
    val labeled = labels.cache()
    val nLabels = labeled.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"distributed clusters over $nEdges edges: $wall%.1f s " +
      s"($nLabels labels; rounds on stderr)")

    // exact ground truth over every label, one pass
    val wrong = labeled.select(col("id"), col("cluster_id"),
      when(col("id") < starBase,
        (col("id") / 1000000L).cast("long") * 1000000L)   // chain base
        .when(col("id") < singleBase,
          ((col("id") - starBase) / 64L).cast("long") * 64L + starBase) // hub
        .otherwise(col("id"))                              // singleton
        .as("expected"))
      .where(col("cluster_id") =!= col("expected")).count()
    val nComponents = labeled.select("cluster_id").distinct().count()
    val expectComponents = nChains + nStars + nSingle
    println(s"ground truth: $wrong wrong labels (want 0); " +
      s"$nComponents components (want $expectComponents)")
    require(wrong == 0L, s"$wrong nodes labeled off ground truth")
    require(nComponents == expectComponents)
    labeled.unpersist()
    spark.stop()
  }
}
