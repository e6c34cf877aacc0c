package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge DataFrames — the link-graph side of corpus
  * curation. Web-scale training-data recipes weight and filter documents by
  * host-graph centrality (Common Crawl publishes host-level PageRank;
  * CCNet/RefinedWeb-style curation uses link signals beside text quality),
  * and the same primitive ranks citation or reference graphs extracted from
  * a corpus.
  *
  * Reference scope note: the reference engine (delta-lake-health) has no
  * graph surface — this extends the training-data-pipeline family the build
  * brief asks for (the connected-components primitive lives with its dedup
  * consumer in [[Dedup.clusters]]; this file holds value-propagating
  * iterations).
  */
object Graphs {

  /** PageRank (Brin & Page '98) over a directed multigraph given as an edge
    * frame — parallel edges count: a source's rank splits across its edge
    * ROWS, so duplicated (src,dst) rows weight that link, matching the
    * multigraph a per-document link extraction naturally produces.
    *
    * Semantics per iteration (damping d, N = |distinct nodes|):
    *   rank'(v) = (1−d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + dangling/N)
    * where dangling = Σ rank over nodes with no out-edges (their mass
    * redistributes uniformly — the standard dangling-node treatment, which
    * keeps total mass at 1). rank⁰ = 1/N.
    *
    * Determinism across engines (the LM-family discipline): per-edge
    * contributions rank/deg quantize to the 1e-9 grid and sum as exact
    * longs (order-free); the dangling mass is the same quantized integer
    * sum; ranks round to 9 after every update with the identical
    * expression tree both engines replay. The OUTPUT stays on the round-9
    * grid — a round-6 output would collapse every rank below 5e-7 to zero,
    * i.e. all of a ≥10M-node web graph's tail (1/N is already 1e-7 there);
    * round-9 holds to ~1e9 nodes, past which the quantization grid itself
    * should scale with 1/N.
    *
    * Scale shape (100 TB link graph): each iteration is ONE join of the
    * edge frame against the node-sized rank frame (both keyed on the
    * source — co-partitionable, and AQE handles the skew a mega-hub
    * introduces) plus a per-destination hash aggregation; the dangling
    * mass is a one-row aggregate entering via broadcast cross join, and
    * the rank frame is localCheckpointed every round so lineage stays flat
    * over any iteration count (the [[Dedup.clustersDistributed]]
    * discipline). Driver state = the node count. No windows, no collect
    * of node or edge rows.
    *
    * Fault-tolerance envelope (r17 verdict #6): `localCheckpoint(true)`
    * pins the rank frame to EXECUTOR-local blocks — losing an executor
    * mid-run discards them and fails the job unrecoverably. Single-JVM
    * and short cluster runs are inside that envelope; an iteration count
    * × graph size that must survive executor preemption should use
    * reliable checkpoints: `setCheckpointDir(<hdfs/s3 path>)` + swap
    * `.localCheckpoint(true)` for `.checkpoint(true)` (node-sized frame,
    * one write per round; checkpoint the nodes frame once the same way).
    * Same trade in [[Classifier.hashedLogReg]] and
    * [[CorpusOps.bpeMerges]]. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               damping: Double = 0.85, iters: Int = 10): DataFrame = {
    require(damping > 0 && damping < 1,
      s"damping must be in (0,1), got $damping")
    require(iters >= 1 && iters <= 128, s"iters must be in [1,128], got $iters")
    require(srcCol != dstCol, "src and dst columns must differ")
    require(!srcCol.startsWith("__") && !dstCol.startsWith("__"),
      "edge columns must not use the reserved __ namespace")
    val src = col(srcCol)
    val dst = col(dstCol)

    val e = edges.select(src.as("__src"), dst.as("__dst")).persist()
    try {
      // deg is LOOP-INVARIANT but was a lazy plan: every round re-ran the
      // out-degree aggregation in BOTH its consumers (the contrib join and
      // the dangling-mass anti-join) — 2·iters aggregations of the edge
      // frame's cache (r19, QueryJobProbe: pagerank at sf0.1 was 66 jobs
      // of scheduling floor). One eager materialization up front; the
      // frame is distinct-source bounded, the same envelope as `nodes`.
      val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
        .localCheckpoint(true)
      val nodes = e.select(col("__src").as("node"))
        .union(e.select(col("__dst").as("node")))
        .distinct().localCheckpoint(true)
      val n = nodes.count()
      require(n > 0, "edge frame must be non-empty")
      val nD = n.toDouble

      var ranks = nodes.select(col("node"),
        round(lit(1.0) / lit(nD), 9).as("__r")).localCheckpoint(true)
      for (_ <- 1 to iters) {
        val contrib = e
          .join(ranks, e("__src") === ranks("node"))
          .join(deg, "__src")
          .groupBy(col("__dst"))
          .agg(sum(round(col("__r") / col("__deg") * 1e9, 0).cast("long"))
            .as("__cq"))
          .withColumnRenamed("__dst", "node")
        val dang = ranks.join(deg, ranks("node") === deg("__src"), "left_anti")
          .agg(coalesce(sum(round(col("__r") * 1e9, 0).cast("long")),
            lit(0L)).as("__dq"))
        ranks = nodes
          .join(contrib, Seq("node"), "left")
          .crossJoin(broadcast(dang))
          .select(col("node"),
            round((lit(1.0) - lit(damping)) / lit(nD) + lit(damping) *
              (coalesce(col("__cq"), lit(0L)).cast("double") / 1e9
                + col("__dq").cast("double") / 1e9 / lit(nD)), 9).as("__r"))
          .localCheckpoint(true)
      }
      // ranks is materialized — safe to unpersist the edge projection
      ranks.select(col("node"), col("__r").as("rank"))
    } finally e.unpersist()
  }
}
