package graft.demo

import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.Graphs.pageRank]] — the contract
  * entry's 20-node source graph never exercises the iteration loop at link-
  * graph scale, so this drives two synthetic graphs with EXACT closed-form
  * ground truth:
  *
  *   1. PERMUTATION RING, 10M nodes / 10M edges (i → i+1 mod 10M): every
  *      node has in- and out-degree 1, so rank 1/N is an exact fixed point
  *      OF THE QUANTIZED RECURRENCE — round9(1/1e7) = 1e-7 survives every
  *      update bit-for-bit. Checks min = max = 1e-7 over all 10M ranks
  *      after 5 iterations (also proves the round-9 output grid holds the
  *      tail a round-6 output would zero).
  *   2. MEGA-HUB STAR, 1M leaves → one hub: the worst-skew shape (every
  *      edge lands on ONE reduce key — AQE's skew handling, and the hub row
  *      carries a 1M-row aggregation) plus the dangling-mass path (the hub
  *      has no out-edges). Leaves are symmetric, so the expected (hub,
  *      leaf) ranks come from replaying the scalar recurrence with the
  *      same quantization on the driver; checked EXACTLY.
  */
object PageRankProbe {
  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder(32, "graft-prprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- probe 1: 10M-node permutation ring, exact fixed point ----
    val nRing = 10000000L
    val ring = spark.range(nRing).select(col("id").as("src"),
      ((col("id") + 1L) % nRing).as("dst"))
    val t0 = System.nanoTime()
    val rr = graft.operators.Graphs.pageRank(ring, "src", "dst",
      damping = 0.85, iters = 5)
    val Array(rmin, rmax, rcnt) = rr
      .agg(min(col("rank")), max(col("rank")), count(lit(1)))
      .collect()(0).toSeq.toArray
    val ringSec = (System.nanoTime() - t0) / 1e9
    println(f"ring: 10M nodes / 10M edges, 5 iters in $ringSec%.1f s; " +
      s"ranks min=$rmin max=$rmax n=$rcnt")
    assert(rcnt == nRing, s"expected $nRing ranked nodes, got $rcnt")
    assert(rmin == 1e-7 && rmax == 1e-7,
      s"1/N must be the exact quantized fixed point, got [$rmin, $rmax]")

    // ---- probe 2: 1M-leaf mega-hub star, scalar-replayed ground truth ----
    val nLeaves = 1000000L
    val star = spark.range(nLeaves).select((col("id") + 1L).as("src"),
      lit(0L).as("dst"))
    val t1 = System.nanoTime()
    val sr = graft.operators.Graphs.pageRank(star, "src", "dst",
      damping = 0.85, iters = 5).persist()
    val hub = sr.where(col("node") === 0L).collect()(0).getDouble(1)
    val Array(lmin, lmax) = sr.where(col("node") =!= 0L)
      .agg(min(col("rank")), max(col("rank"))).collect()(0).toSeq.toArray
    val starSec = (System.nanoTime() - t1) / 1e9
    sr.unpersist()

    // replay the symmetric-leaf recurrence with the identical quantization
    val nD = (nLeaves + 1).toDouble
    val base = (1.0 - 0.85) / nD
    var rh = round9(1.0 / nD)
    var rl = rh
    for (_ <- 1 to 5) {
      val cq = nLeaves * math.round(rl / 1.0 * 1e9) // per-edge quantized
      val dq = math.round(rh * 1e9)                 // hub is dangling
      val nh = round9(base + 0.85 *
        (cq.toDouble / 1e9 + dq.toDouble / 1e9 / nD))
      val nl = round9(base + 0.85 * (0.0 / 1e9 + dq.toDouble / 1e9 / nD))
      rh = nh; rl = nl
    }
    println(f"star: 1M leaves -> 1 hub, 5 iters in $starSec%.1f s; " +
      s"hub=$hub (expect $rh) leaves=[$lmin,$lmax] (expect $rl)")
    assert(hub == rh, s"hub rank $hub != scalar-replayed $rh")
    assert(lmin == rl && lmax == rl,
      s"leaf ranks [$lmin,$lmax] != scalar-replayed $rl")

    println("PageRankProbe OK")
    spark.stop()
  }
}
