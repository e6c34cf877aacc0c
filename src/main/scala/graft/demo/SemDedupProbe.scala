package graft.demo

import org.apache.spark.sql.functions._

/** Measured sf0.1 → sf1 scaling of [[graft.operators.Clustering
  * .semanticDedupAuto]] — the facade that sizes k to the corpus
  * (k ≈ n / cellTarget) so the within-cell pairwise stage stays LINEAR
  * (n × cellTarget candidate pairs). The fixed-k=8 contract entry
  * measured 15× wall on 10× the vectors at sf1 (cell size ∝ n ⇒
  * quadratic cells); this records the auto path staying ~linear on the
  * same data, turning the facade's on-paper bound into a measured row.
  *
  * Usage: runMain graft.demo.SemDedupProbe [sf1Dir] */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.GraftSession.localBuilder(32, "graft-semdedupprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(label: String, dir: String, cellTarget: Int): Double = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = e.count()
      val t0 = System.nanoTime()
      val pairs = graft.operators.Clustering.semanticDedupAuto(
        e, "vec_id", "embedding", tau = 0.95, cellTarget = cellTarget)
      val nPairs = pairs.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[semdedupprobe] $label%-6s n=$n%6d cellTarget=$cellTarget%4d " +
        f"k=${math.max(1L, (n + cellTarget - 1) / cellTarget)}%3d " +
        f"pairs=$nPairs%6d wall=$wall%.1f s")
      wall
    }
    // cellTarget 250: sf0.1 (2k vecs) -> k=8 (matching the contract
    // entry's k), sf1 (20k vecs) -> k=80 — same per-cell pair bound
    val w01 = run("sf0.1", "/root/testdata/sf0.1", 250)
    val w1 = run("sf1", sf1, 250)
    println(f"[semdedupprobe] 10x vectors -> ${w1 / w01}%.1fx wall " +
      "(facade target: ~linear; fixed-k contract entry measured 15x)")
    spark.stop()
  }
}
