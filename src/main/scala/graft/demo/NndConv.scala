package graft.demo

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** NN-descent convergence probe (r13, evidence for the `delta`
  * early-termination default): per-round changed-edge counts at default
  * knobs over the sf0.1 embeddings — the same anti-join the operator's
  * stop criterion pays — plus wall A/B of delta=0 (all rounds) vs the
  * default 0.001. Records whether the criterion actually fires before
  * the iteration cap at contract scale, and what it saves. */
object NndConv {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.localBuilder(32, "graft-nndconv")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    // per-round deltas: run 1..4 iterations and diff consecutive graphs
    // (delta=0 so no early stop interferes with the measurement)
    var prev: Option[org.apache.spark.sql.DataFrame] = None
    for (it <- 0 to 4) {
      val g = Similarity.nnDescent(e, "vec_id", "embedding",
          iterations = it, delta = 0.0)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val n = g.count()
      prev.foreach { p =>
        val changed = g.join(p, Seq("query_id", "neighbor_id"), "left_anti")
          .count()
        println(f"round $it: edges=$n changed=$changed " +
          f"(${changed.toDouble / math.max(1L, n)}%.5f of lists)")
      }
      prev = Some(g)
    }
    for (d <- Seq(0.0, 0.001)) {
      val t0 = System.nanoTime()
      val n = Similarity.nnDescent(e, "vec_id", "embedding", delta = d).count()
      println(f"delta=$d%.3f: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n edges)")
    }
    spark.stop()
  }
}
