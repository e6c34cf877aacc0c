package graft.demo

import org.apache.spark.sql.functions._

import graft.streaming.DriftStreams

/** Measures what [[graft.streaming.DriftStreams.driftMonitor]]'s
  * `typedLit` reference profile actually costs at 256k / 1M / 4M
  * (group, token) entries — the r13 verdict asked for the guard default
  * to be a measured bound, not a hoped one — and the same workload
  * through [[DriftStreams.driftMonitorJoined]] (the stream-static route
  * that keeps the profile distributed). Reference: G=64 groups × V
  * distinct tokens each; stream: 64 groups × 100 tokens drawn from the
  * profile. Batch form (identical plan to the micro-batch finisher).
  *
  * Results are recorded in BASELINE.md §drift-literal-probe. */
object DriftLitProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder(32, "graft-driftlit")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val G = 64
    for (entries <- Seq(256L << 10, 1L << 20, 4L << 20)) {
      val v = entries / G
      val ref = spark.range(entries).select(
        (col("id") % G).cast("string").as("source"),
        concat(lit("t"), col("id").cast("string")).as("text"))
      // streamed side: 100 tokens per group, all on-profile (ids 0..99
      // within each group's slice), plus one off-profile token
      val cur = spark.range(G * 100L).select(
        (col("id") % G).cast("string").as("source"),
        concat(lit("t"), ((col("id") % G) * v + (col("id") / G))
          .cast("string")).as("text"))
        .union(spark.range(G).select(col("id").cast("string").as("source"),
          lit("offprofile").as("text")))
      for ((label, run) <- Seq(
        "literal" -> (() => DriftStreams.driftMonitor(cur, ref,
          "source", "text", maxRefEntries = entries + 1)),
        "joined" -> (() => DriftStreams.driftMonitorJoined(cur, ref,
          "source", "text")))) {
        val t0 = System.nanoTime()
        val rows = run().collect()
        val wall = (System.nanoTime() - t0) / 1e9
        val mem = (Runtime.getRuntime.totalMemory -
          Runtime.getRuntime.freeMemory) / (1 << 20)
        println(f"[driftlit] route=$label entries=$entries rows=${rows.length} " +
          f"wall=$wall%.1f s driver_heap_used=${mem} MiB")
      }
    }
    spark.stop()
  }
}
