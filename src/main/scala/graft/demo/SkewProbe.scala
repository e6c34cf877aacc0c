package graft.demo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Queries

/** Skew-robustness probe for the join/window contract surface (r14 verdict
  * item 6): 100 TB data is never uniform, and GraftSession asserts the AQE
  * skew-join config but nothing exercised it against real skew. This probe
  * plants a 90%-hot-key variant of the sf1 corpus — 90% of lineitem rows
  * collapse onto ONE l_orderkey, 90% of orders onto ONE o_custkey, 90% of
  * events onto ONE user_id — and runs the four skew-sensitive entries
  * through both corpora:
  *
  *   join_revenue_by_nation  (lineitem⋈orders⋈customer shuffle joins)
  *   left_join_agg           (customer left⋈ orders)
  *   window_top_orders       (row_number over o_custkey partitions)
  *   user_sessions           (lag/sum windows over user_id partitions)
  *
  * It reports per-entry wall for uniform vs skewed (n=3 medians), whether
  * the final adaptive plan handled the joins' skew (AQEShuffleRead skew
  * split markers), and for the window entries whether the rank-limit
  * pushdown (WindowGroupLimit) bounded the hot partition. The acceptance
  * bar is wall(skew) ≤ ~3× wall(uniform) per entry — skew costs something,
  * but it must degrade, not cliff. A second leg re-runs the shuffle-join
  * entries with the skew thresholds scaled down to the fixture and
  * broadcast disabled (emulating the BYTES a 100 TB cluster sees at the
  * same skew ratio against default thresholds) and asserts the AQE skew
  * split actually engages. Results recorded in BASELINE.md.
  *
  * Usage: runMain graft.demo.SkewProbe [sf1Dir] (default /tmp/graft_sf1;
  * the skewed twin is written to <sf1Dir>_skew once and reused). */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_sf1")
    val skew = base + "_skew"
    val spark = graft.GraftSession.localBuilder(32, "graft-skewprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- build the skewed twin (idempotent: skip if already present) ----
    def hotify(table: String, keyCol: String, uniqueCols: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$base/$table.parquet")
      val hot = df.agg(min(col(keyCol))).collect().head.getLong(0)
      // hash-pure 90% selection keyed by the table's unique row key (NOT
      // monotonically_increasing_id, which is partition-layout dependent),
      // so the twin is reproducible; the hot key is an EXISTING key (joins
      // stay inner-match-able), everything else keeps its key
      df.withColumn(keyCol,
          when(pmod(xxhash64(uniqueCols.map(col): _*), lit(10L)) < 9L,
            lit(hot)).otherwise(col(keyCol)))
        .write.mode("overwrite").parquet(s"$skew/$table.parquet")
    }
    val ready = new java.io.File(s"$skew/_READY").exists()
    if (!ready) {
      hotify("lineitem", "l_orderkey", Seq("l_orderkey", "l_linenumber"))
      hotify("orders", "o_custkey", Seq("o_orderkey"))
      hotify("events", "user_id", Seq("event_id"))
      for (t <- Seq("customer", "supplier", "part", "nation", "region")) {
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$skew/$t.parquet")
      }
      new java.io.File(s"$skew/_READY").createNewFile()
    }

    // ---- time the four entries on both corpora ----
    val entries: Seq[(String, String => DataFrame)] = Seq(
      "join_revenue_by_nation" -> (d => Queries.joinRevenueByNation(spark, d)),
      "left_join_agg" -> (d => Queries.leftJoinAgg(spark, d)),
      "window_top_orders" -> (d => Queries.windowTopOrders(spark, d)),
      "user_sessions" -> (d => Queries.userSessions(spark, d)),
      // r15 verdict item 8: does the 90%-hot user benefit from salting the
      // sessionization? The chunked twin IS the salt (time-chunk partition
      // keys spread the hot user across tasks; boundary merge restores
      // exact sessions) — its skew ratio vs the window form's answers the
      // question with a measurement instead of an argument.
      "user_sessions_chunked" ->
        (d => Queries.userSessionsChunked(spark, d, chunkHours = 24)))
    def median3(f: => Long): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).sorted.apply(1), runs.head._2)
    }
    for ((name, q) <- entries) {
      val (tu, nu) = median3(q(base).count())
      val (ts, ns) = median3(q(skew).count())
      // final ADAPTIVE plan, post-execution: skew-split joins show
      // "skew=true" AQEShuffleRead partition specs; rank-limited windows
      // show WindowGroupLimit. collect(), NOT count(): count() builds its
      // own QueryExecution around an added aggregate, leaving THIS df's
      // adaptive plan un-executed (isFinalPlan=false, no AQEShuffleRead
      // nodes to inspect).
      val df = q(skew)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val skewHandled = plan.contains("skew=true")
      val wgl = plan.contains("WindowGroupLimit")
      val ratio = ts / math.max(tu, 1e-9)
      println(f"[skewprobe] $name uniform=$tu%.2f s ($nu rows) " +
        f"skewed=$ts%.2f s ($ns rows) ratio=$ratio%.2f " +
        f"aqe_skew_split=$skewHandled window_group_limit=$wgl")
    }
    spark.stop()

    // ---- leg 2: prove the AQE skew-split PATH engages ----
    // At sf1 the hot partition (~90% of 6M lineitem rows) compresses well
    // under Spark's default 256 MiB skew threshold, and the dimension sides
    // broadcast — so leg 1 legitimately shows skew ABSORBED, not split. A
    // 100 TB cluster sees the same skew RATIO against the same default
    // thresholds at 1000× the bytes, where the split is what saves the
    // stage. Emulate that ratio: scale the skew thresholds down to the
    // fixture (16 MiB / advisory 8 MiB) and disable broadcast so the joins
    // are genuine shuffle joins, then assert the final adaptive plan
    // carries skew=true AQEShuffleRead specs and the wall stays bounded.
    val spark2 = graft.GraftSession.localBuilder(32, "graft-skewprobe-split")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      // Without force, OptimizeSkewedJoin skips any join whose output
      // partitioning is reused downstream (splitting would insert a new
      // shuffle) — which is exactly these entries' shape: the agg keys
      // match the join keys, so vanilla Spark PREFERS partial aggregation
      // (map-side combine absorbs the hot key to one row per task) over a
      // skew split. force=true trades the extra shuffle for the split —
      // the knob a 100 TB deployment flips when the post-join work per hot
      // row is heavy enough to dominate the reshuffle.
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      .getOrCreate()
    spark2.sparkContext.setLogLevel("ERROR")
    val joinEntries: Seq[(String, String => DataFrame)] = Seq(
      "join_revenue_by_nation" -> (d => Queries.joinRevenueByNation(spark2, d)),
      "left_join_agg" -> (d => Queries.leftJoinAgg(spark2, d)))
    for ((name, q) <- joinEntries) {
      val (tu, _) = median3(q(base).count())
      val (ts, _) = median3(q(skew).count())
      val df = q(skew)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val split = plan.contains("skew=true")
      println(f"[skewprobe] SPLIT-LEG $name uniform=$tu%.2f s skewed=$ts%.2f s " +
        f"ratio=${ts / math.max(tu, 1e-9)}%.2f aqe_skew_split=$split")
      plan.linesIterator.filter(_.contains("AQEShuffleRead"))
        .take(4).foreach(l => println("[skewprobe]   " + l.trim))
    }
    spark2.stop()
  }
}
