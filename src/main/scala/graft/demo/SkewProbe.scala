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
  * but it must degrade, not cliff. Results recorded in BASELINE.md.
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
      "user_sessions" -> (d => Queries.userSessions(spark, d)))
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
      // show WindowGroupLimit
      val df = q(skew)
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      val skewHandled = plan.contains("skew=true")
      val wgl = plan.contains("WindowGroupLimit")
      val ratio = ts / math.max(tu, 1e-9)
      println(f"[skewprobe] $name uniform=$tu%.2f s ($nu rows) " +
        f"skewed=$ts%.2f s ($ns rows) ratio=$ratio%.2f " +
        f"aqe_skew_split=$skewHandled window_group_limit=$wgl")
    }
    spark.stop()
  }
}
