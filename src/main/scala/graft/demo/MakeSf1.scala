package graft.demo

import org.apache.spark.sql.functions._

/** Materialize a ≈sf1 test dir (10× sf0.1) for full-contract bench runs:
  * each table unioned 10× with CONSISTENT key shifts (copy i shifts every
  * join key by i·10^8, so referential integrity — orders↔lineitem↔part↔
  * supplier, customer↔orders — survives and join/agg cardinalities scale
  * honestly). nation/region stay as-is (dimensions). Usage:
  * `runMain graft.demo.MakeSf1 [outDir]` (default /tmp/graft_sf1). */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.GraftSession.localBuilder(32, "graft-makesf1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val S = 100000000L
    // documents/embeddings shift by 1e5, NOT 1e8: the pipeline queries'
    // planted-fixture convention parks synthetic benchmark/near-dup ids at
    // +PlantShift (1e6), and a copy shifted past it would masquerade as a
    // 45k-doc "benchmark" (measured: it flips decontamination_auto to the
    // exact branch and blows the dedup_ngram slice past its row budget).
    // Base doc_id/vec_id max out at 4999/1999, so 1e5 keeps all ten copies
    // distinct and below 1e6.
    val shifts: Map[String, (Long, Seq[String])] = Map(
      "customer" -> (S, Seq("c_custkey")),
      "supplier" -> (S, Seq("s_suppkey")),
      "part" -> (S, Seq("p_partkey")),
      "orders" -> (S, Seq("o_orderkey", "o_custkey")),
      "lineitem" -> (S, Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> (S, Seq("event_id", "user_id")),
      "documents" -> (100000L, Seq("doc_id")),
      "embeddings" -> (100000L, Seq("vec_id")))
    for ((t, (step, keys)) <- shifts) {
      val base = spark.read.parquet(s"$dir/$t.parquet")
      val x10 = (0 until 10).map { i =>
        keys.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(i.toLong * step)))
      }.reduce(_ unionByName _)
      x10.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"$t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    for (t <- Seq("region", "nation")) {
      spark.read.parquet(s"$dir/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"$t: copied")
    }
    spark.stop()
  }
}
