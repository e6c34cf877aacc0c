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
    val shifts: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    for ((t, keys) <- shifts) {
      val base = spark.read.parquet(s"$dir/$t.parquet")
      val x10 = (0 until 10).map { i =>
        keys.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(i.toLong * S)))
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
