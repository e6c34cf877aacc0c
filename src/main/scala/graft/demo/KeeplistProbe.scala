package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.PipelineQueries

/** Timing breakdown of the dedup_keeplist contract query: signature+pairs
  * cost vs connected-components loop cost (round count is logged by
  * Dedup.clusters itself). */
object KeeplistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("keeplist-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = PipelineQueries.docsWithPlants(spark, dir).cache()
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val pairs = time("minhashPairs (materialized)") {
        val p = Dedup.minhashPairs(docs, "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.7).cache()
        p.count(); p
      }
      println(s"pairs = ${pairs.count()}")
      time("clusters loop") {
        Dedup.clusters(docs.select(col("doc_id").as("id")), pairs).count()
      }
      time("full keepList (fresh pairs)") {
        val p2 = Dedup.minhashPairs(docs, "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.7)
        Dedup.keepList(docs, "doc_id", p2).count()
      }
      pairs.unpersist()
      Dedup.unpersistAll()
    }

    // --- 500k-doc crossover probe: BOTH clustering paths on the same
    // real LSH edge set; labels must be identical (the driver union-find /
    // distributed-loop switch at Dedup.clusters:driverEdgeLimit must be
    // invisible to callers). 100x replication multiplies the near-dup
    // structure too: each doc's 100 copies are mutual exact-dups, so the
    // edge set (~25M) genuinely EXCEEDS the 5M default crossover — the
    // default run takes the distributed loop, and the driver path is forced
    // with a raised limit (run with SPARK_DRIVER_MEM=16g for the 25M-edge
    // collect).
    println("--- 500k-doc crossover ---")
    val big = (0 until 100).map(i => docs.withColumn("doc_id",
        col("doc_id") + lit(i.toLong * 100000000L)))
      .reduce(_ unionByName _).cache()
    println(s"big corpus: ${big.count()} docs")
    val pairsBig = time("minhashPairs over 500k docs") {
      val p = Dedup.minhashPairs(big, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.7).cache()
      p.count(); p
    }
    println(s"edges = ${pairsBig.count()}")
    val ids = big.select(col("doc_id").as("id"))
    val viaLoop = time("clusters: distributed loop (default path at this edge count)") {
      val c = Dedup.clusters(ids, pairsBig).cache(); c.count(); c
    }
    val viaDriver = time("clusters: driver union-find (forced, limit=50M)") {
      val c = Dedup.clusters(ids, pairsBig, driverEdgeLimit = 50000000L).cache()
      c.count(); c
    }
    val mismatches = viaDriver
      .join(viaLoop.withColumnRenamed("cluster_id", "cluster_id2"), "id")
      .where(col("cluster_id") =!= col("cluster_id2")).count()
    val sizeDelta = math.abs(viaDriver.count() - viaLoop.count())
    println(s"label mismatches: $mismatches, row-count delta: $sizeDelta " +
      (if (mismatches == 0 && sizeDelta == 0) "(paths IDENTICAL)" else "(BUG)"))
    spark.stop()
  }
}
