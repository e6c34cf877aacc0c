package graft.demo
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.PipelineQueries

object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = PipelineQueries.docsWithPlants(spark, dir)
    val withSig = docs.select(col("doc_id").as("id"),
        array_distinct(Dedup.charNgrams(col("text"), 3)).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 32)).cache()
    time("materialize signatures")(println("docs=" + withSig.count()))
    val exploded = withSig.select(col("id"),
        explode(Dedup.bandKeys(col("sig"), 4, 8)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = exploded.alias("a"); val b = exploded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct().cache()
    time("candidates")(println("cands=" + candidates.count()))
    val result = time("full ngram pairs")(
      PipelineQueries.dedupNgram(spark, dir).count())
    println("result pairs=" + result)
    // bucket size distribution
    exploded.groupBy("band","bkey").count().agg(max("count"),avg("count"),count(lit(1))).show()
    spark.stop()
  }
}
