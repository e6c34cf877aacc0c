package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.deltalog.DeltaFixtureWriter

/** Builders mirroring the reference's pytest fixtures
  * (test/test_delta_analyzer_metrics.py:9-31, FIXTURES.md §1): tips-shaped
  * seeded data, partitioned by (day, time), then mutated. */
object TestFixtures {

  /** tips-shaped frame: index-paired day/time lists like the reference's
    * `['Mon']*80 + ['Tue']*10 + ...` construction. */
  def tips(spark: SparkSession, days: Seq[(String, Int)], times: Seq[(String, Int)]): DataFrame = {
    import spark.implicits._
    val dayList = days.flatMap { case (d, n) => Seq.fill(n)(d) }
    val timeList = times.flatMap { case (t, n) => Seq.fill(n)(t) }
    require(dayList.size == timeList.size)
    val n = dayList.size
    dayList.zip(timeList).zipWithIndex.map { case ((d, t), i) =>
      val bill = 10.0 + (i * 37 % 400) / 10.0   // deterministic uniform(10,50)
      val tip = 1.0 + (i * 13 % 90) / 10.0      // deterministic uniform(1,10)
      (bill, tip, d, t, i % 4 + 1)
    }.toDF("total_bill", "tip", "day", "time", "size")
  }

  /** Primary skewed fixture: day Mon80/Tue10/Wed10, time Dinner80/Lunch20;
    * overwrite + 3 sampled appends + predicate delete + compact
    * (test_delta_analyzer_metrics.py:23-29). */
  def buildSkewedTable(spark: SparkSession, path: String): Unit = {
    val df = tips(spark,
      Seq("Mon" -> 80, "Tue" -> 10, "Wed" -> 10),
      Seq("Dinner" -> 80, "Lunch" -> 20))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    (1 to 3).foreach { s =>
      val sample = df.orderBy(abs(hash(col("total_bill") * s))).limit(10)
      DeltaFixtureWriter.write(sample, path, "append", Seq("day", "time"))
    }
    DeltaFixtureWriter.delete(spark, path, "total_bill > 40")
    DeltaFixtureWriter.compact(spark, path)
  }

  /** Balanced fixture: 120 rows, Mon60/Tue60 × Dinner/Lunch 30/30 each
    * (test_delta_analyzer_metrics.py:43-61). */
  def buildBalancedTable(spark: SparkSession, path: String): Unit = {
    val df = tips(spark,
      Seq("Mon" -> 30, "Mon" -> 30, "Tue" -> 30, "Tue" -> 30),
      Seq("Dinner" -> 30, "Lunch" -> 30, "Dinner" -> 30, "Lunch" -> 30))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
  }

  /** Orphan-pressure fixture: balanced 50/50 base + 10 sampled appends +
    * delete + compact (test_delta_analyzer_metrics.py:84-108). */
  def buildOrphanTable(spark: SparkSession, path: String): Unit = {
    val df = tips(spark,
      Seq("Mon" -> 50, "Tue" -> 50),
      Seq("Dinner" -> 50, "Lunch" -> 50))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    (1 to 10).foreach { s =>
      val sample = df.orderBy(abs(hash(col("total_bill") * s))).limit(10)
      DeltaFixtureWriter.write(sample, path, "append", Seq("day", "time"))
    }
    DeltaFixtureWriter.delete(spark, path, "total_bill > 40")
    DeltaFixtureWriter.compact(spark, path)
  }
}
