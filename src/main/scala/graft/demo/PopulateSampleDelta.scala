package graft.demo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DeltaAnalyzer
import graft.deltalog.DeltaFixtureWriter

/** Mirror of the reference's demos/populate_sample_delta.py: builds the
  * simple / skewed / complex sample tables (same shapes and mutation
  * sequences, FIXTURES.md §2) and prints version/record counts + the
  * analysis summary for each. Run:
  * `sbt "runMain graft.demo.PopulateSampleDelta [baseDir]"`. */
object PopulateSampleDelta {

  private def sample(spark: SparkSession, n: Int, dayWeights: Seq[(String, Int)],
                     valueShift: Double = 0.0): DataFrame = {
    import spark.implicits._
    val days = dayWeights.flatMap { case (d, k) => Seq.fill(k)(d) }
    require(days.size == n,
      s"dayWeights sum to ${days.size}, expected $n")
    days.zipWithIndex.map { case (d, i) =>
      // deterministic stand-in for normal(100,30): range [10,190] so the
      // demo's `value > 150` / `value < 50` deletes match ~22% / ~22% of
      // rows, like the reference's distribution tails do
      val value = 10.0 + ((i * 37) % 181) + valueShift
      (i.toLong, value, d, s"cat${i % 4}",
        (System.currentTimeMillis() / 1000 - i * 86400L).toDouble)
    }.toDF("id", "value", "day", "category", "timestamp")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_samples").toString)

    // simple_delta: balanced 200x5, +500 balanced append
    val simple = s"$base/simple_delta"
    DeltaFixtureWriter.write(
      sample(spark, 1000, Seq("Mon" -> 200, "Tue" -> 200, "Wed" -> 200, "Thu" -> 200, "Fri" -> 200)),
      simple, "overwrite", Seq("day"))
    DeltaFixtureWriter.write(
      sample(spark, 500, Seq("Mon" -> 100, "Tue" -> 100, "Wed" -> 100, "Thu" -> 100, "Fri" -> 100)),
      simple, "append", Seq("day"))

    // skewed_delta: Mon-heavy + 3 increasingly Mon-heavy appends
    val skewed = s"$base/skewed_delta"
    DeltaFixtureWriter.write(
      sample(spark, 1000, Seq("Mon" -> 600, "Tue" -> 200, "Wed" -> 100, "Thu" -> 50, "Fri" -> 50)),
      skewed, "overwrite", Seq("day"))
    Seq(350, 400, 450).foreach { monN =>
      DeltaFixtureWriter.write(
        sample(spark, 500, Seq("Mon" -> monN, "Tue" -> (500 - monN))),
        skewed, "append", Seq("day"))
    }

    // complex_delta: appends + deletes + compact + 10 tiny appends
    val complex = s"$base/complex_delta"
    DeltaFixtureWriter.write(
      sample(spark, 1000, Seq("Mon" -> 600, "Tue" -> 200, "Wed" -> 100, "Thu" -> 50, "Fri" -> 50)),
      complex, "overwrite", Seq("day"))
    DeltaFixtureWriter.write(sample(spark, 300, Seq("Mon" -> 200, "Tue" -> 100)),
      complex, "append", Seq("day"))
    DeltaFixtureWriter.write(sample(spark, 200, Seq("Wed" -> 200)),
      complex, "append", Seq("day"))
    DeltaFixtureWriter.delete(spark, complex, "value > 150")
    DeltaFixtureWriter.write(sample(spark, 200, Seq("Thu" -> 200), valueShift = 20),
      complex, "append", Seq("day"))
    DeltaFixtureWriter.compact(spark, complex)
    DeltaFixtureWriter.write(sample(spark, 200, Seq("Fri" -> 200)),
      complex, "append", Seq("day"))
    DeltaFixtureWriter.delete(spark, complex, "value < 50")
    (1 to 10).foreach { i =>
      DeltaFixtureWriter.write(sample(spark, 1, Seq("Mon" -> 1), valueShift = i),
        complex, "append", Seq("day"))
    }

    Seq("simple_delta" -> simple, "skewed_delta" -> skewed,
        "complex_delta" -> complex).foreach { case (name, path) =>
      val m = DeltaAnalyzer.analyze(spark, path)
      println(s"=== $name (version_count=${m.versionCount}, records=${m.recordCount}) ===")
      println(DeltaAnalyzer.summary(m))
    }
    spark.stop()
  }
}
