package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Non-Delta sources the reference exercises (SURVEY.md §2.1). */
object Sources {

  /** S7: CSV with header + schema inference (notebooks/example.ipynb cell 0
    * loads seaborn tips.csv this way). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** Plain-parquet table directory (testdata layout). */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
