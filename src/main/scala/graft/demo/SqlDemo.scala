package graft.demo

import org.apache.spark.sql.SparkSession

/** Drives the SQL-function surface: custom expressions via spark.sql on a
  * session built with GraftExtensions, over real testdata. */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
    spark.sql(
      """SELECT d1.doc_id AS a, d2.doc_id AS b,
        |  sorted_intersect_count(word_shingle_set(d1.text), word_shingle_set(d2.text)) AS shared,
        |  fingerprint64(d1.text) AS fp
        |FROM documents d1 JOIN documents d2 ON d1.doc_id = d2.doc_id - 50
        |WHERE d1.doc_id < 3
        |ORDER BY a""".stripMargin).show(false)
    spark.sql("SELECT simhash64(array('alpha','beta')) AS sh").show(false)
    spark.stop()
  }
}
