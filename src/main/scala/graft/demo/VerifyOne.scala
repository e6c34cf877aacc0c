package graft.demo

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Filtered [[graft.Verify]]: dump only the named contract entries (comma
  * list in args(2)) plus their oracle SQL, for targeted
  * `tools/oracle_check.py` runs while iterating on a single operator.
  * Usage: runMain graft.demo.VerifyOne <sfDir> <outDir> <name,name,...> */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val want = names.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val unknown = want -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown entries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.localBuilder(cpus.toInt, "graft-verify-one")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => want(kv._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => want(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
