package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.localBuilder(cpus.toInt, "graft-verify")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // builder-side targeted re-verification (the SPARK_GRAFT_BENCH_ONLY
    // convention): comma-separated entry names; unset = full contract.
    // The driver never sets this, so the driver's gate is always full.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must fail loudly, not skip the entry while the run
    // reports success (r12 ADVICE)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_VERIFY_ONLY names no registered query: ${unknown.mkString(",")}")
    }
    val selected = only match {
      case Some(names) =>
        // stale dump dirs from a prior build would otherwise survive in
        // outDir and a later full oracle_check would compare old parquet
        // against the current oracle SQL — refuse the mix by clearing
        // every UNSELECTED query's dump (selected ones are overwritten)
        SparkEntry.queries.keysIterator.filterNot(names).foreach { n =>
          val d = Paths.get(outDir, n)
          if (Files.exists(d)) {
            import scala.jdk.CollectionConverters._
            Files.walk(d).sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala.foreach(Files.delete)
          }
        }
        SparkEntry.queries.filter(p => names(p._1))
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
