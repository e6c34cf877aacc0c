package graft.demo

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Does AQE reuse the tf exchange across bm25TopK's four consumers
  * (scored/dl/dfreq/stats all derive from the same (doc,term) aggregate)?
  * The static plan shows 4 duplicated scan→explode→agg subtrees; exchange
  * reuse under AQE is runtime-only, so this measures: one tf pass alone vs
  * the full query. full ≈ tf + ε ⇒ reuse fires, nothing to fix; full ≈
  * k × tf ⇒ the explode runs k times and caching tf is worth it.
  *
  * MEASURED NEGATIVE (r18, sf0.1 local[32]): full 1.88 s vs tf 0.64 s
  * looked like 3 explodes, but a like-for-like bench A/B of
  * `Dedup.track(tf.persist())` made bm25_search WORSE — 1.48 → 2.26 s at
  * equal calibration (and tfidf_topterms flat, 1.18 → 1.18) — i.e. AQE
  * exchange reuse IS deduping the tf exchange at runtime (the static-plan
  * duplication is cosmetic), the probe's full-vs-tf gap is the genuinely
  * sequential downstream stages, and the persist only adds an in-memory
  * materialization + cache-scan tax. bm25TopK/tfIdfTopTerms stay
  * UNCACHED; do not re-apply without re-measuring. */
object BmProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.localBuilder(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "bm-prof")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def med(label: String)(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"  $label%-30s ${ts(1)}%6.2f s"); ts(1)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val qs = Seq(
      (1L, "spark window merge"), (2L, "fast hash join table"),
      (3L, "stream batch query data"), (4L, "vector column filter"))
      .toDF("qid", "qtext")
    val terms = docs.select(col("doc_id").cast("long").as("doc_id"),
      explode(TextFunctions.tokens(TextFunctions.normalized(col("text"))))
        .as("__t"))
    val tf = terms.groupBy(col("doc_id"), col("__t"))
      .agg(count(lit(1)).as("__tf"))
    med("tf pass alone (noop)")(
      tf.write.format("noop").mode("overwrite").save())
    med("full bm25TopK (noop)")(
      graft.operators.Search.bm25TopK(docs, qs, "doc_id", "text",
          "qid", "qtext", k = 10)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
