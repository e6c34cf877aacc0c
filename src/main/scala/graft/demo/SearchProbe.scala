package graft.demo

import org.apache.spark.sql.functions._

/** BM25 at an adversarial VOCABULARY scale: 1M synthetic docs × 12 unique
  * terms each ⇒ >12M distinct terms — the regime (billions of distinct
  * terms on a real web corpus: URLs, typos, code identifiers) where
  * force-broadcasting the document-frequency table is a driver/executor
  * OOM. After the round-11 fix, `bm25TopK` semi-joins the df table to the
  * distinct query terms BEFORE its broadcast, so the broadcast stays
  * query-set-bounded no matter the vocabulary; this probe proves the
  * whole query completes (and stays fast) with the inflated vocabulary,
  * and sanity-checks ranking: docs sharing the anchor terms rank, the
  * per-doc unique terms only surface for the query that names them.
  *
  * Usage: runMain graft.demo.SearchProbe [nDocs] */
object SearchProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = graft.GraftSession.localBuilder(32, "graft-searchprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // doc i: "shared anchor t{12i} ... t{12i+11}" — 12 unique terms per
    // doc plus 2 corpus-wide ones ⇒ 12·nDocs + 2 distinct terms
    val docs = spark.range(0, nDocs).select(col("id").as("doc_id"),
      concat(lit("shared anchor "),
        array_join(transform(sequence(lit(0L), lit(11L)),
          j => concat(lit("t"), col("id") * 12L + j)), " ")).as("text"))
    val queries = Seq(
      (1L, "shared anchor"),              // hits every doc, ranked by dl
      (2L, "t60 anchor"),                 // t60 is unique to doc 5
      (3L, "absent0 absent1 absent2")     // no posting at all
    ).toDF("qid", "qtext")

    val t0 = System.nanoTime()
    val out = graft.operators.Search.bm25TopK(
      docs, queries, "doc_id", "text", "qid", "qtext", k = 10)
    val rows = out.collect()
    val wall = (System.nanoTime() - t0) / 1e9
    val vocab = docs.select(explode(split(col("text"), " ")).as("t"))
      .agg(count_distinct(col("t"))).collect().head.getLong(0)
    println(f"[searchprobe] vocab=$vocab%d terms, docs=$nDocs%d, " +
      f"bm25 top-10 wall=$wall%.1f s, result_rows=${rows.length}%d")
    val q2top = rows.filter(_.getLong(0) == 2L).minBy(_.getLong(3))
    println(s"[searchprobe] q2 rank1 doc=${q2top.getLong(1)} " +
      s"(expect 5: only doc carrying t60)")
    assert(q2top.getLong(1) == 5L, "unique-term doc must rank first")
    assert(rows.count(_.getLong(0) == 1L) == 10, "anchor query fills top-10")
    assert(!rows.exists(_.getLong(0) == 3L), "absent terms retrieve nothing")
    // the plan proof: the only broadcast feeding the scoring join chain is
    // the LeftSemi-reduced df table (query-set-bounded), never the raw
    // vocabulary-sized aggregate
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "df table must be semi-joined to query terms")
    println("[searchprobe] PASS: query-set-bounded broadcast, " +
      "10M+-term vocabulary completes")
    spark.stop()
  }
}
