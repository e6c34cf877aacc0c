package graft.demo

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Scale probe for the source-overlap pair (r13): the EXACT matrix's
  * token self-join emits df²/2 pair rows per token — a token present in
  * every group costs G²/2 rows — while the KMV sketch path compares
  * G²·k sketch longs no matter the vocabulary. Synthetic corpus designed
  * to expose exactly that: G = 128 sources, each with 5k distinctive
  * tokens from a 50k pool (avg df ≈ 13, harmless) PLUS 2k COMMON tokens
  * present in every group (each costs 128²/2 ≈ 8.1k join rows in the
  * exact path — 16M pair rows from the common tokens alone). Measures
  * both walls and the sketch's estimate error against the exact matrix. */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder(32, "graft-overlapprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val G = args.headOption.map(_.toInt).getOrElse(128)
    val perGroup = 5000
    val pool = 50000
    val common = args.lift(1).map(_.toInt).getOrElse(2000)
    // one row per (group, doc-chunk): 10 docs per group, each carrying
    // 500 distinctive tokens + 200 common tokens — token identity is the
    // engine's normalized whitespace convention
    val docs = spark.range(G.toLong * 10).map { i =>
      val g = (i / 10).toInt
      val d = (i % 10).toInt
      val distinctive = (0 until perGroup / 10).map { j =>
        // group g draws tokens deterministically from the pool with a
        // group-keyed stride, so group pairs overlap partially
        val t = (g * 131 + d * (perGroup / 10) + j * 7) % pool
        s"t$t"
      }
      val shared = (0 until common / 10).map(j => s"c${d * (common / 10) + j}")
      (s"s$g", (distinctive ++ shared).mkString(" "))
    }.toDF("source", "text").cache()
    println(s"corpus: ${docs.count()} rows, G=$G")

    val t0 = System.nanoTime()
    val exact = CorpusOps.sourceOverlap(docs, "source", "text",
        maxGroups = G)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getDouble(5))).toMap
    val exactSec = (System.nanoTime() - t0) / 1e9
    println(f"exact matrix: ${exact.size} pairs in $exactSec%.1f s " +
      "(vocab x df^2/2 token self-join)")

    val t1 = System.nanoTime()
    val sk = CorpusOps.sourceOverlapSketch(docs, "source", "text",
        k = 4096, maxGroups = G)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getDouble(4))).toMap
    val skSec = (System.nanoTime() - t1) / 1e9
    val errs = exact.keys.toSeq.map(p => math.abs(sk(p) - exact(p)))
    println(f"sketch matrix (k=4096): ${sk.size} pairs in $skSec%.1f s; " +
      f"|J_est - J| mean ${errs.sum / errs.size}%.4f max ${errs.max}%.4f " +
      f"(union ~${perGroup * 2 + common} tokens > k: ESTIMATE regime)")
    require(sk.keySet == exact.keySet, "pair frames must agree")
    require(errs.sum / errs.size < 0.05,
      s"sketch error too large: ${errs.sum / errs.size}")
    println("OverlapProbe OK")
    spark.stop()
  }
}
