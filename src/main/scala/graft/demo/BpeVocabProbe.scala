package graft.demo

import org.apache.spark.sql.functions._

/** BPE induction + encode at a REALISTIC vocabulary: the test corpus has
  * ~40 distinct words, so `bpe_encode`'s "cost scales with vocabulary,
  * never corpus" claim was untested where it matters. This probe draws a
  * ~600k-token corpus whose tokens follow a Zipf(1) rank distribution
  * over a 60k-word id space (rank = ⌊exp(u·ln N)⌋ for a per-position
  * xxhash uniform u — log-uniform ranks ⇒ freq(r) ∝ 1/r), spread over 6k
  * documents of 100 tokens, so every frequent word occurs in many docs —
  * the shape a crawl corpus has. It runs 64 merge inductions, measures
  * per-merge cost, encodes the corpus under the learned merges, and
  * records the production discipline: induction on a
  * [[graft.operators.Sampling.hashSample]] of the corpus (merge quality
  * converges long before corpus-scale counts matter), with the sampled
  * merge list agreeing on the head ranks at a fraction of the cost.
  *
  * Usage: runMain graft.demo.BpeVocabProbe [nWords] [nMerges] */
object BpeVocabProbe {
  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toInt).getOrElse(60000)
    val nMerges = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = graft.GraftSession.localBuilder(32, "graft-bpevocabprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // token j of doc d: uniform u from xxhash64(d·100+j) → log-uniform
    // Zipf rank; the resulting text mixes head and tail words in every doc
    val nDocs = 6000L
    def u(seed: org.apache.spark.sql.Column) =
      (pmod(xxhash64(seed), lit(1000000L)).cast("double") + 0.5) / 1000000.0
    val docs = spark.range(0, nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0L), lit(99L)),
        j => concat(lit("w"),
          floor(exp(u(col("id") * 100L + j) * math.log(nWords.toDouble)))
            .cast("long")))).as("text"))
      .cache()
    val nToks = docs.select(sum(size(split(col("text"), " ")))).collect()
      .head.getLong(0)
    val distinct = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(count_distinct(col("w"))).collect().head.getLong(0)
    println(s"[bpevocabprobe] vocab=$distinct distinct words " +
      s"(rank space $nWords), $nToks token occurrences, $nDocs docs")

    val t0 = System.nanoTime()
    val merges = graft.operators.CorpusOps.bpeMerges(
      docs, "text", numMerges = nMerges)
    val learned = merges.collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val wInduce = (System.nanoTime() - t0) / 1e9
    println(f"[bpevocabprobe] full induction: ${learned.size} merges in " +
      f"$wInduce%.1f s (${wInduce / learned.size}%.2f s/merge)")

    val t1 = System.nanoTime()
    val enc = graft.operators.CorpusOps.bpeEncode(
      docs, "doc_id", "text", learned)
    val total = enc.agg(sum(col("bpe_tokens"))).collect().head.getLong(0)
    val wEnc = (System.nanoTime() - t1) / 1e9
    println(f"[bpevocabprobe] encode under ${learned.size} merges: " +
      f"$total tokens in $wEnc%.1f s (replace chain runs once per DISTINCT " +
      "word)")

    // production path: induce on a 10% hash sample of the corpus
    val t2 = System.nanoTime()
    val sampled = graft.operators.Sampling.hashSample(docs, "doc_id", 0.1)
    val sMerges = graft.operators.CorpusOps.bpeMerges(
        sampled, "text", numMerges = nMerges)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val wSample = (System.nanoTime() - t2) / 1e9
    val headAgree = learned.take(16).zip(sMerges.take(16))
      .count { case (a, b) => a == b }
    println(f"[bpevocabprobe] 10%% hash-sample induction: $wSample%.1f s, " +
      f"head-16 merge agreement $headAgree/16")
    spark.stop()
  }
}
