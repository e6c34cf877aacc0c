package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.MinHashKernel
import graft.operators.Dedup
import graft.queries.PipelineQueries

/** JVM-level rigor tests for the fused MinHash kernels + pipeline edge
  * cases on degenerate documents. */
class MinHashKernelSpec extends SparkSuite {
  import spark.implicits._

  private def sign(text: String, numHashes: Int = 128): Array[Long] = {
    val sh = MinHashKernel.shingleHashes(UTF8String.fromString(text), 3, 0)
    MinHashKernel.minhash(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sh), numHashes)
  }

  private def trueJaccard(a: String, b: String): Double = {
    val sa = MinHashKernel.shingleHashes(UTF8String.fromString(a), 3, 0).toSet
    val sb = MinHashKernel.shingleHashes(UTF8String.fromString(b), 3, 0).toSet
    if (sa.isEmpty && sb.isEmpty) 0.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("minhash estimator tracks true jaccard within sampling error") {
    val words = (0 until 60).map(i => s"w$i")
    // doc pairs with controlled overlap: share the first k words
    Seq(50, 40, 25, 10).foreach { k =>
      val a = (words.take(k) ++ (0 until (55 - k)).map(i => s"a$i")).mkString(" ")
      val b = (words.take(k) ++ (0 until (55 - k)).map(i => s"b$i")).mkString(" ")
      val sigA = sign(a); val sigB = sign(b)
      val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / sigA.length
      val truth = trueJaccard(a, b)
      // 128 hashes → stderr = sqrt(J(1-J)/128) <= 0.045; allow 4 sigma
      assert(math.abs(est - truth) < 0.18,
        s"k=$k: est=$est truth=$truth")
    }
  }

  test("kernel edge cases: empty, punct-only, single-token, unicode text") {
    assert(MinHashKernel.shingleHashes(UTF8String.fromString(""), 3, 0).isEmpty)
    assert(MinHashKernel.shingleHashes(UTF8String.fromString("!!! ,,, ..."), 3, 0).isEmpty)
    val single = MinHashKernel.shingleHashes(UTF8String.fromString("hello"), 3, 0)
    assert(single.length === 1, "w-shingles of a short doc degrade to one shingle")
    // multibyte UTF-8 treated as separators (documented ASCII normalization)
    val uni = MinHashKernel.shingleHashes(UTF8String.fromString("héllo wörld abc"), 3, 0)
    assert(uni.nonEmpty)
    // char mode on short strings
    assert(MinHashKernel.shingleHashes(UTF8String.fromString("ab"), 3, 1).length === 1)
    // signature of the empty set is the deterministic placeholder
    val emptySig = MinHashKernel.minhash(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long]), 8)
    assert(emptySig.toSeq === (0L until 8L))
  }

  test("dedup pipelines survive empty and degenerate documents") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, ""),
      (4L, "   "),
      (5L, "!!!"),
      (6L, "single"))
      .toDF("doc_id", "text")
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5).collect()
    assert(mh.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    // empty docs must not pair with each other via placeholder signatures
    assert(!mh.exists(r => r.getLong(0) >= 3L && r.getLong(0) <= 5L &&
      r.getLong(1) >= 3L && r.getLong(1) <= 5L))
    val sh = Dedup.simhashPairs(docs, "doc_id", "text", maxBits = 3).collect()
    assert(sh.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    // ngram banding (4x8) has ~50% detection odds at trigram J~0.8 by
    // design — use a J~0.97 pair (the regime it promises recall for)
    val ngDocs = docs.union(Seq(
      (7L, "the quick brown fox jumps over the lazy dog today yes"),
      (8L, "the quick brown fox jumps over the lazy dog today yet"))
      .toDF("doc_id", "text"))
    val ng = Dedup.ngramJaccardPairs(ngDocs, "doc_id", "text", threshold = 0.5).collect()
    assert(ng.exists(r => r.getLong(0) == 7L && r.getLong(1) == 8L))
  }
}
