package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{QualityKernel, TextFunctions}

/** Parity tests for the fused single-pass quality-score kernel
  * ([[QualityKernel]], r18) against the independent relational composition
  * ([[TextFunctions.qualityScoreRelational]]) — the two share no code, so
  * exact agreement value-checks the tokenizer byte semantics, the punct
  * class, the stopword membership (ASCII fast path AND the non-ASCII
  * lowercase fallback), and the double arithmetic association order +
  * HALF_UP round(6) at once. Bit-exact equality demanded (===, no
  * tolerance): the kernel replays the same IEEE operations in the same
  * order. */
class QualityKernelSpec extends SparkSuite {
  import spark.implicits._

  private def bothWays(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
    val got = df.select(TextFunctions.qualityScore(col("text")))
      .as[Double].collect()
    val ref = df.select(TextFunctions.qualityScoreRelational(col("text")))
      .as[Double].collect()
    got.zip(ref).zip(texts).foreach { case ((g, r), t) =>
      assert(g === r, s"kernel != relational for text=${t.take(80)}")
    }
  }

  test("kernel == relational on real corpus documents (sf0.001, all)") {
    val texts = table("documents").select("text").as[String].collect().toSeq
    assert(texts.nonEmpty)
    bothWays(texts)
  }

  test("kernel == relational on edge shapes") {
    bothWays(Seq(
      "", // empty: punct guard arm
      "   \t\n ", // whitespace-only: 0 tokens but nonzero length
      "!!! ;;; ??? %%% @@@", // all-punct tokens
      "the and of to in is are", // pure stopwords → stopScore caps at 1.0
      "a", // single 1-char stopword
      "THE AND OF", // uppercase stopwords (lowercase path)
      "The thé thë", // ASCII vs non-ASCII near-stopwords
      "word", // single non-stopword
      "been with from than then this that too", // 4-byte stopwords
      "beens thee anda", // near-misses (prefix/suffix of stopwords)
      "tab\tsep\nnewlinevt\fff\rcr", // every \s class byte
      "héllo wörld çafé naïve Ångström ✓ 数据 本文", // multi-byte tokens
      "İstanbul THE İ i", // Turkish dotted capital: toLowerCase fallback
      "x " * 200, // many short tokens → lenScore caps at 1.0
      ("supercalifragilisticexpialidocious " * 10).trim, // wordLen > 10
      "ab " * 60, // wordLen < 3 boundary
      "abc " * 60, // wordLen == 3 boundary (inclusive)
      "a.b,c;d:e!f?g", // punct interleaved in one token
      "\u0000a \u0000to the x\u0000 \u0000", // NUL-prefixed near-stopwords:
      // the packed-ASCII key seeds at 1 so NUL+"a" ≠ "a" (a leading 0x00
      // byte must not be absorbed by the shift) — these are NOT stopwords
      ("lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 30).trim))
  }

  test("JVM kernel directly: null-free scalar semantics") {
    def k(s: String): Double = QualityKernel.score(UTF8String.fromString(s))
    assert(k("") === 0.25 * 0.0 + 0.2 * 0.5) // empty: only wordLenScore's 0.5
    assert(k("   ") === math.rint((0.2 * 0.5 + 0.25 * 1.0) * 1e6) / 1e6)
    // 50+ tokens of avg len in [3,10] incl. stopwords → all caps reachable
    val good = ("the quick brown fox jumps over the lazy dog and then some " * 8).trim
    assert(k(good) >= 0.9)
  }

  test("kernel is null-propagating in Column space") {
    val rows = Seq[(java.lang.Long, String)]((1L, "text here"), (2L, null))
      .toDF("id", "text")
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
  }
}
