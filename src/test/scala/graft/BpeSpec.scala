package graft

import graft.operators.CorpusOps

/** BPE merge induction: the Sennrich et al. '16 example corpus
  * hand-computed through 8 merges (with end-of-word markers), greedy
  * left-to-right pairing, early stop, and determinism. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def merges(docs: Seq[String], n: Int) =
    CorpusOps.bpeMerges(docs.toDF("text"), "text", numMerges = n)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)

  test("Sennrich example: first 8 merges, counts and tie order exact") {
    // low x5, lower x2, newest x6, widest x3 — the ACL'16 running example
    val corpus = Seq(
      (("low " * 5) + ("lower " * 2)).trim,
      (("newest " * 6) + ("widest " * 3)).trim)
    val got = merges(corpus, 8)
    assert(got === Seq(
      (1L, "e", "s", 9L),          // es/st/t</w> tie at 9 -> 'e s' first
      (2L, "es", "t", 9L),
      (3L, "est", "</w>", 9L),
      (4L, "l", "o", 7L),          // lo/ow tie at 7 -> 'l o' first
      (5L, "lo", "w", 7L),
      (6L, "e", "w", 6L),          // ew/ne/w-est tie at 6 -> 'e w' first
      (7L, "ew", "est</w>", 6L),
      (8L, "n", "ewest</w>", 6L)))
  }

  test("greedy left-to-right pairing: 'a a a' pairs once, not twice") {
    val got = merges(Seq("aaa aaa"), 1)
    // two 'aaa' words: 2 adjacent (a,a) positions x freq 2 = 4; the merge
    // must then rewrite ' a a a ' as ' aa a ' (non-overlapping greedy)
    assert(got === Seq((1L, "a", "a", 4L)))
    val two = merges(Seq("aaa aaa"), 2)
    // after ' aa a </w> ': pairs are 'a </w>' and 'aa a' -> 'a </w>' wins
    // the tie at 2 by string order (space sorts before 'a')
    assert(two(1) === ((2L, "a", "</w>", 2L)))
  }

  test("early stop: vocabulary runs out of pairs before numMerges") {
    val got = merges(Seq("ab"), 10)
    assert(got === Seq(
      (1L, "a", "b", 1L),
      (2L, "ab", "</w>", 1L)))
  }

  test("encode under the Sennrich merges: classic segmentations") {
    val corpus = Seq(
      (("low " * 5) + ("lower " * 2)).trim,
      (("newest " * 6) + ("widest " * 3)).trim)
    val learned = merges(corpus, 8).map(m => (m._2, m._3)).toSeq
    // 'lowest' -> low + est</w> (2); 'newest' -> newest</w> (1);
    // 'low' -> low + </w>? no: ' low </w> ' stays 2 symbols (low, </w>)
    // since (low,</w>) was never merged; unseen chars stay singletons
    val docs = Seq((1L, "lowest newest"), (2L, "low"), (3L, "xyz"),
      (4L, "")).toDF("doc_id", "text")
    val got = CorpusOps.bpeEncode(docs, "doc_id", "text", learned)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 3L, // low + est</w> (2) ++ newest</w> (1)
      2L -> 2L, // low + </w>
      3L -> 4L, // x y z </w> untouched
      4L -> 0L))
  }

  test("encode with empty merge list = character count + end marker") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val got = CorpusOps.bpeEncode(docs, "doc_id", "text", Seq.empty)
      .collect().head.getLong(1)
    assert(got === 6L) // (a b </w>) + (c d </w>)
  }

  test("deterministic across runs and layouts") {
    val corpus = (1 to 50).map(i => s"tok${i % 7} tok${i % 3} shared words")
    val a = merges(corpus, 6)
    val b = merges(corpus.reverse, 6)
    assert(a === b && a.length === 6)
  }

  test("fixpoint replace: consecutive occurrences all merge ('abab' case)") {
    // a single left-to-right replace pass of ' a b ' shares the boundary
    // space between consecutive occurrences, turning 'abab' into
    // [ab, a, b] instead of BPE's merge-everywhere [ab, ab]; the double
    // pass must reach the fixpoint
    val got = merges(Seq("abab abab abab"), 2)
    // per word: pairs (a,b) x2, (b,a) x1, (b,</w>) x1 -> (a,b) = 6 wins
    assert(got(0) === ((1L, "a", "b", 6L)))
    // ' a b a b </w> ' -> ' ab ab </w> ': merge 2 sees (ab,ab) x3 and
    // (ab,</w>) x3; 'ab </w>' < 'ab ab' by string order ('<' < 'a')
    assert(got(1) === ((2L, "ab", "</w>", 3L)))
    // encode under [(a,b)]: abab -> [ab, ab, </w>] = 3 symbols
    val enc = CorpusOps.bpeEncode(
        Seq((1L, "abab"), (2L, "ababab")).toDF("doc_id", "text"),
        "doc_id", "text", Seq(("a", "b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enc === Map(1L -> 3L, 2L -> 4L))
  }

  test("tokenFertility: per-language volumes and ratios hand-computed") {
    import org.apache.spark.sql.functions.col
    // no merges: every word encodes to chars + </w> marker, so
    // bpe_tokens(doc) = chars(doc) + words(doc) exactly
    val docs = Seq(
      (1L, "en", "ab cde"),   // words 2, chars 5, tokens 7
      (2L, "en", "a"),        // words 1, chars 1, tokens 2
      (3L, "fr", ""),         // token-free doc
      (4L, "fr", "xyz")       // words 1, chars 3, tokens 4
    ).toDF("doc_id", "lang", "text")
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = CorpusOps.tokenFertility(docs, "doc_id", "text", "lang",
        Seq.empty)
      .orderBy(col("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq === Seq(
      ("en", 2L, 3L, 6L, 9L, r6(9.0 / 3), r6(6.0 / 9)),
      ("fr", 2L, 1L, 3L, 4L, r6(4.0 / 1), r6(3.0 / 4))))
  }
}
