package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Boilerplate-span detection/removal: winnow-position kernel parity
  * against an independent brute-force reference, planted-block interval
  * bounds from the winnowing guarantee, and strip round-trip. */
class BoilerplateSpec extends SparkSuite {
  import spark.implicits._

  /** Independent reference for WinnowKernel.winnowPos: per window of w
    * consecutive k-char shingles, the (md5-hex, position) minimum ordered
    * by hex then position (earliest tie-break), distinct by position.
    * Different formulation on purpose: string-level hex compare + explicit
    * per-window scan vs the kernel's raw-digest monotonic deque. */
  private def refWinnowPos(s: String, k: Int, w: Int): Set[(String, Int)] = {
    val cps = s.codePoints().toArray
    val m = cps.length - (k - 1)
    if (m <= 0) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = (0 until m).map { i =>
      val sh = new String(cps, i, k)
      md.reset()
      md.digest(sh.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val win = math.min(m, w)
    (0 to m - win).map { j =>
      val best = (j until j + win).minBy(i => (hashes(i), i))
      (hashes(best), best + 1)
    }.toSet
  }

  test("winnowPositions kernel equals the brute-force reference") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",            // all-equal hashes: tie-break path
      "abcdefgh",                         // exactly one shingle (m=1 < w)
      "abcdefghij",                       // 0 < m < w whole-text window
      "short",                            // m <= 0: no fingerprints
      "",                                 // empty
      "naïve café — über señor ångström", // multi-byte code points
      "abcabcabcabcabcabcabcabcabc")      // periodic: repeated minima
    val k = 8; val w = 4
    val got = texts.toDF("text")
      .select(col("text"),
        graft.functions.minhashExprs.winnowPositions(col("text"), k, w).as("p"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getString(0), x.getInt(1))).toSet)
      .toMap
    texts.foreach { t =>
      assert(got(t) === refWinnowPos(t, k, w), s"mismatch for: '$t'")
    }
  }

  test("winnowPositions fingerprint set equals winnowFingerprints") {
    // the two kernels must select the same minima — positions are extra
    // information, never a different selection
    val docs = table("documents").where(col("doc_id") < 100)
    val viaPos = docs.select(col("doc_id"),
        explode(graft.functions.minhashExprs.winnowPositions(col("text"), 8, 4)).as("s"))
      .select(col("doc_id"), col("s.fp").as("fp")).distinct()
    val viaFp = docs.select(col("doc_id"),
        explode(graft.functions.minhashExprs.winnowFingerprints(col("text"), 8, 4)).as("fp"))
    assert(viaPos.exceptAll(viaFp).isEmpty && viaFp.exceptAll(viaPos).isEmpty)
  }

  // 50 docs: unique 32-char prefix + shared 60-char block + unique 32-char
  // suffix. The prefix's LAST char and the suffix's FIRST char are unique
  // PER DOC (chars 'A'+i, outside the hex alphabet's collision range at a
  // fixed position), so every block-boundary-straddling shingle contains a
  // doc-unique char and only shingles WHOLLY inside the block can be
  // cross-doc shared — at ANY df threshold, including the dedup df>=2.
  // Block occupies positions 33..92 (1-based).
  private val Block = "SHARED-BOILERPLATE-LICENSE-HEADER-EXACTLY-SIXTY-CHARS-LONG!!"
  private def plantedDocs = {
    require(Block.length == 60)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hx(seed: String) = {
      md.reset()
      md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def uniq(i: Int) = ('A' + i).toChar.toString
    (0 until 50).map(i => (i.toLong,
        hx(s"pre$i").substring(0, 31) + uniq(i) + Block +
          uniq(i) + hx(s"suf$i").substring(0, 31)))
      .toDF("doc_id", "text")
  }

  test("boilerplateSpans: planted shared block yields one tight interval per doc") {
    val spans = Dedup.boilerplateSpans(plantedDocs, "doc_id", "text",
        k = 8, w = 4, minDocs = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.length === 50, "exactly one merged interval per doc")
    assert(spans.map(_._1).toSet === (0L until 50L).toSet)
    spans.foreach { case (id, start, end) =>
      // winnowing guarantee: first fully-interior window (shingles at
      // 33..36) selects a position in [33,36]; last (82..85) one >= 82.
      // No shared fp can sit outside the block (unique hex elsewhere).
      assert(start >= 33 && start <= 36, s"doc $id span_start=$start")
      assert(end >= 90 && end <= 93, s"doc $id span_end=$end")
    }
    Dedup.unpersistAll()
  }

  test("stripBoilerplate removes the block core and keeps unique text") {
    val docs = plantedDocs
    val before = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Dedup.stripBoilerplate(docs, "doc_id", "text",
        k = 8, w = 4, minDocs = 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.keySet === before.keySet)
    after.foreach { case (id, txt) =>
      val orig = before(id)
      val prefix = orig.substring(0, 32)
      val suffix = orig.substring(92)
      assert(txt.startsWith(prefix), s"doc $id lost its unique prefix")
      assert(txt.endsWith(suffix), s"doc $id lost its unique suffix")
      // the block interior (always inside the detected span) is gone
      assert(!txt.contains(Block.substring(4, 56)), s"doc $id kept the block")
      // only block chars were cut: length shrinks by span length in [54,60]
      val cut = orig.length - txt.length
      assert(cut >= 54 && cut <= 60, s"doc $id cut=$cut chars")
    }
    Dedup.unpersistAll()
  }

  test("stripBoilerplate passes unshared docs through unchanged") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hx(seed: String) = {
      md.reset()
      md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // all-unique corpus: no fp reaches minDocs=2, so no doc changes
    val docs = (0 until 20).map(i => (i.toLong, hx(s"a$i") + hx(s"b$i")))
      .toDF("doc_id", "text")
    val before = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Dedup.stripBoilerplate(docs, "doc_id", "text",
        k = 8, w = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === before)
    Dedup.unpersistAll()
  }

  test("boilerplateSpans degenerate inputs: empty/short texts yield no spans") {
    val docs = Seq((1L, ""), (2L, "tiny"), (3L, "exactly8"), (4L, "exactly8"))
      .toDF("doc_id", "text")
    // docs 3/4 share their single whole-text shingle -> one k-wide span each
    val spans = Dedup.boilerplateSpans(docs, "doc_id", "text",
        k = 8, w = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((3L, 1L, 9L), (4L, 1L, 9L)))
    Dedup.unpersistAll()
  }

  test("boilerplateSpans rejects k < w") {
    intercept[IllegalArgumentException] {
      Dedup.boilerplateSpans(plantedDocs, "doc_id", "text", k = 3, w = 4)
    }
  }

  test("duplicateSpans: keeper doc retains the planted block, others lose it") {
    // every fp the keeper doc selects has keeper = min(docs) = 0, so doc 0
    // can NEVER carry a span; docs 1..49 each get one merged interval over
    // the block core (interior winnow selections are doc-independent and
    // <= w apart, so the island is single and tight)
    val spans = Dedup.duplicateSpans(plantedDocs, "doc_id", "text",
        k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!spans.exists(_._1 == 0L), "keeper doc 0 must keep its copy")
    assert(spans.length === 49, "exactly one interval per non-keeper doc")
    assert(spans.map(_._1).toSet === (1L until 50L).toSet)
    spans.foreach { case (id, start, end) =>
      assert(start >= 33 && start <= 36, s"doc $id span_start=$start")
      assert(end >= 90 && end <= 93, s"doc $id span_end=$end")
    }
    Dedup.unpersistAll()
  }

  test("duplicateSpans keeper rule is per-fingerprint greedy") {
    // run X shared by docs {1,2} (keeper 1), run Y by docs {2,3}
    // (keeper 2): doc 1 keeps X, doc 2 loses X but KEEPS Y, doc 3 loses Y
    val md = java.security.MessageDigest.getInstance("MD5")
    def hx(seed: String) = {
      md.reset()
      md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // X and Y use DISJOINT alphabets (A..T vs g..z, both disjoint from the
    // hex filler and from the U/V/W boundary markers) so they share no
    // 8-gram with each other or with any doc's unique filler — each run's
    // shared fingerprints are exactly its interior shingles
    val X = (0 until 60).map(i => ('A' + i % 20).toChar).mkString
    val Y = (0 until 60).map(i => ('g' + i % 20).toChar).mkString
    val docs = Seq(
      (1L, hx("p1") + "U" + X + "U" + hx("s1")),
      (2L, hx("p2") + "V" + X + "V" + hx("m2") + "V" + Y + "V" + hx("s2")),
      (3L, hx("p3") + "W" + Y + "W" + hx("s3"))).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!spans.exists(_._1 == 1L), "doc 1 is X's keeper")
    // doc 2: exactly one span, inside its X occurrence (positions 34..93),
    // never touching its Y occurrence (it is Y's keeper)
    val d2 = spans.filter(_._1 == 2L)
    assert(d2.length === 1, s"doc 2 spans: ${d2.toSeq}")
    assert(d2.head._2 >= 34 && d2.head._3 <= 94,
      s"doc 2 span ${d2.head} must stay inside its X occurrence")
    // doc 3: one span inside its Y occurrence (positions 34..93)
    val d3 = spans.filter(_._1 == 3L)
    assert(d3.length === 1, s"doc 3 spans: ${d3.toSeq}")
    assert(d3.head._2 >= 34 && d3.head._3 <= 94,
      s"doc 3 span ${d3.head} must stay inside its Y occurrence")
    Dedup.unpersistAll()
  }

  test("dedupSubstrings keeps one copy corpus-wide, unique text intact") {
    val docs = plantedDocs
    val before = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Dedup.dedupSubstrings(docs, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.keySet === before.keySet)
    assert(after(0L) === before(0L), "keeper doc must be byte-identical")
    (1L until 50L).foreach { id =>
      val orig = before(id); val txt = after(id)
      assert(txt.startsWith(orig.substring(0, 32)), s"doc $id lost prefix")
      assert(txt.endsWith(orig.substring(92)), s"doc $id lost suffix")
      assert(!txt.contains(Block.substring(4, 56)), s"doc $id kept the block")
      val cut = orig.length - txt.length
      assert(cut >= 54 && cut <= 60, s"doc $id cut=$cut chars")
    }
    Dedup.unpersistAll()
  }

  test("dedupSubstrings passes an all-unique corpus through unchanged") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hx(seed: String) = {
      md.reset()
      md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val docs = (0 until 20).map(i => (i.toLong, hx(s"u$i") + hx(s"v$i")))
      .toDF("doc_id", "text")
    val before = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Dedup.dedupSubstrings(docs, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === before)
    Dedup.unpersistAll()
  }
}
