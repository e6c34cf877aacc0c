package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{BoundedTopK, TopKHeap, TopKHeapStr}

/** Pure-JVM property tests for the BoundedTopK heaps — the O(k)-state
  * ranking primitive every ANN/top-k path leans on. Exercises the lazy
  * geometric growth (k is an upper bound, storage must track elements
  * seen), arbitrary chunked partial aggregation with merges, and the
  * serialize/deserialize round trip, against a plain sort reference:
  * take-k by (score desc, id asc). */
class BoundedTopKSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // discrete scores force heavy ties so the id tie-break is exercised
  private val genItemsL = Gen.listOf(for {
    s <- Gen.oneOf(0.0, 0.25, 0.5, 0.75, 1.0)
    id <- Gen.chooseNum(-100L, 100L)
  } yield (s, id))

  test("long heap ≡ sort-take-k under chunked merges + serde round trips") {
    val agg = BoundedTopK(Literal(0.0), Literal(0L), 1)  // serde host only
    val gen = for {
      k <- Gen.chooseNum(1, 40)
      items <- genItemsL
      chunks <- Gen.chooseNum(1, 5)
    } yield (k, items, chunks)
    check(Prop.forAll(gen) { case (k, items, chunks) =>
      val reference = items.sortWith { case ((s1, i1), (s2, i2)) =>
        s1 > s2 || (s1 == s2 && i1 < i2)
      }.take(k)
      val parts = items.grouped(math.max(1, (items.size + chunks - 1) / chunks))
      val heaps = parts.map { chunk =>
        val h = new TopKHeap(k)
        chunk.foreach { case (s, id) => h.add(s, id) }
        // partial buffers travel through serialize/deserialize in Spark
        agg.copy(k = k).deserialize(agg.serialize(h)).asInstanceOf[TopKHeap]
      }.toList
      val merged = heaps match {
        case Nil => new TopKHeap(k)
        case h :: rest =>
          rest.foreach { o =>
            var i = 0
            while (i < o.n) { h.add(o.scores(i), o.ids(i)); i += 1 }
          }
          h
      }
      merged.sortedDesc.toSeq == reference
    })
  }

  test("string heap ≡ sort-take-k with UTF8-binary tie-break + serde") {
    val agg = BoundedTopK(Literal(0.0),
      Literal(UTF8String.fromString(""),
        org.apache.spark.sql.types.StringType), 1)
    val genItemsS = Gen.listOf(for {
      s <- Gen.oneOf(0.0, 0.5, 1.0)
      id <- Gen.oneOf("a", "B", "zz", "0", "é", "doc-17", "", "Zebra")
    } yield (s, id))
    val gen = for {
      k <- Gen.chooseNum(1, 10)
      items <- genItemsS
      chunks <- Gen.chooseNum(1, 4)
    } yield (k, items, chunks)
    check(Prop.forAll(gen) { case (k, items, chunks) =>
      // reference order: UTF8 BINARY byte order, exactly what Spark's
      // ORDER BY uses — NOT java.lang.String's UTF-16 comparison
      val reference = items
        .map { case (s, id) => (s, UTF8String.fromString(id)) }
        .sortWith { case ((s1, i1), (s2, i2)) =>
          s1 > s2 || (s1 == s2 && i1.compareTo(i2) < 0)
        }.take(k).map { case (s, u) => (s, u.toString) }
      val parts = items.grouped(math.max(1, (items.size + chunks - 1) / chunks))
      val heaps = parts.map { chunk =>
        val h = new TopKHeapStr(k)
        chunk.foreach { case (s, id) => h.add(s, UTF8String.fromString(id)) }
        agg.copy(k = k).deserialize(agg.serialize(h)).asInstanceOf[TopKHeapStr]
      }.toList
      val merged = heaps match {
        case Nil => new TopKHeapStr(k)
        case h :: rest =>
          rest.foreach { o =>
            var i = 0
            while (i < o.n) { h.add(o.scores(i), o.ids(i)); i += 1 }
          }
          h
      }
      merged.sortedDesc.toSeq.map { case (s, u) => (s, u.toString) } == reference
    })
  }

  test("distinct mode ≡ distinct()-then-top-k under chunked merges + serde") {
    // the precondition the operators guarantee: every occurrence of an id
    // carries the SAME score (deterministic pair scoring) — derive score
    // from id so heavy duplication + heavy score ties both occur, which
    // also stresses the eviction-no-reentry argument (ids evicted early
    // keep arriving as duplicates in later chunks and across merges)
    val agg = BoundedTopK(Literal(0.0), Literal(0L), 1, distinct = true)
    def scoreOf(id: Long): Double = ((id % 7 + 7) % 7) * 0.25
    val gen = for {
      k <- Gen.chooseNum(1, 12)
      ids <- Gen.listOf(Gen.chooseNum(-30L, 30L))
      chunks <- Gen.chooseNum(1, 5)
    } yield (k, ids, chunks)
    check(Prop.forAll(gen) { case (k, ids, chunks) =>
      val reference = ids.distinct.map(id => (scoreOf(id), id))
        .sortWith { case ((s1, i1), (s2, i2)) =>
          s1 > s2 || (s1 == s2 && i1 < i2)
        }.take(k)
      val parts = ids.grouped(math.max(1, (ids.size + chunks - 1) / chunks))
      val heaps = parts.map { chunk =>
        val h = new TopKHeap(k)
        chunk.foreach(id => h.addDistinct(scoreOf(id), id))
        agg.copy(k = k).deserialize(agg.serialize(h)).asInstanceOf[TopKHeap]
      }.toList
      val merged = heaps match {
        case Nil => new TopKHeap(k)
        case h :: rest =>
          rest.foreach { o =>
            var i = 0
            while (i < o.n) { h.addDistinct(o.scores(i), o.ids(i)); i += 1 }
          }
          h
      }
      merged.sortedDesc.toSeq == reference
    })
  }

  test("string distinct mode ≡ distinct()-then-top-k") {
    def scoreOf(id: String): Double = (id.length % 3) * 0.5
    val gen = for {
      k <- Gen.chooseNum(1, 6)
      ids <- Gen.listOf(Gen.oneOf("a", "B", "zz", "0", "é", "doc-17", "", "Zebra"))
    } yield (k, ids)
    check(Prop.forAll(gen) { case (k, ids) =>
      val reference = ids.distinct
        .map(id => (scoreOf(id), UTF8String.fromString(id)))
        .sortWith { case ((s1, i1), (s2, i2)) =>
          s1 > s2 || (s1 == s2 && i1.compareTo(i2) < 0)
        }.take(k).map { case (s, u) => (s, u.toString) }
      val h = new TopKHeapStr(k)
      ids.foreach(id => h.addDistinct(scoreOf(id), UTF8String.fromString(id)))
      h.sortedDesc.toSeq.map { case (s, u) => (s, u.toString) } == reference
    })
  }
}
