package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the pipeline hot paths — all with real
  * `doGenCode` so they stay inside whole-stage codegen (a Scala UDF here
  * would break the codegen span and pay boxing per row).
  */

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes
  * (h = 31*h + b, seeded like a 64-bit String.hashCode). Used for document
  * fingerprinting; deterministic across runs/JVMs. */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = Fingerprint64.Seed
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $c.getBytes();
         |long $h = ${Fingerprint64.Seed}L;
         |for (int $i = 0; $i < $b.length; $i++) { $h = 31L * $h + $b[$i]; }
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}
object Fingerprint64 { val Seed = 1125899906842597L }

/** 64-bit SimHash over an array of tokens: per-token 64-bit hash, signed
  * bit-count accumulation, sign vector re-packed to a long. Near-duplicate
  * docs differ in few bits (compare with `bit_count(a ^ b)`). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = new Array[Long](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var h = Fingerprint64.Seed
        var j = 0
        while (j < bytes.length) { h = 31L * h + bytes(j); j += 1 }
        var k = 0
        while (k < 64) {
          cnt(k) += (if (((h >>> k) & 1L) == 1L) 1L else -1L); k += 1
        }
      }
      i += 1
    }
    var r = 0L
    var k = 0
    while (k < 64) { if (cnt(k) > 0) r |= (1L << k); k += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val b = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      s"""
         |long[] $cnt = new long[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    byte[] $b = $c.getUTF8String($i).getBytes();
         |    long $h = ${Fingerprint64.Seed}L;
         |    for (int $j = 0; $j < $b.length; $j++) { $h = 31L * $h + $b[$j]; }
         |    for (int $k = 0; $k < 64; $k++) {
         |      $cnt[$k] += ((($h >>> $k) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long $r = 0L;
         |for (int $k = 0; $k < 64; $k++) { if ($cnt[$k] > 0) $r |= (1L << $k); }
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Cosine similarity of two float vectors in one fused loop (dot + both
  * norms) — the hot inner kernel of similarity search. Returns 0.0 for a
  * zero-norm side. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def isFloatArray(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (!isFloatArray(left.dataType) || !isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Squared L2 distance between a FLOAT vector (data) and a DOUBLE vector
  * (centroid literal) in one fused loop — the k-means assignment hot
  * kernel. Float elements upcast exactly; accumulation is strict
  * left-to-right, matching a SQL engine's sequential list_sum so a round-9
  * of the result is bit-portable cross-engine. */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "squared_distance"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<double>), got " +
            s"${l.simpleString} and ${r.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"squared_distance: vector lengths differ ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "squared_distance: vector lengths differ (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $a.getFloat($i)) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredDistance =
    copy(left = l, right = r)
}

/** Fused k-means assignment: argmin over the full centroid table in ONE
  * projection pass — struct(cell, dist2) per input vector, no row
  * expansion. The relational form this replaces (crossJoin against a
  * broadcast centroid frame + min(struct) aggregation) materializes n·k
  * rows each carrying BOTH the input vector and a centroid through a hash
  * aggregate: at 200k vectors × 200 auto-sized cells that is 40M ~800-byte
  * rows per assignment pass — the quadratic assign term behind
  * semantic_dedup_auto's sf10 exponent. Here the centroids ride as a
  * driver-built primitive double[][] reference object in the plan (k·dim
  * doubles — 100 KB at the auto policy's sf10 size), and each row costs
  * exactly the k·dim flops the argmin requires.
  *
  * Value-IDENTICAL to the relational form, pinned by spec: distances are
  * rounded to 9 decimals with the same java.math.BigDecimal.valueOf /
  * HALF_UP arithmetic Spark's `round` codegen emits BEFORE comparison,
  * and ties break on the lower cell id — exactly min(struct(d, cell)).
  *
  * Magnitude envelope of the skip fast path: skipping a candidate with
  * raw s > bestD + 1e-9 is provably safe only while the total rounding
  * displacement (5e-10 decimal half-step + ulp(s)/2 from the final
  * double conversion) stays under the 1e-9 margin — true for any
  * s ≤ ~4e6, where ulp(s)/2 ≤ 4.7e-10. Beyond that a double can no
  * longer represent distinct 1e-9-grid multiples and the skip argument
  * breaks, so once bestD itself exceeds 1e6 the kernel ALWAYS rounds
  * (exact min(round9(d), cell) semantics at any magnitude; the guard
  * costs nothing in the normalized-embedding regime where d² ≤ ~4).
  * A contender with bestD ≤ 1e6 but huge s is also safe to skip: its
  * margin over bestD dwarfs any rounding displacement. Spec-pinned
  * against the relational form at ×1e5-scaled centroids. */
case class ArgminCell(child: Expression, cells: Array[Int],
                      cents: Array[Array[Double]]) extends UnaryExpression {
  require(cells.nonEmpty && cells.length == cents.length,
    s"argmin_cell needs aligned non-empty centroid tables " +
      s"(${cells.length} cells, ${cents.length} centroids)")

  // case-class equals/hashCode over Array parameters degrade to reference
  // identity (arrays don't define content equality), which silently breaks
  // plan canonicalization, semanticEquals, and common-subexpression
  // elimination for two semantically identical kernels — compare contents.
  override def equals(other: Any): Boolean = other match {
    case a: ArgminCell =>
      child == a.child && java.util.Arrays.equals(cells, a.cells) &&
        cents.length == a.cents.length &&
        cents.indices.forall(i => java.util.Arrays.equals(cents(i), a.cents(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(cells)),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        cents.asInstanceOf[Array[AnyRef]])))
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("d", DoubleType, nullable = false)))
  override def prettyName: String = "argmin_cell"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var bestCell = Int.MaxValue
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      if (c.length != n) throw new IllegalArgumentException(
        s"argmin_cell: vector length $n != centroid length ${c.length}")
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - c(i)
        s += d * d
        i += 1
      }
      // fast path: skip the BigDecimal rounding when this centroid cannot
      // win even after rounding — total rounding displacement is at most
      // 5e-10 (decimal half-step) + ulp(s)/2 (double conversion) < 1e-9
      // for s ≤ ~4e6, so s > bestD + 1e-9 ⇒ round(s) > bestD. Once bestD
      // exceeds 1e6 the ulp term can cross the grid and the argument
      // breaks: fall back to always-rounding (see class doc).
      if (s <= bestD + 1e-9 || bestD > 1e6) {
        val rd = java.math.BigDecimal.valueOf(s)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        if (rd < bestD || (rd == bestD && cells(j) < bestCell)) {
          bestD = rd; bestCell = cells(j)
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCell, bestD))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("argminCents", cents, "double[][]")
      val lRef = ctx.addReferenceObj("argminCells", cells, "int[]")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val rd = ctx.freshName("rd")
      val c = ctx.freshName("c")
      val bc = ctx.freshName("bestCell")
      val bd = ctx.freshName("bestD")
      s"""
         |int $n = $a.numElements();
         |int $bc = Integer.MAX_VALUE;
         |double $bd = Double.POSITIVE_INFINITY;
         |for (int $j = 0; $j < $cRef.length; $j++) {
         |  double[] $c = $cRef[$j];
         |  if ($c.length != $n) {
         |    throw new IllegalArgumentException(
         |      "argmin_cell: vector length " + $n + " != centroid length " + $c.length);
         |  }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ((double) $a.getFloat($i)) - $c[$i];
         |    $s += $d * $d;
         |  }
         |  // skip-safety: displacement <= 5e-10 + ulp(s)/2 < the 1e-9
         |  // margin while s <= ~4e6; once bestD > 1e6 always round
         |  // (magnitude envelope — see ArgminCell class doc)
         |  if ($s <= $bd + 1e-9 || $bd > 1e6) {
         |    double $rd = java.math.BigDecimal.valueOf($s)
         |      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue();
         |    if ($rd < $bd || ($rd == $bd && $lRef[$j] < $bc)) {
         |      $bd = $rd; $bc = $lRef[$j];
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $bc, $bd });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArgminCell =
    copy(child = newChild)
}

/** Marker for [[BoundedTopK]]'s per-id-type heap states (long / string). */
sealed trait TopKState extends Serializable

/** Mutable bounded top-k state: a size-k min-heap ordered by
  * (score asc, id desc), so the root is always the WEAKEST kept element and
  * a stronger incoming (score, id) evicts it in O(log k). The kept set is
  * order-independent (strict total order on (score, id) — ids are distinct),
  * so partial aggregation merges deterministically.
  *
  * Storage grows geometrically to min(k, elements seen): callers pass k as
  * an upper BOUND (an unbounded-re-rank contract config uses k = 2²⁰), and
  * a group with 500 candidates must cost 500 slots, not k — with eager
  * allocation every map-side partial buffer would pin 16·k bytes. */
final class TopKHeap(val k: Int) extends TopKState {
  private var cap = math.min(k, 16)
  var scores = new Array[Double](cap)
  var ids = new Array[Long](cap)
  var n = 0

  @inline private def ensureSlot(): Unit =
    if (n == cap && cap < k) {
      cap = math.min(k, cap << 1)
      scores = java.util.Arrays.copyOf(scores, cap)
      ids = java.util.Arrays.copyOf(ids, cap)
    }

  // is (s1,i1) weaker than (s2,i2) under (score desc, id asc) ranking?
  @inline private def weaker(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  /** Distinct-mode insert: skip when `id` is already kept. Exact
    * distinct-then-topk semantics PROVIDED every occurrence of an id in a
    * group carries the same score (see [[BoundedTopK]]): an id currently
    * in the heap is found by the scan; an id that was EVICTED can never
    * re-enter, because eviction implies k strictly-stronger entries were
    * present and the heap only ever gets stronger — the root comparison
    * rejects the duplicate before the scan even runs. The O(n ≤ k) scan
    * is paid only by candidates that would be accepted. */
  def addDistinct(s: Double, id: Long): Unit = {
    if (n >= k && !weaker(scores(0), ids(0), s, id)) return
    var i = 0
    while (i < n) { if (ids(i) == id) return; i += 1 }
    add(s, id)
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < n && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); scores(i) = scores(m); scores(m) = ts
      val ti = ids(i); ids(i) = ids(m); ids(m) = ti
      i = m
    }
  }

  def add(s: Double, id: Long): Unit =
    if (n < k) {
      ensureSlot()
      scores(n) = s; ids(n) = id; n += 1
      // sift up
      var i = n - 1
      while (i > 0 && weaker(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        val ts = scores(i); scores(i) = scores(p); scores(p) = ts
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      }
    } else if (weaker(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }

  /** Kept elements ranked strongest-first: (score desc, id asc). */
  def sortedDesc: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortWith { case ((s1, i1), (s2, i2)) => weaker(s2, i2, s1, i1) }
  }
}

/** [[TopKHeap]]'s string-id twin: same size-k min-heap, ids ordered by
  * UTF8String's binary comparison (Spark's own string sort order, so the
  * kept set and ranking equal the window formulation's ORDER BY id ASC).
  * Stored ids are defensive clones — eval() hands out UTF8Strings backed
  * by reused row buffers. */
final class TopKHeapStr(val k: Int) extends TopKState {
  private var cap = math.min(k, 16)
  var scores = new Array[Double](cap)
  var ids = new Array[UTF8String](cap)
  var n = 0

  @inline private def ensureSlot(): Unit =
    if (n == cap && cap < k) {
      cap = math.min(k, cap << 1)
      scores = java.util.Arrays.copyOf(scores, cap)
      ids = java.util.Arrays.copyOf(ids, cap)
    }

  @inline private def weaker(s1: Double, i1: UTF8String,
                             s2: Double, i2: UTF8String): Boolean =
    s1 < s2 || (s1 == s2 && i1.compareTo(i2) > 0)

  /** Distinct-mode insert — see [[TopKHeap.addDistinct]] for the exactness
    * argument (identical; id equality via UTF8String.equals). */
  def addDistinct(s: Double, id: UTF8String): Unit = {
    if (n >= k && !weaker(scores(0), ids(0), s, id)) return
    var i = 0
    while (i < n) { if (ids(i).equals(id)) return; i += 1 }
    add(s, id)
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < n && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); scores(i) = scores(m); scores(m) = ts
      val ti = ids(i); ids(i) = ids(m); ids(m) = ti
      i = m
    }
  }

  /** `id` must already be safe to retain (cloned by the caller). */
  def add(s: Double, id: UTF8String): Unit =
    if (n < k) {
      ensureSlot()
      scores(n) = s; ids(n) = id; n += 1
      var i = n - 1
      while (i > 0 && weaker(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        val ts = scores(i); scores(i) = scores(p); scores(p) = ts
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      }
    } else if (weaker(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }

  def sortedDesc: Array[(Double, UTF8String)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortWith { case ((s1, i1), (s2, i2)) => weaker(s2, i2, s1, i1) }
  }
}

/** Bounded top-k aggregate: keeps the k strongest (score, id) pairs per
  * group in O(k) memory with map-side partial aggregation — the scale-safe
  * replacement for `row_number().over(Window.partitionBy(group))` + filter,
  * which buffers and sorts EVERY candidate row of a group. Emits
  * array<struct<score double, id bigint|string>> ranked by
  * (score desc, id asc); the id leg takes BIGINT or STRING (string order =
  * UTF8 binary, identical to Spark's ORDER BY on strings).
  *
  * `distinct = true` additionally collapses duplicate ids INSIDE the
  * aggregate — exactly `candidates.distinct()` followed by plain top-k,
  * PROVIDED every occurrence of an id within a group carries the same
  * score (true for any deterministic scoring of a (query, neighbor) pair:
  * multi-probe LSH bucket collisions, NN-descent candidates reached via
  * several shared neighbors). This removes the standalone distinct's
  * full-candidate-set shuffle: dedup happens in the O(k) partial states,
  * so the only exchange left is the partial-state merge. An id arriving
  * with DIFFERENT scores would keep whichever survived its heap — do not
  * use distinct mode with nondeterministic scores. */
case class BoundedTopK(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k > 0, s"k must be positive, got $k")

  private def stringIds: Boolean = idExpr.dataType == StringType

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType),
    StructField("id", idExpr.dataType))))

  // fail at analysis time, not with a per-row ClassCastException mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a DOUBLE score, got ${scoreExpr.dataType.sql}")
    else if (idExpr.dataType != LongType && idExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT or STRING id, got ${idExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKState =
    if (stringIds) new TopKHeapStr(k) else new TopKHeap(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) buf match {
      case h: TopKHeap =>
        if (distinct) h.addDistinct(s.asInstanceOf[Double], id.asInstanceOf[Long])
        else h.add(s.asInstanceOf[Double], id.asInstanceOf[Long])
      case h: TopKHeapStr =>
        // clone: the UTF8String points into a reused unsafe-row buffer.
        // The clone must happen BEFORE addDistinct — the distinct scan
        // STORES the reference it is handed, so cloning only retained ids
        // (i.e. after the scan decides) would leave the heap holding a
        // dangling buffer that the next input row overwrites. The
        // per-candidate clone garbage, including for ids the heap then
        // rejects, is the accepted cost of that safety.
        val u = id.asInstanceOf[UTF8String]
        if (distinct) h.addDistinct(s.asInstanceOf[Double], u.clone())
        else h.add(s.asInstanceOf[Double], u.clone())
    }
    buf
  }

  override def merge(a: TopKState, b: TopKState): TopKState = {
    (a, b) match {
      case (x: TopKHeap, y: TopKHeap) =>
        var i = 0
        while (i < y.n) {
          if (distinct) x.addDistinct(y.scores(i), y.ids(i))
          else x.add(y.scores(i), y.ids(i))
          i += 1
        }
      case (x: TopKHeapStr, y: TopKHeapStr) =>
        var i = 0
        while (i < y.n) {
          if (distinct) x.addDistinct(y.scores(i), y.ids(i))
          else x.add(y.scores(i), y.ids(i))
          i += 1
        }
      case _ => throw new IllegalStateException("mixed top-k heap states")
    }
    a
  }

  override def eval(buf: TopKState): Any = buf match {
    case h: TopKHeap =>
      new GenericArrayData(h.sortedDesc.map { case (s, id) =>
        InternalRow(s, id)
      }.toIndexedSeq)
    case h: TopKHeapStr =>
      new GenericArrayData(h.sortedDesc.map { case (s, id) =>
        InternalRow(s, id)
      }.toIndexedSeq)
  }

  override def serialize(buf: TopKState): Array[Byte] = buf match {
    case h: TopKHeap =>
      val bb = java.nio.ByteBuffer.allocate(8 + 16 * h.n)
      bb.putInt(h.k).putInt(h.n)
      var i = 0
      while (i < h.n) { bb.putDouble(h.scores(i)).putLong(h.ids(i)); i += 1 }
      bb.array()
    case h: TopKHeapStr =>
      val payload = (0 until h.n).map(i => h.ids(i).getBytes)
      val bb = java.nio.ByteBuffer.allocate(
        8 + 12 * h.n + payload.map(_.length).sum)
      bb.putInt(h.k).putInt(h.n)
      var i = 0
      while (i < h.n) {
        bb.putDouble(h.scores(i)).putInt(payload(i).length).put(payload(i))
        i += 1
      }
      bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    if (stringIds) {
      val heap = new TopKHeapStr(bb.getInt)
      val n = bb.getInt
      var i = 0
      while (i < n) {
        val s = bb.getDouble
        val idBytes = new Array[Byte](bb.getInt)
        bb.get(idBytes)
        heap.add(s, UTF8String.fromBytes(idBytes))
        i += 1
      }
      heap
    } else {
      val heap = new TopKHeap(bb.getInt)
      val n = bb.getInt
      var i = 0
      while (i < n) { heap.add(bb.getDouble, bb.getLong); i += 1 }
      heap
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

/** Grow-only open-addressing set of longs (linear probing, power-of-two
  * table, zero key via side flag) — the accepted-value memo of
  * [[KmvState]]. No removal support needed there: see KmvState's staleness
  * argument. */
final class LongOpenSet(initialCapacity: Int = 64) extends Serializable {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity) * 2 - 1)
  private var table = new Array[Long](cap)   // 0 = empty slot
  private var hasZero = false
  private var used = 0

  @inline private def slot(v: Long): Int = {
    // Stafford mix 13 finalizer — spreads consecutive hashes across slots
    var z = v * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    (z ^ (z >>> 27)).toInt & (cap - 1)
  }

  /** Adds v; returns true iff it was NOT already present. */
  def add(v: Long): Boolean = {
    if (v == 0L) {
      if (hasZero) return false
      hasZero = true; return true
    }
    var i = slot(v)
    while (table(i) != 0L) {
      if (table(i) == v) return false
      i = (i + 1) & (cap - 1)
    }
    table(i) = v
    used += 1
    if (used * 2 > cap) grow()
    true
  }

  private def grow(): Unit = {
    val old = table
    cap <<= 1
    table = new Array[Long](cap)
    used = 0
    var j = 0
    while (j < old.length) {
      val v = old(j)
      if (v != 0L) {
        var i = slot(v)
        while (table(i) != 0L) i = (i + 1) & (cap - 1)
        table(i) = v
        used += 1
      }
      j += 1
    }
  }
}

/** KMV (k minimum values) distinct-count sketch state (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002): the k
  * smallest DISTINCT hash values seen, as a max-heap (root = largest kept,
  * O(log k) eviction). Values arrive PRE-FLIPPED (hash ⊕ Long.MinValue) so
  * plain SIGNED comparisons — and downstream `array_sort`/`slice` on the
  * emitted sketch — follow the unsigned order of the raw hash.
  *
  * Distinctness memo: `seen` records every value ever ACCEPTED into the
  * heap, and is never pruned. That is sufficient AND bounded: an evicted
  * value w was the largest kept at eviction time, and roots only decrease,
  * so a returning w always fails the `v < root` fast-reject before the set
  * is consulted — stale entries are unreachable. Expected accepted count is
  * O(k·log(n/k)) for hash-ordered input (each acceptance requires beating
  * the current k-th minimum), so memory stays ~k-proportional.
  *
  * Order-independent by construction (a set function of the input), so
  * partial aggregation merges and ANY partition layout give bit-identical
  * sketches. */
final class KmvState(val k: Int) extends Serializable {
  private var cap = math.min(k, 16)
  var heap = new Array[Long](cap)
  var n = 0
  private val seen = new LongOpenSet()

  def add(v: Long): Unit = {
    if (n >= k && v >= heap(0)) return    // can't beat the k-th minimum
    if (!seen.add(v)) return              // already kept
    if (n < k) {
      if (n == cap) {
        cap = math.min(k, cap << 1)
        heap = java.util.Arrays.copyOf(heap, cap)
      }
      heap(n) = v; n += 1
      var i = n - 1
      while (i > 0 && heap(i) > heap((i - 1) / 2)) {
        val p = (i - 1) / 2
        val t = heap(i); heap(i) = heap(p); heap(p) = t
        i = p
      }
    } else {
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < n && heap(l) > heap(m)) m = l
        if (r < n && heap(r) > heap(m)) m = r
        if (m == i) done = true
        else {
          val t = heap(i); heap(i) = heap(m); heap(m) = t
          i = m
        }
      }
    }
  }

  /** Kept values ascending (= unsigned-ascending raw hashes). */
  def sortedAsc: Array[Long] = {
    val out = java.util.Arrays.copyOf(heap, n)
    java.util.Arrays.sort(out)
    out
  }
}

/** Bounded-memory mergeable distinct-count sketch aggregate: emits the KMV
  * sketch as array<bigint> (flipped hashes, ascending). O(k) state per
  * group with map-side partial merge — COUNT(DISTINCT) over 100 TB with a
  * fixed memory budget, and unlike HLL the kept sample supports SET
  * operations downstream ([[exprs.kmvJaccard]]'s min-wise resemblance).
  * Estimate finishers are plain Column arithmetic ([[exprs.kmvEstimate]]),
  * exact whenever the group's distinct count stays strictly below k (at
  * exactly k the heap fills and [[exprs.kmvEstimate]] switches to the
  * estimator) — the value-oracle-able regime is distinct ≤ k−1. */
case class KmvSketchAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  require(k > 1, s"kmv sketch needs k > 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName consumes pre-hashed BIGINT values, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvState, b: KmvState): KmvState = {
    var i = 0
    while (i < b.n) { a.add(b.heap(i)); i += 1 }
    a
  }

  override def eval(buf: KmvState): Any =
    new GenericArrayData(buf.sortedAsc)

  override def serialize(buf: KmvState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buf.n)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new KmvState(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { st.add(bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren(0))
}

/** Misra–Gries heavy-hitters summary state: at most k (term → count)
  * entries. Inserts accumulate freely; whenever the map exceeds k entries
  * it PRUNES by the (k+1)-th largest count m — subtract m everywhere, drop
  * non-positives — which generalizes the classic decrement-all step (one
  * new unit entry: m = 1) AND gives the mergeable-summaries combine rule
  * (Agarwal et al., PODS 2012): merging is just accumulate-then-prune.
  * Guarantees after processing n items: every kept count is an
  * UNDERestimate short by at most n/(k+1), and any term with true
  * frequency > n/(k+1) is present. With distinct(terms) ≤ k no prune ever
  * fires and the counts are EXACT and order-independent — the
  * value-oracle-able regime. */
final class MgState(val k: Int) extends Serializable {
  val counts = new java.util.HashMap[UTF8String, java.lang.Long]()

  /** `term` must already be safe to retain (cloned by the caller). */
  def add(term: UTF8String, c: Long): Unit = {
    val cur = counts.get(term)
    if (cur != null) { counts.put(term, cur + c); return }
    counts.put(term, c)
    if (counts.size > k) prune()
  }

  private def prune(): Unit = {
    val vals = new Array[Long](counts.size)
    val it0 = counts.values().iterator()
    var i = 0
    while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val m = vals(vals.length - k - 1)   // (k+1)-th largest
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nc = e.getValue - m
      if (nc <= 0L) it.remove() else e.setValue(nc)
    }
  }

  /** Entries ranked (count desc, term asc — UTF8 binary). */
  def sortedDesc: Array[(UTF8String, Long)] = {
    val out = new Array[(UTF8String, Long)](counts.size)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue.longValue()); i += 1 }
    out.sortWith { case ((t1, c1), (t2, c2)) =>
      c1 > c2 || (c1 == c2 && t1.compareTo(t2) < 0)
    }
  }
}

/** Bounded heavy-hitters aggregate (Misra–Gries): O(k) state per group
  * with map-side partial merge — token/domain/source frequency profiling
  * over 100 TB with a fixed memory budget, where the exact
  * explode-groupBy's shuffle is keyed by every distinct term. Emits
  * array<struct<term string, count bigint>> ranked (count desc, term asc).
  * Exact — and layout-independent — whenever the group's distinct count
  * fits inside k; in the error regime counts carry the standard MG
  * guarantee (underestimates short by ≤ n/(k+1), no false dismissals
  * above that threshold). */
case class HeavyHittersAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgState] {

  require(k > 0, s"heavy hitters needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("count", LongType))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING term, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): MgState = new MgState(k)

  override def update(buf: MgState, input: InternalRow): MgState = {
    val v = child.eval(input)
    // clone: the UTF8String points into a reused unsafe-row buffer
    if (v != null) buf.add(v.asInstanceOf[UTF8String].clone(), 1L)
    buf
  }

  override def merge(a: MgState, b: MgState): MgState = {
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.add(e.getKey, e.getValue.longValue())
    }
    a
  }

  override def eval(buf: MgState): Any =
    new GenericArrayData(buf.sortedDesc.map { case (t, c) =>
      InternalRow(t, c)
    }.toIndexedSeq)

  override def serialize(buf: MgState): Array[Byte] = {
    val entries = buf.sortedDesc
    val payload = entries.map(_._1.getBytes)
    val bb = java.nio.ByteBuffer.allocate(
      8 + 12 * entries.length + payload.map(_.length).sum)
    bb.putInt(buf.k).putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putLong(entries(i)._2).putInt(payload(i).length).put(payload(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new MgState(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val c = bb.getLong
      val tb = new Array[Byte](bb.getInt)
      bb.get(tb)
      st.add(UTF8String.fromBytes(tb), c)
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren(0))
}

/** KLL quantile-sketch state (Karnin, Lall, Liberty, FOCS 2016): a stack of
  * level buffers where items at level i carry weight 2^i. Inserts land in
  * level 0; when the structure exceeds its size budget the lowest
  * over-capacity level is COMPACTED — sorted, every other element promoted
  * to the level above (its weight doubles), the rest discarded. Level
  * capacities shrink geometrically (factor 2/3) from the top, giving O(k)
  * total state for quantile queries over unbounded n — the fixed-memory
  * substitute for an exact sort/percentile at 100 TB, and the third
  * mergeable summary in this library's trio (KMV distinct, Misra-Gries
  * frequency, KLL quantiles).
  *
  * Determinism: compaction keeps even/odd positions by an ALTERNATING
  * offset (the deterministic variant à la Manku-Rajagopalan-Lindsay,
  * SIGMOD 1998) instead of KLL's coin flip, so a given dataset+layout
  * reproduces exactly; across layouts the error regime may differ within
  * the guarantee (spec-measured), while the exact regime (n ≤ k: no
  * compaction ever fires) is provably layout-independent — the
  * value-oracle-able regime, same split as the KMV/MG aggregates.
  * Compactions always promote an EVEN count (odd buffers leave their
  * minimum behind), so total represented weight stays exactly n. */
final class KllState(val k: Int) extends Serializable {
  var n: Long = 0L
  var compactions: Long = 0L
  val levels = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.ArrayBuffer.empty[Double])

  private def capacity(lvl: Int): Int = {
    val depth = levels.length - 1 - lvl
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
  }
  private[graft] def budget: Int = (0 until levels.length).map(capacity).sum
  def totalSize: Int = levels.iterator.map(_.length).sum

  def add(v: Double): Unit = {
    levels(0) += v
    n += 1
    compress()
  }

  /** Compact until the state is back under budget. Terminates without a
    * fixed iteration guard: every compact() of a ≥2-element level strictly
    * shrinks totalSize (removes the level, promotes at most half), and when
    * no level has ≥2 elements totalSize ≤ #levels < budget (each level's
    * capacity is ≥ 8), so the loop condition is already false — the O(k)
    * state bound is ENFORCED after every add/merge, not best-effort (a
    * bounded-pass version could leave a large fan-in merge over budget). */
  def compress(): Unit = {
    while (totalSize > budget) {
      var lvl = 0
      while (lvl < levels.length && levels(lvl).length <= capacity(lvl)) lvl += 1
      if (lvl == levels.length) lvl = levels.indexWhere(_.length >= 2)
      if (lvl < 0 || lvl >= levels.length) return
      compact(lvl)
    }
  }

  private def compact(lvl: Int): Unit = {
    val sorted = levels(lvl).toArray
    java.util.Arrays.sort(sorted)
    levels(lvl).clear()
    var start = 0
    if (sorted.length % 2 == 1) {       // odd: min stays at this level so
      levels(lvl) += sorted(0)          // promoted weight stays exact
      start = 1
    }
    if (lvl + 1 == levels.length)
      levels += scala.collection.mutable.ArrayBuffer.empty[Double]
    val up = levels(lvl + 1)
    var i = start + (compactions & 1L).toInt
    compactions += 1
    while (i < sorted.length) { up += sorted(i); i += 2 }
  }

  def mergeIn(b: KllState): Unit = {
    var lvl = 0
    while (lvl < b.levels.length) {
      if (lvl == levels.length)
        levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      levels(lvl) ++= b.levels(lvl)
      lvl += 1
    }
    n += b.n
    compactions += b.compactions
    compress()
  }

  /** Discrete quantiles at `probs`: smallest value whose cumulative weight
    * reaches ceil(p·n) — DuckDB/SQL `quantile_disc` semantics, so the
    * exact regime shares its oracle verbatim. */
  def quantiles(probs: Array[Double]): Array[Double] = {
    val m = totalSize
    val vs = new Array[Double](m)
    val ws = new Array[Long](m)
    var idx = 0
    var lvl = 0
    while (lvl < levels.length) {
      val buf = levels(lvl)
      val w = 1L << lvl
      var i = 0
      while (i < buf.length) { vs(idx) = buf(i); ws(idx) = w; idx += 1; i += 1 }
      lvl += 1
    }
    val order = (0 until m).sortBy(vs(_))
    probs.map { p =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L
      var j = 0
      var out = vs(order(m - 1))
      var found = false
      while (j < m && !found) {
        cum += ws(order(j))
        if (cum >= target) { out = vs(order(j)); found = true }
        j += 1
      }
      out
    }
  }
}

/** Bounded quantile-sketch aggregate over a DOUBLE column: O(k) state with
  * map-side partial merge, emitting the discrete quantiles at `probs` as
  * array<double>. Exact — and layout-independent — whenever the group's
  * row count stays within k (no compaction fires; the oracle regime,
  * matching DuckDB `quantile_disc`); beyond k the deterministic-compaction
  * KLL guarantee applies, spec-measured (~1% rank error at k=200 over
  * 200k rows). */
case class KllQuantilesAgg(
    child: Expression, k: Int, probs: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {

  require(k >= 8, s"kll sketch needs k >= 8, got $k")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probs must be within [0, 1], got $probs")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName consumes DOUBLE values (cast upstream), got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllState, b: KllState): KllState = { a.mergeIn(b); a }

  override def eval(buf: KllState): Any =
    if (buf.n == 0L) null
    else new GenericArrayData(buf.quantiles(probs.toArray))

  override def serialize(buf: KllState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      4 + 8 + 8 + 4 + 4 * buf.levels.length + 8 * buf.totalSize)
    bb.putInt(buf.k).putLong(buf.n).putLong(buf.compactions)
    bb.putInt(buf.levels.length)
    buf.levels.foreach { lv =>
      bb.putInt(lv.length)
      lv.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new KllState(bb.getInt)
    st.n = bb.getLong
    st.compactions = bb.getLong
    val nLevels = bb.getInt
    st.levels.clear()
    var lvl = 0
    while (lvl < nLevels) {
      val sz = bb.getInt
      val buf = new scala.collection.mutable.ArrayBuffer[Double](sz)
      var i = 0
      while (i < sz) { buf += bb.getDouble; i += 1 }
      st.levels += buf
      lvl += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantilesAgg =
    copy(child = newChildren(0))
}

/** Bounded bit-majority aggregate — the simhash reduction as O(nBits)
  * state: consumes a per-token hash (one long per input row), keeps one
  * signed counter per bit position (+1 set, −1 clear), and emits the long
  * whose bit p is 1 iff strictly more inputs had bit p set than clear
  * (ties → 0, matching [[SimHash64]]'s convention). Replaces the 60-column
  * `sum(when(...))` formulation whose generated aggregate was JIT-hostile
  * (20s first-run C2 compile observed at sf0.1); this is a single
  * partial-mergeable aggregate with 8·nBits bytes of state. */
final class BitCounters(val nBits: Int) extends Serializable {
  val c = new Array[Long](nBits)
  def add(h: Long): Unit = {
    var p = 0
    while (p < nBits) {
      if (((h >>> p) & 1L) == 1L) c(p) += 1 else c(p) -= 1
      p += 1
    }
  }
}

case class BitMajorityAgg(
    child: Expression, nBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitCounters] {

  require(nBits > 0 && nBits <= 64, s"bit_majority needs 1..64 bits, got $nBits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bit_majority"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName consumes BIGINT hashes, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): BitCounters = new BitCounters(nBits)

  override def update(buf: BitCounters, input: InternalRow): BitCounters = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BitCounters, b: BitCounters): BitCounters = {
    var p = 0
    while (p < a.nBits) { a.c(p) += b.c(p); p += 1 }
    a
  }

  override def eval(buf: BitCounters): Any = {
    var out = 0L
    var p = 0
    while (p < buf.nBits) {
      if (buf.c(p) > 0L) out |= 1L << p
      p += 1
    }
    out
  }

  override def serialize(buf: BitCounters): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.nBits)
    bb.putInt(buf.nBits)
    var p = 0
    while (p < buf.nBits) { bb.putLong(buf.c(p)); p += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BitCounters = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new BitCounters(bb.getInt)
    var p = 0
    while (p < st.nBits) { st.c(p) = bb.getLong; p += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitMajorityAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitMajorityAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitMajorityAgg =
    copy(child = newChildren(0))
}

/** Column-API entry points for the custom expressions. */
/** Sign-bit random-hyperplane LSH bucket of an embedding vector — the fused
  * codegen twin of the `zip_with`+`aggregate` HOF formulation (HOFs are
  * CodegenFallback-interpreted; this kernel keeps the corpus-wide bucketing
  * pass inside whole-stage codegen). Bit p of the result = sign(dot(vec,
  * plane_p)) over the first min(|vec|, dim) dimensions, null elements
  * contributing 0 — accumulation order matches the HOF's left-to-right
  * `aggregate`, so buckets are bit-for-bit identical (tested). Planes are
  * regenerated deterministically from (nPlanes, seed, dim). */
case class HyperplaneBucket(child: Expression, nPlanes: Int, seed: Long,
                            dim: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bucket needs array<float|double>, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val planesFlat: Array[Double] =
    HyperplaneBucket.planesFlat(nPlanes, dim, seed)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBucket.compute(input.asInstanceOf[ArrayData], planesFlat,
      nPlanes, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesFlat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneBucket.compute(" +
        s"$c, $planesRef, $nPlanes, $dim, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}
object HyperplaneBucket {
  /** Row-major flattened planes — same Gaussian stream as the HOF path's
    * literal planes (one `scala.util.Random(seed)`, plane-by-plane). */
  def planesFlat(nPlanes: Int, dim: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes * dim)(rnd.nextGaussian())
  }

  def compute(arr: ArrayData, planes: Array[Double], nPlanes: Int, dim: Int,
              isFloat: Boolean): Long = {
    val n = math.min(arr.numElements(), dim)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val off = p * dim
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          dot += x * planes(off + i)
        }
        i += 1
      }
      // NaN sets the bit: Spark SQL comparison semantics treat NaN as
      // greater than any value, so the HOF formulation's `dot >= 0` is TRUE
      // for NaN while Java's is false — match Spark to keep the bit-for-bit
      // parity claim on vectors containing NaN
      if (dot >= 0 || java.lang.Double.isNaN(dot)) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}

/** Shannon entropy (nats) of a string's code-point distribution — a cheap
  * compression-proxy quality signal: boilerplate/repetitive text scores low,
  * natural prose high. Computed in one pass over the decoded code points
  * (an ASCII fast path hits a flat 128-slot array; everything else falls to
  * a map), kept inside whole-stage codegen via a static helper call. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
object CharEntropy {
  def compute(u: UTF8String): Double = {
    val s = u.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return 0.0
    val ascii = new Array[Int](128)
    var wide: java.util.HashMap[Integer, Array[Int]] = null
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, Array[Int]]()
        val cell = wide.computeIfAbsent(cp, _ => new Array[Int](1))
        cell(0) += 1
      }
      i += Character.charCount(cp)
    }
    var h = 0.0
    val nd = n.toDouble
    var j = 0
    while (j < 128) {
      if (ascii(j) > 0) { val p = ascii(j) / nd; h -= p * math.log(p) }
      j += 1
    }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) { val p = it.next()(0) / nd; h -= p * math.log(p) }
    }
    h
  }
}

/** Unicode NFC normalization (canonical decomposition + composition) — the
  * encoding-form step a training-data pipeline applies before any hashing
  * or dedup, so "café" spelled e+U+0301 and as the precomposed U+00E9 stop
  * producing different fingerprints. Wraps `java.text.Normalizer` behind a
  * static helper so the call stays inside whole-stage codegen; pure-ASCII
  * inputs (the overwhelming case, detected as numBytes == numChars) return
  * the input UTF8String untouched. Both the JDK and DuckDB's utf8proc
  * implement Unicode canonical composition, so outputs are byte-identical
  * for the oracle. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
object NfcNormalize {
  def compute(u: UTF8String): UTF8String = {
    // all-ASCII ⇒ every code point is one UTF-8 byte ⇒ already NFC
    if (u.numBytes == u.numChars) u
    else {
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }
}

/** Count-Min sketch as ONE mergeable aggregation state: the dense
  * depth×width long grid (bounded O(d·w) per group, elementwise-add merge —
  * the mergeable-summaries property Structured Streaming's state-store
  * combine relies on, like [[KmvSketchAgg]]/[[HeavyHittersAgg]]/
  * [[KllQuantilesAgg]]). Cell (r, slot) uses the SAME engine-replayable
  * hash as the relational [[graft.operators.CorpusOps.cmSketch]] — slot =
  * int(md5(seed:r:token)[0:8], 16) mod width — so the aggregate's grid
  * equals the groupBy form's sparse frame densified (spec-pinned). Returns
  * array<long> of length depth·width, row-major. */
case class CmSketchAgg(
    child: Expression, depth: Int, width: Int, seed: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"cm_sketch depth must be 1..16, got $depth")
  require(width >= 2 && width <= 65536,
    s"cm_sketch width must be 2..65536, got $width")
  require(depth.toLong * width <= (1 << 20),
    s"cm_sketch dense grid depth*width must be <= 2^20, got ${depth.toLong * width}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "cm_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName consumes STRING tokens, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        val hex = md.digest(s"$seed:$r:$tok".getBytes("UTF-8"))
        md.reset()
        // first 8 hex digits = first 4 bytes, big-endian, unsigned
        val h = ((hex(0) & 0xffL) << 24) | ((hex(1) & 0xffL) << 16) |
          ((hex(2) & 0xffL) << 8) | (hex(3) & 0xffL)
        buf(r * width + (h % width).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CmSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmSketchAgg =
    copy(child = newChildren.head)
}

/** Fused JL ±1 random projection kernel: all `outDim` outputs in one pass
  * over the input vector, inside whole-stage codegen — the HOF twin
  * ([[graft.operators.Similarity.randomProjectHof]]) builds 16 separate
  * interpreted zip_with+aggregate chains and was measured 5× the cost of
  * the 64-dim fused cosine it was meant to undercut. Arithmetic is
  * BIT-IDENTICAL to the HOF/oracle form: per element round-half-away-from-
  * zero of (x·s)·1e9 summed as exact longs, output = sum/1e9/√outDim.
  * Wrong-length vectors throw (the HOF's raise_error contract); null
  * elements are unsupported and throw rather than silently skew the sum. */
case class RandomProjectExpr(child: Expression, inDim: Int, outDim: Int,
                             seed: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "random_project"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"random_project needs array<float|double>, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val signsFlat: Array[Int] =
    RandomProjectExpr.signsFlat(outDim, inDim, seed)

  override def nullSafeEval(input: Any): Any =
    RandomProjectExpr.compute(input.asInstanceOf[ArrayData], signsFlat,
      inDim, outDim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signsFlat, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RandomProjectExpr.compute(" +
        s"$c, $signsRef, $inDim, $outDim, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProjectExpr =
    copy(child = newChild)
}
object RandomProjectExpr {
  /** Row-major [j][i] flattened ±1 signs — identical to
    * [[graft.operators.Similarity.signMatrix]] (md5(seed:i:j) first-hex-
    * digit parity). */
  def signsFlat(outDim: Int, inDim: Int, seed: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](outDim * inDim)
    var j = 0
    while (j < outDim) {
      var i = 0
      while (i < inDim) {
        val hex = md.digest(s"$seed:$i:$j".getBytes("UTF-8"))
        md.reset()
        out(j * inDim + i) = if (((hex(0) >> 4) & 0xf) % 2 == 0) 1 else -1
        i += 1
      }
      j += 1
    }
    out
  }

  /** Round half away from zero — ≡ Spark's round(x, 0) and DuckDB's
    * round() on doubles (they only differ from the binary value on exact
    * .5 midpoints, where all three round away from zero). Written with
    * exact floor/remainder comparisons, not floor(x+0.5), whose addition
    * can carry a just-below-.5 value over the boundary. */
  def roundHalfAway(v: Double): Long = {
    val f = Math.floor(v)
    val r = v - f // exact for |v| < 2^52
    if (r > 0.5) f.toLong + 1L
    else if (r < 0.5) f.toLong
    else if (v > 0) f.toLong + 1L
    else f.toLong
  }

  def compute(arr: ArrayData, signs: Array[Int], inDim: Int, outDim: Int,
              isFloat: Boolean): ArrayData = {
    if (arr.numElements() != inDim)
      throw new IllegalArgumentException(
        s"randomProject: expected $inDim-dim vector, got ${arr.numElements()}")
    val scale = Math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      val off = j * inDim
      var sum = 0L
      var i = 0
      while (i < inDim) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"randomProject: null element at position $i")
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        sum += roundHalfAway(x * signs(off + i) * 1e9)
        i += 1
      }
      out(j) = sum.toDouble / 1e9 / scale
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Single-pass kernel behind [[QualityScoreExpr]] — the static method both
  * eval and generated code call (the [[WinnowKernel]] convention).
  *
  * Semantics are BIT-IDENTICAL to the relational composition
  * ([[TextFunctions.qualityScoreRelational]]), which evaluated `split` +
  * interpreted HOF lambdas (`filter`, `aggregate` are CodegenFallback) over
  * the text 4+ times per row — measured 0.97 s/full-corpus pass at sf0.1 of
  * which the four component signals were 0.19/0.21/0.28/0.32 s. Here: ONE
  * byte scan computing token count, token-length sum, punct count, char
  * count and stopword hits together, then the exact double arithmetic in
  * the exact association order of the Column formula, and the same
  * BigDecimal.valueOf/HALF_UP round(6) Spark's Round applies.
  *
  * Faithfulness notes (each mirrors the relational form):
  *  - token = maximal run of non-`\s` bytes, `\s` = Java regex default
  *    [ \t\n\x0B\f\r] (ASCII-only — split's pattern is compiled without
  *    UNICODE_CHARACTER_CLASS); the leading trim() only strips 0x20 which
  *    the splitter handles anyway, so token boundaries are identical.
  *  - char counts (length(), token lengths) count non-continuation bytes —
  *    ≡ UTF8String.numChars on valid UTF-8 (the standing kernel premise;
  *    same contract as the md5/winnow kernels).
  *  - punct class [!-/:-@\[-`{-~] is pure ASCII, counted per byte.
  *  - stopword hits replay `tokens(lower(text))` membership: lowercasing
  *    maps no codepoint to/from whitespace, so per-token lowercase is
  *    token-aligned with whole-text lower(); ASCII tokens (≤ 4 bytes — the
  *    longest stopword) take a packed-long binary search, non-ASCII tokens
  *    fall back to UTF8String.toLowerCase + set lookup (exactly lower()'s
  *    code path). */
object QualityKernel {
  private val stopAscii: Array[Long] = {
    TextFunctions.EnglishStopwords.map { w =>
      val b = w.getBytes("UTF-8")
      require(b.length <= 4 && b.forall(x => x >= 'a' && x <= 'z'),
        s"stopword '$w' breaks the packed-ASCII fast path")
      // k seeds at 1, not 0: a leading 0x00 byte would otherwise be
      // absorbed by the shift (" a" packing equal to "a") and a
      // NUL-prefixed token would falsely count as a stopword — the
      // sentinel makes the packing length-injective (" a" →
      // 0x010061 ≠ "a" → 0x0161). Mirrored in endToken below.
      var k = 1L
      var i = 0
      while (i < b.length) { k = (k << 8) | (b(i) & 0xFFL); i += 1 }
      k
    }.sorted.toArray
  }
  private val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    TextFunctions.EnglishStopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  private def isWs(b: Int): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)
  private def isPunct(b: Int): Boolean =
    (b >= 0x21 && b <= 0x2F) || (b >= 0x3A && b <= 0x40) ||
      (b >= 0x5B && b <= 0x60) || (b >= 0x7B && b <= 0x7E)

  def score(text: UTF8String): Double = {
    val bytes = text.getBytes
    val n = bytes.length
    var nChars = 0
    var punct = 0
    var nTok = 0L
    var sumTokLen = 0L
    var stopCnt = 0L
    var tokStart = -1
    var tokChars = 0
    var tokAscii = true
    var i = 0
    def endToken(endExcl: Int): Unit = {
      nTok += 1
      sumTokLen += tokChars
      val tl = endExcl - tokStart
      if (tokAscii) {
        if (tl <= 4) {
          var k = 1L // nonzero seed — see stopAscii: NUL-safe length-injective packing
          var j = tokStart
          while (j < endExcl) {
            var b = bytes(j) & 0xFF
            if (b >= 'A' && b <= 'Z') b += 32
            k = (k << 8) | b
            j += 1
          }
          if (java.util.Arrays.binarySearch(stopAscii, k) >= 0) stopCnt += 1
        }
      } else {
        val lowered =
          UTF8String.fromBytes(bytes, tokStart, tl).toLowerCase
        if (stopSet.contains(lowered)) stopCnt += 1
      }
      tokStart = -1
    }
    while (i < n) {
      val b = bytes(i) & 0xFF
      val cont = (b & 0xC0) == 0x80
      if (!cont) nChars += 1
      if (isPunct(b)) punct += 1
      if (!cont && isWs(b)) {
        if (tokStart >= 0) endToken(i)
      } else {
        if (tokStart < 0) { tokStart = i; tokChars = 0; tokAscii = true }
        if (!cont) tokChars += 1
        if (b >= 0x80) tokAscii = false
      }
      i += 1
    }
    if (tokStart >= 0) endToken(n)
    // exact double arithmetic in the relational form's association order
    val lenScore = math.min(nTok.toDouble / 50.0, 1.0)
    val wordLen = if (nTok == 0L) 0.0 else sumTokLen.toDouble / nTok.toDouble
    val wordLenScore = if (wordLen >= 3.0 && wordLen <= 10.0) 1.0 else 0.5
    val punctScore =
      if (nChars == 0) 0.0
      else 1.0 - math.min(punct.toDouble / nChars.toDouble * 5.0, 1.0)
    val stopRatio = if (nTok == 0L) 0.0 else stopCnt.toDouble / nTok.toDouble
    val stopScore = math.min(stopRatio * 4.0, 1.0)
    val raw = lenScore * 0.3 + wordLenScore * 0.2 + punctScore * 0.25 +
      stopScore * 0.25
    java.math.BigDecimal.valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

/** Fused composite-quality-score expression: string → double in one codegen
  * pass ([[QualityKernel.score]]); kernel ≡ relational composition pinned in
  * QualityKernelSpec and by every quality-consuming oracle row. */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  override def nullSafeEval(input: Any): Any =
    QualityKernel.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualityKernel.score($c);")

  override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
    copy(child = newChild)
}

object exprs {
  import GraftSqlBridge.{column, expression}
  def fingerprint64(c: Column): Column = column(Fingerprint64(expression(c)))
  /** Fused single-pass composite quality score (see [[QualityKernel]]). */
  def qualityScore(c: Column): Column = column(QualityScoreExpr(expression(c)))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def cosineSimilarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  /** Squared L2 of a float vector against a double centroid literal. */
  def squaredDistance(v: Column, centroid: Column): Column =
    column(SquaredDistance(expression(v), expression(centroid)))
  /** Fused argmin cell assignment over a driver-side centroid table:
    * struct(cell, d) with round-9 distances and lower-cell tie-break —
    * value-identical to crossJoin+min(struct), zero row expansion. */
  def argminCell(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    column(ArgminCell(expression(v),
      cents.map(_._1).toArray, cents.map(_._2.toArray).toArray))
  def boundedTopK(score: Column, id: Column, k: Int,
                  distinct: Boolean = false): Column =
    column(BoundedTopK(expression(score), expression(id), k, distinct)
      .toAggregateExpression())
  def charEntropy(c: Column): Column = column(CharEntropy(expression(c)))
  def nfcNormalize(c: Column): Column = column(NfcNormalize(expression(c)))
  def hyperplaneBucket(vec: Column, nPlanes: Int, seed: Long, dim: Int): Column =
    column(HyperplaneBucket(expression(vec), nPlanes, seed, dim))
  /** Fused JL ±1 projection: array<float|double>[inDim] → array<double>
    * [outDim], one codegen pass (kernel ≡ HOF twin, parity spec-pinned). */
  def randomProject(vec: Column, inDim: Int, outDim: Int, seed: Long): Column =
    column(RandomProjectExpr(expression(vec), inDim, outDim, seed))
  /** Count-Min sketch aggregate over string tokens: dense depth×width
    * row-major long grid, mergeable O(d·w) state. */
  def cmSketchAgg(c: Column, depth: Int, width: Int, seed: Long): Column =
    column(CmSketchAgg(expression(c), depth, width, seed)
      .toAggregateExpression())
  /** Point-frequency estimate from a [[cmSketchAgg]] grid: min over hash
    * rows of the cell the token maps to — plain Column arithmetic, stays
    * in codegen. Same md5 slot hash as the aggregate/relational forms. */
  def cmQuery(grid: Column, token: Column, depth: Int, width: Int,
              seed: Long): Column = {
    import org.apache.spark.sql.functions._
    (0 until depth).map { r =>
      element_at(grid,
        (lit(r * width) +
          (conv(substring(md5(concat(lit(s"$seed:$r:"), token)), 1, 8),
            16, 10).cast("long") % width).cast("int") + lit(1)).cast("int"))
    }.reduce((a, b) => least(a, b))
  }

  /** Misra–Gries heavy hitters over a string column: array<struct<term,
    * count>> ranked (count desc, term asc). Exact when distinct ≤ k. */
  def heavyHitters(c: Column, k: Int): Column =
    column(HeavyHittersAgg(expression(c), k).toAggregateExpression())

  /** Bit-majority reduction of a BIGINT hash column — bit p of the result
    * is 1 iff strictly more inputs had bit p set than clear (ties → 0). */
  def bitMajority(h: Column, nBits: Int): Column =
    column(BitMajorityAgg(expression(h), nBits).toAggregateExpression())

  /** KLL quantile sketch over a numeric column: discrete quantiles at
    * `probs` as array<double>, O(k) state. Exact (≡ SQL `quantile_disc`)
    * while the group's row count stays within k. */
  def kllQuantiles(c: Column, k: Int, probs: Seq[Double]): Column =
    column(KllQuantilesAgg(expression(c.cast("double")), k, probs)
      .toAggregateExpression())

  // ------------------------------------------------------ KMV sketches

  private val Two63 = 9.223372036854775808e18
  private val Two64 = 1.8446744073709551616e19

  /** KMV distinct-count sketch of `c` (any type): xxhash64 + sign-flip in
    * Column space (so the stored longs sort in unsigned hash order under
    * plain signed comparisons), then the bounded [[KmvSketchAgg]]. Emits
    * array<bigint> — feed to [[kmvEstimate]]/[[kmvJaccard]]. */
  def kmvSketch(c: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{lit, when, xxhash64}
    // xxhash64 maps NULL to the seed (a real long!) — gate it so null
    // input stays null and the aggregate's null-skip applies
    column(KmvSketchAgg(
      expression(when(c.isNotNull,
        xxhash64(c).bitwiseXOR(lit(Long.MinValue)))), k)
      .toAggregateExpression())
  }

  /** Distinct-count estimate from a [[kmvSketch]] result: exact |sketch|
    * while the heap never filled (distinct STRICTLY BELOW k — at exactly k
    * distinct the heap is full, `size < k` is false, and the (k−1)/u₍ₖ₎
    * estimator answers instead; size the oracle regime as distinct ≤ k−1),
    * else the k-th-minimum estimator (k−1)/u₍ₖ₎ with u₍ₖ₎ the k-th smallest
    * hash mapped to [0,1). Plain Column arithmetic — stays in codegen. */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{element_at, lit, size, when}
    val u = (element_at(sketch, k).cast("double") + lit(Two63)) / lit(Two64)
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) / u)
  }

  /** Min-wise resemblance (Jaccard) estimate between two [[kmvSketch]]
    * results built with the same k: of the k smallest hashes of the UNION,
    * the fraction present in both sketches (Beyer et al., SIGMOD 2007).
    * Exact when |A ∪ B| ≤ k. */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{array_intersect, array_sort,
      array_union, lit, size, slice, when}
    val x = slice(array_sort(array_union(a, b)), 1, k)
    when(size(x) === 0, lit(0.0)).otherwise(
      size(array_intersect(array_intersect(x, a), b)).cast("double")
        / size(x))
  }
}
