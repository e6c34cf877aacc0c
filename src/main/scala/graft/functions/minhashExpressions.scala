package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingling/MinHash kernels.
  *
  * Spark's higher-order functions (`transform`, `aggregate`, `zip_with`) are
  * CodegenFallback — interpreted per element with boxing — so a
  * shingle→hash→minhash pipeline built from them costs milliseconds per
  * document (measured: 21s to sign 5k docs at sf0.1). These expressions fuse
  * the whole kernel into tight JVM loops over primitive arrays: the same
  * pipeline signs the corpus in well under a second.
  *
  * Hashing: 64-bit polynomial over normalized bytes, permuted with a
  * splitmix64 finalizer — deterministic across runs/JVMs.
  */
object MinHashKernel {
  /** splitmix64 finalizer — the per-permutation mixing function. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + -7046029254386353131L // 0x9E3779B97F4A7C15
    z = (z ^ (z >>> 30)) * -4658895280553007687L // 0xBF58476D1CE4E5B9
    z = (z ^ (z >>> 27)) * -7723592293110705685L // 0x94D049BB133111EB
    z ^ (z >>> 31)
  }

  /** Shingle hashes of a document — distinct+sorted (for set ops/minhash)
    * or raw multiset order (dedup=false, for frequency-weighted simhash).
    * mode: 0 = word w-grams (tokens are maximal [a-z0-9] runs after ASCII
    * lowercasing; shingle hash chains token hashes), 1 = char n-grams over
    * the normalized text (non-alnum runs collapsed to single spaces). */
  def shingleHashes(s: UTF8String, n: Int, mode: Int, dedup: Boolean = true): Array[Long] = {
    val bytes = s.getBytes
    // normalize: lowercase ASCII letters/digits kept, everything else is a
    // separator; runs collapse to one space
    val norm = new Array[Byte](bytes.length)
    var m = 0
    var lastSep = true
    var bi = 0
    while (bi < bytes.length) {
      val b = bytes(bi)
      val c: Byte =
        if (b >= 'a' && b <= 'z' || b >= '0' && b <= '9') b
        else if (b >= 'A' && b <= 'Z') (b + 32).toByte
        else ' '
      if (c == ' ') {
        if (!lastSep) { norm(m) = ' '; m += 1; lastSep = true }
      } else { norm(m) = c; m += 1; lastSep = false }
      bi += 1
    }
    while (m > 0 && norm(m - 1) == ' ') m -= 1

    val raw = new scala.collection.mutable.ArrayBuffer[Long]()
    if (mode == 0) {
      // token hashes
      var tokHashes = new Array[Long](8)
      var nTok = 0
      var h = 1125899906842597L
      var inTok = false
      var i = 0
      while (i <= m) {
        val c = if (i < m) norm(i) else ' '.toByte
        if (c != ' ') { h = 31L * h + c; inTok = true }
        else if (inTok) {
          if (nTok == tokHashes.length) {
            tokHashes = java.util.Arrays.copyOf(tokHashes, nTok * 2)
          }
          tokHashes(nTok) = h; nTok += 1
          h = 1125899906842597L; inTok = false
        }
        i += 1
      }
      if (nTok == 0) return Array.empty[Long]
      val w = math.min(n, nTok)
      var t = 0
      while (t + w <= nTok) {
        var sh = 1125899906842597L
        var j = 0
        while (j < w) { sh = sh * -8633297058295171728L + tokHashes(t + j); j += 1 }
        raw += sh
        t += 1
      }
    } else {
      if (m == 0) return Array.empty[Long]
      val k = math.min(n, m)
      var i = 0
      while (i + k <= m) {
        var sh = 1125899906842597L
        var j = 0
        while (j < k) { sh = 31L * sh + norm(i + j); j += 1 }
        raw += sh
        i += 1
      }
    }
    if (!dedup) return raw.toArray
    val arr = raw.distinct.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  /** Word n-grams as SPACE-JOINED STRINGS in one normalize+tokenize pass —
    * the string-keyed sibling of the hash-emitting mode-0 [[shingleHashes]],
    * for consumers that must JOIN on the gram itself (e.g. language-model
    * count tables shared with a SQL oracle). Normalization is the same
    * ASCII rule (lowercase letters/digits kept, everything else a
    * separator; idempotent on text already normalized by
    * `TextFunctions.normalized`). Tokens are single-space separated in the
    * normalized buffer, so gram j is the CONTIGUOUS byte slice from token j
    * through token j+n−1 — no per-gram string building. Fewer than n tokens
    * yields an EMPTY array (no whole-doc degenerate gram — unlike
    * shingleHashes' min(w, ntok) rule — because an LM over padded partial
    * grams would silently mix orders). */
  def wordGrams(s: UTF8String, n: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    val norm = new Array[Byte](bytes.length)
    var m = 0
    var lastSep = true
    var bi = 0
    while (bi < bytes.length) {
      val b = bytes(bi)
      val c: Byte =
        if (b >= 'a' && b <= 'z' || b >= '0' && b <= '9') b
        else if (b >= 'A' && b <= 'Z') (b + 32).toByte
        else ' '
      if (c == ' ') {
        if (!lastSep) { norm(m) = ' '; m += 1; lastSep = true }
      } else { norm(m) = c; m += 1; lastSep = false }
      bi += 1
    }
    while (m > 0 && norm(m - 1) == ' ') m -= 1
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    var nTok = 0
    var i = 0
    while (i < m) {
      if (norm(i) != ' ') {
        val st = i
        while (i < m && norm(i) != ' ') i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st; ends(nTok) = i; nTok += 1
      } else i += 1
    }
    val g = nTok - n + 1
    if (g <= 0) return Array.empty[UTF8String]
    Array.tabulate(g) { j =>
      UTF8String.fromBytes(norm, starts(j), ends(j + n - 1) - starts(j))
    }
  }

  def minhash(shingles: ArrayData, numHashes: Int): Array[Long] = {
    val sig = new Array[Long](numHashes)
    var p = 0
    while (p < numHashes) {
      var mn = Long.MaxValue
      var i = 0
      val n = shingles.numElements()
      while (i < n) {
        val v = mix(shingles.getLong(i) + p * -8633297058295171728L)
        if (v < mn) mn = v
        i += 1
      }
      sig(p) = if (n == 0) p.toLong else mn
      p += 1
    }
    sig
  }
}

/** Distinct sorted shingle-hash set of a document (string-parsing heavy →
  * CodegenFallback is fine; the expression itself IS the loop). */
case class ShingleSet(child: Expression, n: Int, mode: Int, dedup: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_set"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashKernel.shingleHashes(input.asInstanceOf[UTF8String], n, mode, dedup))
  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** MinHash signature from a shingle-hash set — real codegen (hot loop). */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashKernel.minhash(input.asInstanceOf[ArrayData], numHashes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sig = graft.functions.MinHashKernel.minhash($c, $numHashes);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Intersection size of two SORTED long arrays — merge-count, real codegen
  * (runs once per candidate pair: the verification hot path). */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var cnt = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    cnt
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongIntersectCount =
    copy(left = l, right = r)
}

/** SimHash64 over a long-hash set (e.g. ShingleSet output): signed
  * bit-count accumulation over splitmix-mixed hashes. Real codegen — the
  * fused fast path for simhash (the string-array SimHash64 stays for direct
  * token-array inputs). */
case class SimHashLongs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_longs"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = MinHashKernel.mix(arr.getLong(i))
      var k = 0
      while (k < 64) { cnt(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1); k += 1 }
      i += 1
    }
    var r = 0L
    var k = 0
    while (k < 64) { if (cnt(k) > 0) r |= (1L << k); k += 1 }
    r
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cnt = ctx.freshName("cnt"); val i = ctx.freshName("i")
      val k = ctx.freshName("k"); val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      s"""
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = graft.functions.MinHashKernel.mix($c.getLong($i));
         |  for (int $k = 0; $k < 64; $k++) {
         |    $cnt[$k] += ((($h >>> $k) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $r = 0L;
         |for (int $k = 0; $k < 64; $k++) { if ($cnt[$k] > 0) $r |= (1L << $k); }
         |${ev.value} = $r;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): SimHashLongs =
    copy(child = newChild)
}

/** Positions where two equal-length long arrays agree — the MinHash
  * signature-similarity estimator. Real codegen. */
case class ArrayAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_agree_count"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var cnt = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) cnt += 1; i += 1 }
    cnt
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayAgreeCount =
    copy(left = l, right = r)
}

/** Linear-time winnowing kernel (Schleimer/Wilkerson/Aiken, SIGMOD '03).
  *
  * One pass per document: md5 each k-char shingle ONCE (m digests total,
  * not the O(m²) re-evaluation a nested-HOF formulation pays — Catalyst
  * HOFs have no common-subexpression elimination across lambda scopes, so
  * `array_min(slice(hashes, j, w))` recomputes all m hashes at every j),
  * then a monotonic deque yields every w-window minimum in amortized O(1).
  * Digests are compared as raw 16-byte values — unsigned byte order over a
  * fixed-length digest is EXACTLY lowercase-hex lexicographic order, so the
  * selected minima match a DuckDB oracle that orders by `md5(...)` hex
  * strings; hex encoding happens only at emission.
  *
  * Shingles are code-point windows (UTF-8 continuation bytes are not
  * boundaries), matching both Spark `substring` and DuckDB `substr`
  * character semantics. Texts with fewer shingles than one window
  * (0 < m < w) degenerate to a single whole-text window; texts shorter
  * than k yield no fingerprints. Output keeps first-emission order and is
  * distinct (windows share minima ~w-fold; the winnowing density bound is
  * 2/(w+1) fingerprints per character). */
object WinnowKernel {
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HEX(d(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Position-emitting variant of [[winnow]]: every SELECTED window-minimum
    * as (md5-hex fingerprint, 1-based code-point position of its shingle),
    * deduplicated by position (a position is selected by ~w consecutive
    * windows). Tie-break: the EARLIEST position achieving a window's
    * minimum — the deque pops only on strictly-greater, so the head stays
    * the oldest minimal index, which is exactly what a SQL
    * `min(hash || '|' || zero-padded-pos)` window formulation selects
    * (fixed-width hex compares before the position suffix), keeping the
    * DuckDB oracle byte-portable. Same m<w whole-text-window and m<=0
    * degenerate rules as [[winnow]]. */
  def winnowPos(s: UTF8String, k: Int, w: Int)
      : Array[org.apache.spark.sql.catalyst.InternalRow] = {
    val bytes = s.getBytes
    val nb = bytes.length
    var nChars = 0
    var i = 0
    while (i < nb) { if ((bytes(i) & 0xC0) != 0x80) nChars += 1; i += 1 }
    val m = nChars - (k - 1)
    if (m <= 0)
      return Array.empty[org.apache.spark.sql.catalyst.InternalRow]
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    i = 0
    while (i < nb) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(ci) = i; ci += 1 }
      i += 1
    }
    offs(nChars) = nb

    val md = md5Local.get()
    val win = if (m < w) m else w
    val cap = win + 1
    val ring = new Array[Array[Byte]](win)
    val dq = new Array[Int](cap)
    var dh = 0
    var dn = 0
    val seenPos = new java.util.HashSet[Integer]()
    val out = new java.util.ArrayList[org.apache.spark.sql.catalyst.InternalRow]()
    var idx = 0
    while (idx < m) {
      if (dn > 0 && dq(dh) <= idx - win) { dh = (dh + 1) % cap; dn -= 1 }
      md.reset()
      md.update(bytes, offs(idx), offs(idx + k) - offs(idx))
      val d = md.digest()
      ring(idx % win) = d
      while (dn > 0 && java.util.Arrays.compareUnsigned(
          ring(dq((dh + dn - 1) % cap) % win), d) > 0) dn -= 1
      dq((dh + dn) % cap) = idx
      dn += 1
      if (idx >= win - 1) {
        val sel = dq(dh)
        if (seenPos.add(sel))
          out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](hex(ring(sel % win)), sel + 1)))
      }
      idx += 1
    }
    out.toArray(new Array[org.apache.spark.sql.catalyst.InternalRow](out.size()))
  }

  /** Content-defined chunking in one fused pass: cut BEFORE shingle
    * position i (1-based code points, i ≥ 2) whenever the md5 of the
    * k-char gram starting at i opens with `nibbles` zero hex digits —
    * boundary rate 16^-nibbles, expected chunk ≈ 16^nibbles chars. Returns
    * (idx, start, len, md5-hex of the chunk bytes) per chunk. Boundaries
    * depend only on local k-gram content, so an insertion resynchronizes
    * within one chunk — the rsync/LBFS property that makes chunk-hash
    * dedup robust to shifted text, where fixed-size blocks lose alignment
    * forever. Min/max chunk clamps are deliberately OMITTED: they make
    * boundaries stateful (each cut depends on the previous), which breaks
    * both the resync property and SQL replayability; cap outliers
    * downstream if a corpus needs it. Degenerate: empty text → no chunks;
    * 0 < chars < k → one whole-text chunk (no gram fits). */
  def cdcChunks(s: UTF8String, k: Int, nibbles: Int)
      : Array[org.apache.spark.sql.catalyst.InternalRow] = {
    val bytes = s.getBytes
    val nb = bytes.length
    var nChars = 0
    var i = 0
    while (i < nb) { if ((bytes(i) & 0xC0) != 0x80) nChars += 1; i += 1 }
    if (nChars == 0)
      return Array.empty[org.apache.spark.sql.catalyst.InternalRow]
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    i = 0
    while (i < nb) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(ci) = i; ci += 1 }
      i += 1
    }
    offs(nChars) = nb
    val m = nChars - (k - 1)
    val md = md5Local.get()
    val out = new java.util.ArrayList[org.apache.spark.sql.catalyst.InternalRow]()
    var start = 0 // 0-based char index of current chunk start
    var idx = 1
    def emit(endChar: Int): Unit = {
      md.reset()
      md.update(bytes, offs(start), offs(endChar) - offs(start))
      out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](idx, start + 1, endChar - start, hex(md.digest()))))
      idx += 1
    }
    var p = 1 // candidate cut at 0-based char p (cut BEFORE gram at p)
    while (p < m) {
      md.reset()
      md.update(bytes, offs(p), offs(p + k) - offs(p))
      val d = md.digest()
      var z = 0
      var zeros = true
      while (zeros && z < nibbles) {
        val nib = if (z % 2 == 0) (d(z / 2) >> 4) & 0xF else d(z / 2) & 0xF
        if (nib != 0) zeros = false else z += 1
      }
      if (zeros) { emit(p); start = p }
      p += 1
    }
    emit(nChars)
    out.toArray(new Array[org.apache.spark.sql.catalyst.InternalRow](out.size()))
  }

  def winnow(s: UTF8String, k: Int, w: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    val nb = bytes.length
    // code-point start offsets: a UTF-8 char starts at any non-continuation byte
    var nChars = 0
    var i = 0
    while (i < nb) { if ((bytes(i) & 0xC0) != 0x80) nChars += 1; i += 1 }
    val m = nChars - (k - 1) // shingle count
    if (m <= 0) return Array.empty[UTF8String]
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    i = 0
    while (i < nb) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(ci) = i; ci += 1 }
      i += 1
    }
    offs(nChars) = nb

    val md = md5Local.get()
    val win = if (m < w) m else w // m < w: one whole-text window
    val cap = win + 1
    val ring = new Array[Array[Byte]](win) // digest of shingle idx at idx % win
    val dq = new Array[Int](cap) // circular monotonic deque of shingle indices
    var dh = 0 // head position in dq
    var dn = 0 // deque entry count
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var idx = 0
    while (idx < m) {
      // expire the head BEFORE overwriting its ring slot (idx - win ≡ idx mod win)
      if (dn > 0 && dq(dh) <= idx - win) { dh = (dh + 1) % cap; dn -= 1 }
      md.reset()
      md.update(bytes, offs(idx), offs(idx + k) - offs(idx))
      val d = md.digest()
      ring(idx % win) = d
      while (dn > 0 && java.util.Arrays.compareUnsigned(
          ring(dq((dh + dn - 1) % cap) % win), d) > 0) dn -= 1
      dq((dh + dn) % cap) = idx
      dn += 1
      if (idx >= win - 1) seen.add(hex(ring(dq(dh) % win)))
      idx += 1
    }
    val out = new Array[UTF8String](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }
}

/** Winnowing fingerprint set of a document — real codegen (the per-row
  * work is m md5 digests + an O(m) deque; see [[WinnowKernel]]). */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle width k must be >= 1, got $k")
  require(w >= 1, s"window size w must be >= 1, got $w")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowKernel.winnow(input.asInstanceOf[UTF8String], k, w)
        .asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val fps = ctx.freshName("fps")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $fps =
         |  graft.functions.WinnowKernel.winnow($c, $k, $w);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $fps);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintsExpr =
    copy(child = newChild)
}

/** Content-defined chunks of a document — array<struct<idx,start,len,
  * hash>>, one fused codegen pass per row ([[WinnowKernel.cdcChunks]]). */
case class CdcChunksExpr(child: Expression, k: Int, nibbles: Int)
    extends UnaryExpression {
  require(k >= 1, s"gram width k must be >= 1, got $k")
  require(nibbles >= 1 && nibbles <= 8,
    s"boundary nibbles must be in [1,8], got $nibbles")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false),
      StructField("hash", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunks"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowKernel.cdcChunks(input.asInstanceOf[UTF8String], k, nibbles)
        .asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val rows = ctx.freshName("chunks")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow[] $rows =
         |  graft.functions.WinnowKernel.cdcChunks($c, $k, $nibbles);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $rows);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

/** Word n-grams of ASCII-normalized text as space-joined strings — real
  * codegen (one fused normalize+tokenize+slice pass per row; see
  * [[MinHashKernel.wordGrams]]). */
case class WordGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram width n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashKernel.wordGrams(input.asInstanceOf[UTF8String], n)
        .asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val gs = ctx.freshName("grams")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $gs =
         |  graft.functions.MinHashKernel.wordGrams($c, $n);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $gs);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

/** Winnowing SELECTED positions of a document — array<struct<fp,pos>>, one
  * entry per distinct selected window-minimum shingle position (1-based
  * code points). Same fused O(m) kernel as [[WinnowFingerprintsExpr]];
  * feeds boilerplate-span reconstruction where the POSITION of a shared
  * fingerprint matters, not just its identity. */
case class WinnowPositionsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle width k must be >= 1, got $k")
  require(w >= 1, s"window size w must be >= 1, got $w")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("fp", StringType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_positions"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowKernel.winnowPos(input.asInstanceOf[UTF8String], k, w)
        .asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val rows = ctx.freshName("rows")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow[] $rows =
         |  graft.functions.WinnowKernel.winnowPos($c, $k, $w);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $rows);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WinnowPositionsExpr =
    copy(child = newChild)
}

object minhashExprs {
  import GraftSqlBridge.{column, expression}
  /** Word w-shingle hash set (normalized tokens). */
  def wordShingleSet(text: Column, w: Int = 3): Column =
    column(ShingleSet(expression(text), w, 0))
  /** Char n-gram hash set (normalized text). */
  def charShingleSet(text: Column, n: Int = 3): Column =
    column(ShingleSet(expression(text), n, 1))
  def minhashSig(shingles: Column, numHashes: Int): Column =
    column(MinHashSig(expression(shingles), numHashes))
  def simhashLongs(hashes: Column): Column =
    column(SimHashLongs(expression(hashes)))
  /** Raw token-hash multiset (frequency preserved) for weighted simhash. */
  def tokenHashes(text: Column): Column =
    column(ShingleSet(expression(text), 1, 0, dedup = false))
  /** Raw word w-gram hash multiset (frequency + order preserved) — feeds
    * repetition profiling, where gram FREQUENCIES matter. NOTE the kernel's
    * w = min(w, ntok) rule: a doc shorter than w yields one whole-doc gram;
    * consumers must zero out their w-gram stats for such docs. */
  def wordGramMultiset(text: Column, w: Int): Column =
    column(ShingleSet(expression(text), w, 0, dedup = false))
  /** Word n-grams as space-joined STRINGS (order + frequency preserved;
    * < n tokens ⇒ empty). String-keyed sibling of [[wordGramMultiset]] for
    * consumers that join on the gram itself. */
  def wordGrams(text: Column, n: Int): Column =
    column(WordGramsExpr(expression(text), n))
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedLongIntersectCount(expression(a), expression(b)))
  def arrayAgreeCount(a: Column, b: Column): Column =
    column(ArrayAgreeCount(expression(a), expression(b)))
  /** Winnowing fingerprint set — fused O(m) kernel (md5-hex minima,
    * byte-portable to the DuckDB oracle). */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    column(WinnowFingerprintsExpr(expression(text), k, w))
  /** Winnowing selected (fingerprint, 1-based position) structs — the
    * position-carrying sibling of [[winnowFingerprints]]. */
  def winnowPositions(text: Column, k: Int, w: Int): Column =
    column(WinnowPositionsExpr(expression(text), k, w))
  /** Content-defined chunks: (idx, start, len, md5-hex) per chunk;
    * boundary rate 16^-nibbles on k-gram md5 prefixes. */
  def cdcChunks(text: Column, k: Int, nibbles: Int = 1): Column =
    column(CdcChunksExpr(expression(text), k, nibbles))
}
