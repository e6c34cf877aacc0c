package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

/** Column-API entry points for the custom expressions. */
object exprs {
  import GraftSqlBridge.{column, expression}
  def fingerprint64(c: Column): Column = column(Fingerprint64(expression(c)))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def cosineSimilarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
}
