package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Native array kernels for the similarity / dedup hot loops.
  *
  * The built-in forms both allocate per ROW-PAIR:
  *   - `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, ...)` materializes
  *     an intermediate array and walks it with boxed lambda calls;
  *   - `size(array_intersect(a, b))` builds an OpenHashSet per call
  *     (the dominant cost of pair verification — millions of candidate
  *     pairs each hash every element of both arrays).
  *
  * At 100 TB the candidate-pair count is the scale driver, so the
  * per-pair kernel must be allocation-free. These expressions compile
  * to a plain fused loop inside whole-stage codegen: no intermediate
  * array, no hash set, no boxing. Semantics are identical to the
  * built-in compositions they replace (asserted in ArrayOpsSpec), so
  * the DuckDB oracles are unchanged.
  */

/** Dot product of two equal-length double arrays — the codegen'd form
  * of `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)`
  * for null-free vectors. Length-mismatched inputs return NULL,
  * matching the built-in (zip_with pads the shorter side with null,
  * which nulls the whole aggregate) — a truncated vector must never
  * rank with a silently partial similarity. */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED DISTINCT long arrays — the merge-
  * walk form of `size(array_intersect(a, b))`. PRECONDITION (by
  * convention, not runtime-checked — a guard would re-scan both
  * arrays and erase the kernel's win): callers must build the arrays
  * with `array_sort(array_distinct(...))` (sort once per row, not
  * once per pair); on unsorted or duplicate-bearing input the count
  * is silently wrong. Every internal caller sorts at build time
  * (Dedup.shingleHashes hsh / ngramJaccard grams); the equality with
  * the built-in composition under the precondition is asserted in
  * ArrayOpsSpec. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String =
    "sorted_intersect_count" // input contract: sorted distinct arrays

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** FIRST COMMON ELEMENT of two SORTED DISTINCT long arrays (NULL if
  * disjoint) — the merge-walk form of
  * `array_min(filter(a, d -> array_contains(b, d)))`, which is
  * O(|a|·|b|): every element of `a` linearly scans `b`. That
  * composition is invisible at small SF and a wall at stress scale —
  * q128's head-term posting lists grow 64× at x64, turning the
  * 5-query search into ~10^10 comparisons (found by the round-13 x64
  * sweep grinding exactly there). Same sorted-distinct input contract
  * as [[SortedIntersectCount]] (the posting lists are sorted-distinct
  * by construction); since both arrays are ascending, the first match
  * of the merge walk IS the minimum of the intersection. Equality
  * with the built-in composition is asserted in ArrayOpsSpec. */
case class SortedIntersectMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String =
    "sorted_intersect_min" // input contract: sorted distinct arrays

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else return xv
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val found = ctx.freshName("found")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0;
         |boolean $found = false;
         |while ($i < $n && $j < $m && !$found) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { ${ev.value} = $xv; $found = true; }
         |}
         |${ev.isNull} = !$found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectMin =
    copy(left = newLeft, right = newRight)
}

/** SimHash majority vote over an array of long hashes: bit b of the
  * result is set iff more than half the hashes have bit b set — one
  * pass with a counts array, replacing per-bit
  * `size(filter(hs, h -> (h >> b) & 1 = 1))` walks (each of which
  * allocates a filtered array per document per bit).
  *
  * Width is [[BitMajority.Bits]] = 60: the corpus hashes are 60-bit
  * md5-prefix values (15 hex chars, so the DuckDB oracle can mirror
  * them in a signed BIGINT), and a 60-bit simhash is what lets the
  * blocked Hamming join use 12-bit blocks — 4096-value bucket keys —
  * instead of the 16-value blocks a 32-bit simhash forces. */
case class BitMajority(child: Expression) extends UnaryExpression {
  import BitMajority.Bits

  override def dataType: DataType = LongType
  override def prettyName: String = "bit_majority"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      val h = x.getLong(i)
      var b = 0
      while (b < Bits) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < Bits) { if (counts(b) * 2 > n) sh |= 1L << b; b += 1 }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val b2 = ctx.freshName("b2")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val sh = ctx.freshName("sh")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[$Bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < $Bits; $b++) {
         |    $counts[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $sh = 0L;
         |for (int $b2 = 0; $b2 < $Bits; $b2++) {
         |  if ($counts[$b2] * 2 > $n) $sh |= 1L << $b2;
         |}
         |${ev.value} = $sh;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BitMajority =
    copy(child = newChild)
}

object BitMajority {
  /** Simhash width in bits; matches the 60-bit md5-prefix hash domain. */
  val Bits = 60
}
