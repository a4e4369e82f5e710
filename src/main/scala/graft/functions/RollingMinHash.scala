package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum W-codepoint polynomial rolling hash of a string — the
  * codegen'd form of q59's winnowing fingerprint
  * (`array_min(transform(sequence(1, n-W+1), i -> aggregate(...)))`),
  * which as nested higher-order lambdas evaluates INTERPRETED at
  * ~O(n*W) boxed steps per document (measured 11.5 s over sf0.1 once
  * the bench stopped count()-pruning it; reference: Bench.scala's
  * noop-write note).
  *
  * Value-identical by construction: h(window) folds
  * `(acc * 131 + codepoint) % 1000000007` over the window's
  * codepoints, min across all windows — the same arithmetic the
  * DuckDB oracle spells out, on the same codepoint sequence
  * (`ascii(substr(s, i, 1))` yields the codepoint in both engines,
  * and both engines' `length`/`substr` count codepoints, which the
  * zh documents exercise). Codepoints are decoded once into a local
  * array, then the windows run as a fused compiled loop — no boxed
  * lambdas, no per-position array allocation.
  *
  * Strings shorter than W codepoints return NULL (callers filter
  * `length(s) >= W` first, mirroring the oracle's WHERE). */
case class RollingMinHash(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_min_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    if (cps.length < w) return null
    RollingMinHash.minHash(cps, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cps = ctx.freshName("cps")
      s"""
         |int[] $cps = $s.toString().codePoints().toArray();
         |if ($cps.length < $w) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    graft.functions.RollingMinHash.minHash($cps, $w);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingMinHash = copy(child = newChild)
}

object RollingMinHash {
  /** Shared by interpreted eval and generated code: min over all
    * W-windows of the mod-1e9+7 base-131 polynomial hash. */
  def minHash(cps: Array[Int], w: Int): Long = {
    val n = cps.length
    var best = Long.MaxValue
    var i = 0
    while (i <= n - w) {
      var acc = 0L
      var j = 0
      while (j < w) {
        acc = (acc * 131 + cps(i + j)) % 1000000007L
        j += 1
      }
      if (acc < best) best = acc
      i += 1
    }
    best
  }
}
