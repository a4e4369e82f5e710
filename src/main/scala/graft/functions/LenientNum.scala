package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst forms of [[graft.norm.Coerce.lenientDouble]] /
  * [[graft.norm.Coerce.lenientInt]] (reference main.py:501-528) —
  * one branch-free static Java call per row instead of the
  * combinator's ~4-regexp `when`-tree. Semantics are IDENTICAL
  * (asserted input-class-by-input-class in LenientNumSpec); never
  * null, never throws — garbage maps to the 0 default.
  *
  * Why they exist: the wide conform pipelines (q37: 22 columns, q38:
  * 32 columns) coerce every column in ONE whole-stage-codegen stage.
  * With the regexp combinators that stage carries 4-10 compiled
  * matchers PER COLUMN (~250 for q38), which blows Janino's 64 KB
  * method limit in `sort_addToSorter_0` and silently drops the whole
  * stage to interpreted execution — at 100 TB that is the entire
  * conform pass running de-vectorized. The native calls keep the
  * generated method a few lines per column.
  */
case class LenientDouble(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "lenient_double"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0.0
    else LenientNumImpl.toDouble(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        double ${ev.value} = ${childGen.isNull} ? 0.0 :
          graft.functions.LenientNumImpl.toDouble(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LenientDouble =
    copy(child = newChild)
}

case class LenientLong(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lenient_long"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LenientNumImpl.toLong(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull} ? 0L :
          graft.functions.LenientNumImpl.toLong(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LenientLong =
    copy(child = newChild)
}

/** Row-level implementation invoked from generated code. The grammar
  * constants are THE [[graft.norm.Coerce.NumRe]]/InfRe patterns —
  * shared with the Column combinators and the DuckDB oracle SQL, so
  * the three surfaces cannot drift. */
object LenientNumImpl {
  private val NumPattern =
    java.util.regex.Pattern.compile(graft.norm.Coerce.NumRe)
  private val InfPattern =
    java.util.regex.Pattern.compile(graft.norm.Coerce.InfRe)

  /** Python-`float()`-compatible parse of an ALREADY-TRIMMED string;
    * null tokens and garbage → 0.0 (main.py:516-528). Shared by
    * [[toDouble]] and [[TimeToMinutesImpl.convert]]'s plain-number
    * branch. */
  private[functions] def parse(s: String): Double = {
    // null tokens, exact case (main.py:441-444)
    if (s.isEmpty || s == "-" || s == "nan" || s == "None") 0.0
    else if (InfPattern.matcher(s).matches()) {
      if (s.charAt(0) == '-') Double.NegativeInfinity
      else Double.PositiveInfinity
    } else if (NumPattern.matcher(s).matches()) {
      try s.replace("_", "").toDouble
      catch { case _: NumberFormatException => 0.0 }
    } else 0.0
  }

  def toDouble(u: UTF8String): Double = parse(u.toString.trim)

  /** main.py:501-513: parse as double, truncate toward zero; pandas
    * `astype(int)` raises on non-finite → default 0, like the
    * combinator ([[graft.norm.Coerce.lenientInt]]). `.toLong` clamps
    * out-of-range doubles exactly like Spark's non-ANSI double→long
    * cast (both are Java `(long)` conversion semantics). */
  def toLong(u: UTF8String): Long = {
    val d = toDouble(u)
    if (java.lang.Double.isInfinite(d)) 0L else d.toLong
  }
}
