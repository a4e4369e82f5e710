package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.aggregate.{ResolveEncodersInScalaAgg, ScalaAggregator}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

import graft.functions.{TermEntry, TopKAgg, TopKEntry, TopTermsAgg}

/** Optimizer rule automating the repo's signature scale rewrite: the
  * naive per-group top-k window pattern
  *
  * {{{
  *   Filter(rn <= k,
  *     Window(rn = row_number() OVER (PARTITION BY g ORDER BY
  *                                    score DESC, id ASC), ...))
  * }}}
  *
  * becomes the bounded-heap aggregate form every hand-written query
  * here uses ([[graft.functions.TopKAgg]] via `topkRank`):
  * `Aggregate(g, top_k(score, id)) -> PosExplode -> Project` — the
  * same output schema and exprIds, so nothing downstream notices.
  *
  * MEASURED VERDICT (BENCH_NOTES "r9 window-top-k rewrite", via
  * [[graft.RewriteBench]]): this rewrite is OFF by default. Spark
  * 3.5+'s own `InferWindowGroupLimit` already bounds the window
  * pattern's row volume (map tasks emit ≤ k rows per group before
  * the exchange), and the remaining sort-based pipeline beats the
  * typed-aggregate form outside a narrow band: at 20M rows / 100
  * groups the two are at parity (1.2 vs 1.25 s warm); at 40M rows /
  * 2M groups the window pipeline wins 3.1 vs 6.3 s because
  * ObjectHashAggregate falls back to sort-based execution past 128
  * in-memory keys — and lifting that threshold OOMs (2M typed heap
  * buffers per partition), so the fallback is load-bearing, not
  * tunable. Enable (`spark.graft.rewriteWindowTopKDistinct=true`) when you
  * want the aggregate form's SEMANTICS rather than raw speed: the
  * distinct-top-k contract (band-duplicate candidate streams rank
  * without a separate `.distinct()` shuffle) or the ranked-array
  * output shape. The rule is also the engine's worked example of the
  * `SparkSessionExtensions` tier — pattern-guarded logical rewrite,
  * exprId-preserving output, post-analysis encoder resolution.
  *
  * Contract and guards (the rewrite fires ONLY when all hold):
  *   - the single window function is `row_number()` with the default
  *     running frame, partitioned by plain attributes, ordered by
  *     exactly (score DESC NULLS LAST, id ASC NULLS FIRST) where
  *     `score` is a non-nullable DOUBLE attribute and `id` a
  *     non-nullable BIGINT or a STRING attribute (the two
  *     bounded-heap aggregates available: [[TopKAgg]],
  *     [[TopTermsAgg]] — the latter's tie-break mirrors ASC NULLS
  *     FIRST, so nullable strings are safe; a nullable BIGINT is
  *     rejected because the heap entry's primitive long would
  *     silently zero a null);
  *   - the filter is `rn <= lit` / `rn < lit` over the rank alone,
  *     with 0 < k <= [[WindowTopKRewrite.MaxK]] (the bounded-heap
  *     assumption: ~2k entries per aggregation buffer);
  *   - the window's input exposes ONLY the partition/score/id
  *     columns (true after column pruning for consumers that use
  *     nothing else — exactly the `topkRank` shape); otherwise the
  *     window's pass-through columns have no aggregate equivalent
  *     and the plan is left alone;
  *   - duplicate-row semantics: `row_number` assigns duplicate
  *     (score, id) rows distinct ranks; the aggregate collapses them
  *     (and [[TopTermsAgg]] keeps one slot per id). With `id` unique
  *     within a group — the invariant of every id-keyed ranking —
  *     the outputs are identical; the rule asks for no proof of
  *     uniqueness, so like-for-like duplicates dedup. This DISTINCT
  *     top-k contract is the documented behavior.
  *
  * Registered by [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`); fires only
  * with `spark.graft.rewriteWindowTopKDistinct=true`.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** Bounded-heap sanity cap: a window top-million is not a heap
    * workload, leave it to Spark. */
  val MaxK = 4096

  private val ConfKey = "spark.graft.rewriteWindowTopKDistinct"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan transform {
      case f @ Filter(cond, w: Window) =>
        rewrite(f, cond, w).getOrElse(f)
    }
  }

  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rn) => Some(k - 1)
      case _ => None
    }

  private def defaultRunningFrame(frame: WindowFrame): Boolean =
    frame match {
      case UnspecifiedFrame => true
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
        true
      case _ => false
    }

  private def rewrite(
      f: Filter, cond: Expression, w: Window): Option[LogicalPlan] = {
    // strip the WindowGroupLimit InferWindowGroupLimit may have
    // inserted — the aggregate's map-side partials subsume it
    val child = w.child match {
      case WindowGroupLimit(_, _, _, _, inner) => inner
      case c => c
    }
    for {
      alias <- w.windowExpressions match {
        case Seq(a @ Alias(_: WindowExpression, _)) => Some(a)
        case _ => None
      }
      we = alias.child.asInstanceOf[WindowExpression]
      _ <- if (we.windowFunction.isInstanceOf[RowNumber]) Some(()) else None
      _ <- if (defaultRunningFrame(we.windowSpec.frameSpecification))
             Some(()) else None
      k <- rankLimit(cond, alias.toAttribute)
      _ <- if (k > 0 && k <= MaxK) Some(()) else None
      parts <- if (w.partitionSpec.nonEmpty &&
          w.partitionSpec.forall(_.isInstanceOf[AttributeReference]))
        Some(w.partitionSpec.map(_.asInstanceOf[AttributeReference]))
        else None
      (score, id) <- w.orderSpec match {
        // a nullable LONG id is rejected (the heap entry's primitive
        // long would silently zero a null); a nullable STRING id is
        // fine — TopTermsAgg's tie-break mirrors ASC NULLS FIRST
        case Seq(
          SortOrder(s: AttributeReference, Descending, NullsLast, _),
          SortOrder(i: AttributeReference, Ascending, NullsFirst, _))
          if s.dataType == DoubleType && !s.nullable &&
            ((i.dataType == LongType && !i.nullable) ||
              i.dataType == StringType) =>
          Some((s, i))
        case _ => None
      }
      // the window input must expose nothing beyond what the
      // aggregate can rebuild
      _ <- if (child.outputSet.subsetOf(
             AttributeSet(parts ++ Seq(score, id)))) Some(()) else None
    } yield {
      val aggFn =
        if (id.dataType == LongType)
          ScalaAggregator(
            Seq(score, id), new TopKAgg(k),
            ExpressionEncoder[TopKEntry](),
            ExpressionEncoder[Seq[TopKEntry]]())
        else
          ScalaAggregator(
            Seq(score, id), new TopTermsAgg(k),
            ExpressionEncoder[TermEntry](),
            ExpressionEncoder[Seq[TermEntry]]())
      val tk = Alias(aggFn.toAggregateExpression(), "graft_tk")()
      val agg = Aggregate(parts, (parts :+ tk).toSeq, child)
      val gen = PosExplode(tk.toAttribute)
      val genOut = DataTypeUtils.toAttributes(gen.elementSchema)
      val generate = Generate(gen,
        unrequiredChildIndex = Seq(parts.size),
        outer = false, qualifier = None,
        generatorOutput = genOut, child = agg)
      val pos = genOut.head
      val entry = genOut(1)
      val rebuilt: Map[ExprId, NamedExpression] = Map(
        score.exprId -> Alias(
          GetStructField(entry, 0), score.name)(exprId = score.exprId),
        id.exprId -> Alias(
          GetStructField(entry, 1), id.name)(exprId = id.exprId))
      val outCols = f.output.map { a =>
        if (a.exprId == alias.exprId)
          Alias(Add(pos, Literal(1, IntegerType)),
            alias.name)(exprId = alias.exprId)
        else rebuilt.getOrElse(a.exprId, a)
      }
      // the analyzer's encoder-resolution rule has already run by
      // optimization time — re-run it over the new aggregate subtree
      ResolveEncodersInScalaAgg(Project(outCols, generate))
    }
  }
}

/** `spark.sql.extensions` entry point registering the graft optimizer
  * rules on session build (also usable programmatically:
  * `SparkSession.builder().withExtensions(new GraftExtensions())`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => WindowTopKRewrite)
}
