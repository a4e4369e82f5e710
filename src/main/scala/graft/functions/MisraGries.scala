package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One surviving counter of a Misra–Gries heavy-hitter sketch:
  * `cnt` is a LOWER bound on the term's true frequency (decrements
  * only ever subtract), accurate to within N/(K+1) of the truth. */
case class MGEntry(term: String, cnt: Long)

/** Bounded-state Misra–Gries heavy-hitter sketch (Misra & Gries,
  * "Finding repeated elements", 1982; mergeability per Agarwal et
  * al., "Mergeable summaries", PODS'12).
  *
  * The buffer holds AT MOST K counters no matter how many distinct
  * terms flow through — this is the streaming-safe replacement for a
  * full `groupBy(term).count()`, whose state is vocabulary-sized and
  * therefore unbounded on a web-crawl token stream (URLs, typos, IDs
  * grow the vocabulary without limit). Guarantees, both
  * ORDER-INDEPENDENT (they hold for every arrival order and every
  * merge tree, which is what makes a deterministic exact top-k
  * derivable from a nondeterministically-built sketch):
  *
  *   - every term with true frequency > N/(K+1) of the N-token
  *     stream IS in the final sketch (classic MG bound; preserved
  *     under the subtract-(K+1)th-count merge, Agarwal et al. §3.1);
  *   - each surviving counter underestimates its term's true count
  *     by at most N/(K+1).
  *
  * The sketch is therefore a CANDIDATE GENERATOR: downstream takes
  * the ≤K surviving terms and recounts them exactly over the landed
  * corpus (a semi-join — candidate-sized, not vocabulary-sized), and
  * any term whose true count clears the N/(K+1) bar is guaranteed to
  * be in that recount regardless of how micro-batches arrived. When
  * the observed vocabulary fits within K the sketch never decrements
  * and the counts themselves are exact.
  *
  * reduce is O(1) per hit and O(K) per decrementing miss (the classic
  * amortization: each decrement pass removes ≥1 unit from every
  * counter, so total decrement work is bounded by total insert work);
  * merge is O(K log K). The buffer encoder is a plain map, so Spark
  * runs this with map-side partial aggregation — and as a STREAMING
  * aggregate its state-store row per group is this bounded buffer,
  * never the vocabulary. */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[MGEntry]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], term: String): Map[String, Long] =
    b.get(term) match {
      case Some(c) => b.updated(term, c + 1)
      case None if b.size < k => b.updated(term, 1L)
      case None =>
        // decrement-all: the arriving term and every counter each
        // give up one unit (the term's unit vanishes with them)
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  /** Mergeable-summaries merge: sum counters pointwise, and if more
    * than K survive, subtract the (K+1)-th largest count from all and
    * keep the strictly positive — at most K remain (only counts
    * strictly above the (K+1)-th can stay positive), and the error
    * bounds of the two inputs add, preserving the N/(K+1) guarantee
    * over the combined stream. */
  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val s = y.foldLeft(x) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (s.size <= k) s
    else {
      val kth = s.valuesIterator.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      s.view.mapValues(_ - kth).filter(_._2 > 0).toMap
    }
  }

  /** Survivors sorted (cnt DESC, term ASC) — a deterministic ORDER
    * for whatever set survived; the SET itself may vary with arrival
    * order, which is why consumers recount rather than trust cnt. */
  override def finish(b: Map[String, Long]): Seq[MGEntry] =
    b.toSeq.map { case (t, c) => MGEntry(t, c) }
      .sortBy(e => (-e.cnt, e.term))

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[MGEntry]] =
    ExpressionEncoder[Seq[MGEntry]]()
}

object MisraGries {
  /** `mg_sketch(k)(term)` -> `array<struct<term, cnt>>`: the ≤k
    * surviving heavy-hitter candidates, (cnt DESC, term ASC). */
  def sketch(k: Int): Column => Column = {
    val fn = udaf(new MisraGriesAgg(k), Encoders.STRING)
    (term: Column) => fn(term)
  }
}
