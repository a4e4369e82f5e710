package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Randomized LAW tests for the custom aggregation kernels — the
  * properties that make Spark's map-side partial aggregation safe to
  * run on them. Each law is checked over hundreds of cases drawn from
  * a FIXED-seed generator (reproducible; no resolver-dependent
  * scalacheck bridge needed):
  *
  *   - TopKAgg: for ANY partitioning of the input into buffers, the
  *     merged result equals the single-pass truth (distinct entries,
  *     (cos DESC NaN-largest, id ASC), take k) — partition-invariance
  *     IS the partial-aggregation contract.
  *   - TopTermsAgg: same, plus the term-uniqueness contract.
  *   - MisraGriesAgg: any term with frequency > N/(K+1) survives ANY
  *     partitioning (the mergeable-summaries guarantee the q126
  *     bounded-state rework relies on), and the buffer never exceeds
  *     K entries at any step.
  */
class KernelLawsSpec extends AnyFunSuite {

  private def splitRandomly[T](xs: Seq[T], rnd: Random): Seq[Seq[T]] = {
    if (xs.isEmpty) Seq(Seq.empty)
    else {
      val nParts = 1 + rnd.nextInt(4)
      val tagged = xs.map(x => (rnd.nextInt(nParts), x))
      (0 until nParts).map(p => tagged.filter(_._1 == p).map(_._2))
    }
  }

  test("TopKAgg law: merge of any partitioning == single-pass truth") {
    val rnd = new Random(421)
    for (trial <- 1 to 300) {
      val k = 1 + rnd.nextInt(8)
      val agg = new TopKAgg(k)
      val n = rnd.nextInt(60)
      val entries = Seq.fill(n) {
        val cos =
          if (rnd.nextInt(10) == 0) Double.NaN
          else rnd.nextInt(7) / 3.0 // collisions on purpose
        TopKEntry(cos, rnd.nextInt(12).toLong)
      }
      val merged = splitRandomly(entries, rnd)
        .map(part => part.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged)
      // truth: distinct on (bits(cos), id), ordered cos DESC
      // (NaN largest), id ASC, take k
      def key(e: TopKEntry) =
        (java.lang.Double.doubleToLongBits(e.cos), e.vec_id)
      val truth = entries.distinctBy(key)
        .sortWith { (a, b) =>
          val c =
            if (a.cos.isNaN && b.cos.isNaN) 0
            else if (a.cos.isNaN) 1
            else if (b.cos.isNaN) -1
            else java.lang.Double.compare(a.cos, b.cos)
          c > 0 || (c == 0 && a.vec_id < b.vec_id)
        }
        .take(k)
      // compare on raw bits: NaN != NaN under case-class equality
      assert(got.map(key) === truth.map(key), s"trial $trial k=$k n=$n")
    }
  }

  test("TopTermsAgg law: partition-invariant, term-unique, " +
      "best-score-per-term") {
    val rnd = new Random(422)
    for (trial <- 1 to 300) {
      val k = 1 + rnd.nextInt(6)
      val agg = new TopTermsAgg(k)
      val n = rnd.nextInt(50)
      val entries = Seq.fill(n)(TermEntry(
        rnd.nextInt(9) / 4.0,
        if (rnd.nextInt(12) == 0) null else s"t${rnd.nextInt(8)}"))
      val merged = splitRandomly(entries, rnd)
        .map(part => part.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged)
      // truth: best entry per term (score DESC, null-term-first on
      // ties), then global order, take k
      def better(a: TermEntry, b: TermEntry): Boolean = {
        val c = java.lang.Double.compare(a.score, b.score)
        def cmpT(x: String, y: String): Int =
          if (x == null && y == null) 0
          else if (x == null) -1
          else if (y == null) 1
          else x.compareTo(y)
        c > 0 || (c == 0 && cmpT(a.term, b.term) < 0)
      }
      val truth = entries.groupBy(_.term).valuesIterator
        .map(_.reduceLeft((a, b) => if (better(a, b)) a else b))
        .toSeq.sortWith(better).take(k)
      assert(got === truth, s"trial $trial k=$k n=$n")
      assert(got.map(_.term).distinct.size === got.size)
    }
  }

  test("MisraGriesAgg law: heavy terms survive any partitioning and " +
      "the buffer stays bounded") {
    val rnd = new Random(423)
    for (trial <- 1 to 200) {
      val k = 2 + rnd.nextInt(6)
      val agg = new MisraGriesAgg(k)
      val n = 20 + rnd.nextInt(200)
      // skewed stream: a few heavy terms over a long tail
      val stream = Seq.fill(n) {
        val r = rnd.nextInt(100)
        if (r < 40) "heavy0"
        else if (r < 60) "heavy1"
        else s"tail${rnd.nextInt(50)}"
      }
      val parts = splitRandomly(stream, rnd)
      val buffers = parts.map { part =>
        part.foldLeft(agg.zero) { (b, t) =>
          val nb = agg.reduce(b, t)
          assert(nb.size <= k, s"buffer exceeded K: ${nb.size} > $k")
          nb
        }
      }
      val merged = buffers.foldLeft(agg.zero)(agg.merge)
      assert(merged.size <= k)
      val survivors = agg.finish(merged).map(_.term).toSet
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      for ((t, c) <- counts if c > n.toDouble / (k + 1))
        assert(survivors.contains(t),
          s"trial $trial: heavy '$t' ($c of $n, K=$k) evicted")
    }
  }
}
