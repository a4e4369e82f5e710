package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The bounded-state Misra–Gries heavy-hitter sketch behind q126's
  * streaming trending terms: the properties asserted here are exactly
  * the ones the sketch→verify architecture leans on — the buffer
  * never exceeds K counters however large the vocabulary, and every
  * term above the N/(K+1) frequency bar survives REGARDLESS of
  * arrival order or merge tree (the order-independent guarantee that
  * makes a deterministic exact top-k derivable from the sketch). */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def runSketch(tokens: Seq[String], k: Int): Seq[MGEntry] =
    tokens.toDF("w")
      .repartition(4) // force a multi-buffer merge tree
      .agg(MisraGries.sketch(k)(col("w")).as("sk"))
      .as[Seq[MGEntry]]
      .head()

  test("vocabulary within capacity: counts are exact") {
    val tokens = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(5)("c")
    val r = runSketch(tokens, k = 8)
    assert(r === Seq(MGEntry("a", 7), MGEntry("c", 5), MGEntry("b", 3)))
  }

  test("state stays bounded at K under a 10k-term vocabulary") {
    // 10_000 distinct singletons + 3 heavy hitters
    val tokens = (1 to 10000).map(i => f"tail_$i%05d") ++
      Seq.fill(2000)("alpha") ++ Seq.fill(1500)("beta") ++
      Seq.fill(1000)("gamma")
    val r = runSketch(tokens, k = 16)
    assert(r.size <= 16, s"sketch grew past K: ${r.size}")
  }

  test("heavy hitters above N/(K+1) survive every arrival order") {
    val base = (1 to 5000).map(i => f"t_$i%05d") ++
      Seq.fill(1200)("alpha") ++ Seq.fill(900)("beta")
    // N = 7100, K = 16 -> bar = 7100/17 ≈ 418; alpha and beta clear it
    for (seed <- Seq(1, 7, 42)) {
      val shuffled = new scala.util.Random(seed).shuffle(base)
      val terms = runSketch(shuffled, k = 16).map(_.term).toSet
      assert(terms.contains("alpha") && terms.contains("beta"),
        s"heavy hitter evicted under seed $seed: $terms")
    }
  }

  test("surviving counts are lower bounds within N/(K+1)") {
    val tokens = (1 to 3000).map(i => f"t_$i%04d") ++ Seq.fill(800)("alpha")
    val n = tokens.size
    val k = 16
    val r = runSketch(tokens, k)
    val alpha = r.find(_.term == "alpha").get
    assert(alpha.cnt <= 800, "MG count must never overestimate")
    assert(alpha.cnt >= 800 - n / (k + 1),
      s"undercount ${800 - alpha.cnt} exceeds N/(K+1) = ${n / (k + 1)}")
  }

  test("q126 streaming state is one bounded sketch row per language") {
    // the stream-side shape: groupBy(lang).agg(sketch) over an
    // adversarial vocabulary far larger than K — state rows = langs,
    // each buffer ≤ K entries
    val docs = (1 to 4000).map { i =>
      (if (i % 2 == 0) "aa" else "bb", f"w_$i%05d hot_${i % 3} filler")
    }
    val out = docs.toDF("lang", "text")
      .select(col("lang"),
        explode(split(col("text"), "\\s+")).as("w"))
      .groupBy(col("lang"))
      .agg(MisraGries.sketch(graft.queries.StreamingQ.TrendingSketchK)(
        col("w")).as("sk"))
      .select(col("lang"), size(col("sk")).as("n"))
      .as[(String, Int)].collect().toMap
    assert(out.keySet === Set("aa", "bb"))
    assert(out.values.forall(_ <= graft.queries.StreamingQ.TrendingSketchK))
  }
}
