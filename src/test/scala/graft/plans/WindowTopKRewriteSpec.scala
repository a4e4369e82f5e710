package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rewrite is exercised through a DEDICATED session
  * built with [[GraftExtensions]] (sharing the test JVM's
  * SparkContext): extensions bind at session construction, so the
  * shared [[graft.SparkSpec]] session can't host them. */
class WindowTopKRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val base = graft.SparkSpec.session

  private lazy val ext: SparkSession = {
    val orig = base // force shared session (and its context) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.rewriteWindowTopKDistinct", "true") // default off
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(orig)
    SparkSession.setActiveSession(orig)
    s
  }

  override def afterAll(): Unit = {
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
  }

  /** 3 groups x 40 scored rows with unique ids and distinct scores. */
  private def scored(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 until 120).map { i =>
      (i % 3, (i * 37 % 120) / 100.0, i.toLong)
    }.toDF("grp", "score", "vid")
  }

  private def topkWindow(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("vid").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("the window top-k pattern rewrites to the bounded-heap aggregate " +
      "and keeps the exact window results") {
    val dfExt = topkWindow(scored(ext), 5)
    val plan = dfExt.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"window survived the rewrite:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the TopKAgg aggregate:\n$plan")

    val expected = topkWindow(scored(base), 5)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2),
        r.getInt(3))).sortBy(t => (t._1, t._4))
    val got = dfExt.collect().map(r => (r.getInt(0), r.getDouble(1),
      r.getLong(2), r.getInt(3))).sortBy(t => (t._1, t._4))
    assert(got.toSeq === expected.toSeq)
    assert(got.length === 15) // 3 groups x 5
  }

  test("string-id rankings route to TopTermsAgg and match the window") {
    import ext.implicits._
    val df = (0 until 90)
      .map(i => (i % 3, (i * 53 % 90) / 10.0, s"t${i}"))
      .toDF("grp", "score", "term")
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("term").asc)
    val out = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && plan.contains("ObjectHashAggregate"),
      s"string ranking should rewrite:\n$plan")
    // window reference on the plain session (scoped import so the
    // two sessions' implicits never sit at the same nesting level)
    val ref = {
      val sBase = base
      import sBase.implicits._
      (0 until 90)
        .map(i => (i % 3, (i * 53 % 90) / 10.0, s"t${i}"))
        .toDF("grp", "score", "term")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
        .collect().map(r => (r.getInt(0), r.getString(2), r.getInt(3)))
        .sortBy(t => (t._1, t._3))
    }
    val got = out.collect()
      .map(r => (r.getInt(0), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq === ref.toSeq)
  }

  test("guards hold the rewrite back: pass-through columns, rank(), " +
      "unpartitioned windows, and the kill switch") {
    import ext.implicits._
    val df = (0 until 60)
      .map(i => (i % 3, i / 10.0, i.toLong, s"extra$i"))
      .toDF("grp", "score", "vid", "payload")
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("vid").asc)
    // extra pass-through column -> no aggregate equivalent -> no fire
    val withExtra = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    assert(withExtra.queryExecution.executedPlan.toString
      .contains("Window"))
    assert(withExtra.count() === 9)
    // rank() has tie semantics the heap cannot reproduce -> no fire
    val ranked = df.select(col("grp"), col("score"), col("vid"))
      .withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    assert(ranked.queryExecution.executedPlan.toString.contains("Window"))
    // kill switch
    ext.conf.set("spark.graft.rewriteWindowTopKDistinct", "false")
    try {
      val off = topkWindow(scored(ext), 5)
      assert(off.queryExecution.executedPlan.toString.contains("Window"))
      assert(off.count() === 15)
    } finally ext.conf.set("spark.graft.rewriteWindowTopKDistinct", "true")
  }
}
