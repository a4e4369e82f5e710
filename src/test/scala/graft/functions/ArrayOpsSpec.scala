package graft.functions

import graft.SparkSpec

/** The native array kernels must agree exactly with the built-in
  * compositions they replace, and run inside whole-stage codegen. */
class ArrayOpsSpec extends SparkSpec {

  test("array_dot == aggregate(zip_with(...)) on random vectors") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT transform(sequence(1, 64), i -> sin(i * id + 1.0)) AS a,
        |       transform(sequence(1, 64), i -> cos(i * id + 2.0)) AS b
        |FROM range(50)""".stripMargin)
    df.createOrReplaceTempView("vecs_ops")
    val rows = spark.sql(
      """SELECT array_dot(a, b) AS fast,
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, x) -> acc + x)
        |    AS slow
        |FROM vecs_ops""".stripMargin).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("sorted_intersect_count == size(array_intersect(...)) on sorted sets") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT
        |  array_sort(array_distinct(
        |    transform(sequence(1, 40), i -> cast(i * (id + 2) % 37 AS BIGINT))))
        |    AS a,
        |  array_sort(array_distinct(
        |    transform(sequence(1, 40), i -> cast(i * (id + 5) % 41 AS BIGINT))))
        |    AS b
        |FROM range(50)""".stripMargin)
    df.createOrReplaceTempView("sets_ops")
    val rows = spark.sql(
      """SELECT sorted_intersect_count(a, b) AS fast,
        |       size(array_intersect(a, b)) AS slow
        |FROM sets_ops""".stripMargin).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("sorted_intersect_min == array_min(filter(a, d -> " +
      "array_contains(b, d))) on sorted sets, incl. the disjoint NULL") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT sorted_intersect_min(a, b) AS fast,
        |       array_min(filter(a, d -> array_contains(b, d))) AS slow
        |FROM (SELECT
        |  array_sort(array_distinct(
        |    transform(sequence(1, 40), i -> cast(i * (id + 2) % 37 AS BIGINT))))
        |    AS a,
        |  array_sort(array_distinct(
        |    transform(sequence(1, 40),
        |      i -> cast(i * (id + 5) % 41 + (id % 3) * 1000 AS BIGINT))))
        |    AS b
        |FROM range(60))""".stripMargin).collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getLong(0) === r.getLong(1))
    }
    // the id%3 shift above makes some pairs fully disjoint — prove the
    // NULL case was actually exercised
    assert(rows.exists(_.isNullAt(0)) && rows.exists(!_.isNullAt(0)))
  }

  test("empty and null inputs") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT array_dot(cast(array() as array<double>),
        |                 cast(array() as array<double>)) AS e,
        |  array_dot(cast(null as array<double>),
        |            cast(array(1.0) as array<double>)) AS n,
        |  sorted_intersect_count(cast(array() as array<bigint>),
        |                         cast(array(1) as array<bigint>)) AS z
        |""".stripMargin).head
    assert(r.getDouble(0) === 0.0)
    assert(r.isNullAt(1))
    assert(r.getInt(2) === 0)
  }

  test("bit_majority == 60 per-bit filter majority votes") {
    GraftFunctions.register(spark)
    val bitTerms = (0 until BitMajority.Bits).map { i =>
      s"CASE WHEN size(filter(hs, h -> (h >> $i) & 1 = 1)) * 2 > size(hs) " +
        s"THEN cast(${1L << i} as bigint) ELSE cast(0 as bigint) END"
    }.mkString(" + ")
    val rows = spark.sql(
      s"""SELECT bit_majority(hs) AS fast, ($bitTerms) AS slow
         |FROM (SELECT transform(sequence(1, 1 + cast(id AS INT) % 7),
         |        i -> xxhash64(concat('x', i, '_', id))) AS hs
         |      FROM range(50))""".stripMargin).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("kernels run inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT sum(array_dot(a, a)) AS s FROM (
        |  SELECT transform(sequence(1, 8), i -> cast(i * id AS DOUBLE)) AS a
        |  FROM range(100))""".stripMargin)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) HashAggregate.*array_dot""".r.findFirstIn(plan).isDefined,
      plan)
  }
}
