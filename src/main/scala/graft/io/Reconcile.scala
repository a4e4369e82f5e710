package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table reconciliation — the data-quality check every large loaded
  * table needs (did the backfill reproduce prod? did the re-run
  * replace what it should?): compare two loads PER PARTITION via
  * (row count, order-insensitive content hash) digests, so mismatched
  * partitions are identified without joining or shuffling either
  * table row-level.
  *
  * Scale shape: each side reduces to one digest row per partition
  * value in a single map-side-combining aggregate (count + xor of
  * per-row hashes — xor is commutative/associative, so the digest is
  * insensitive to row order and partial-aggregation layout); the
  * full-outer join then runs over two partition-count-sized tables.
  * At 100 TB this is two scans and a toy join — row-level drill-down
  * (an except/anti-join) is then scoped to the FLAGGED partitions
  * only, never the whole table. Same xor-digest trick as the q88
  * fixpoint check; two equal-count partitions with equal xor differ
  * only on a 2^-60 hash collision.
  *
  * The row hash is the engine-portable md5-prefix
  * ([[graft.queries.Exprs.hash60]] mirrors DuckDB's
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`) over the
  * ``-joined hash columns. CALLER CONTRACT: hash columns must
  * be in canonical cross-engine string form (cast doubles to
  * exact-typed values first — engines do not agree on float
  * formatting), and must not contain the `` separator.
  */
object Reconcile {

  /** One side's per-partition digest. */
  private def digest(df: DataFrame, partitionCol: String,
      hashCols: Seq[String], side: String): DataFrame =
    df.withColumn("__h", expr(
        graft.queries.Exprs.hash60(s"concat_ws('', ${
          hashCols.map(c => s"cast($c as string)").mkString(", ")})")))
      .groupBy(col(partitionCol))
      .agg(count(lit(1)).as(s"n_$side"),
        expr("bit_xor(__h)").as(s"h_$side"))

  /** Compare loads `a` and `b`: one row per partition value present
    * in either side, with counts and a `status` of `match`,
    * `count_mismatch`, `content_mismatch`, `missing_a`, or
    * `missing_b`. */
  def compare(a: DataFrame, b: DataFrame, partitionCol: String,
      hashCols: Seq[String]): DataFrame =
    digest(a, partitionCol, hashCols, "a")
      .join(digest(b, partitionCol, hashCols, "b"),
        Seq(partitionCol), "full_outer")
      .withColumn("status",
        when(col("n_a").isNull, "missing_a")
          .when(col("n_b").isNull, "missing_b")
          .when(col("n_a") =!= col("n_b"), "count_mismatch")
          .when(col("h_a") =!= col("h_b"), "content_mismatch")
          .otherwise("match"))
      .select(col(partitionCol), col("n_a"), col("n_b"), col("status"))
}
