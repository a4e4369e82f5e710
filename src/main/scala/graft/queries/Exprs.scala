package graft.queries

/** Shared SQL-expression builders used across the query modules —
  * ONE definition for each construct that must stay value-identical
  * between its call sites (and, for the hash, with the DuckDB
  * oracles' `('0x' || substr(md5(..)))::BIGINT` mirror). */
private[graft] object Exprs {

  /** 60-bit deterministic hash of a string expression, identical in
    * Spark and DuckDB (md5 prefix, hex->int; 15 hex chars = 60 bits
    * so it fits a signed 64-bit int on both engines). Used for
    * shingle hashing, deterministic sampling/splits, and k-means
    * seed selection. */
  def hash60(e: String): String =
    s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"

  /** Distinct n-token grams of a string-array column: the shared
    * shape behind the dedup shingles (n=3) and the decontamination
    * grams (n=4). Generated from `n`, so every width is real. */
  def tokenNgrams(c: String, n: Int): String = {
    val terms = (0 until n)
      .map(o => if (o == 0) s"element_at($c, i)" else s"element_at($c, i + $o)")
      .mkString(", ")
    s"""array_distinct(
       |  CASE WHEN size($c) >= $n THEN
       |    transform(sequence(1, size($c) - ${n - 1}),
       |      i -> concat_ws(' ', $terms))
       |  ELSE cast(array() as array<string>) END)""".stripMargin
  }
}
