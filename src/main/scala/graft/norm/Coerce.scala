package graft.norm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lenient, never-failing value coercions (`Column => Column`).
  *
  * These re-express the reference's scalar-function surface
  * (reference main.py:425-528) as Catalyst expression trees built
  * only from `org.apache.spark.sql.functions` — fully
  * whole-stage-codegen'd, no UDFs, so at 100 TB they run inside the
  * scan/project stage at vectorized-reader speed.
  *
  * NOTE: all of these assume non-ANSI cast semantics
  * (`spark.sql.ansi.enabled=false`): a failed string→number cast
  * yields NULL, which we then default. Sessions built via
  * [[graft.queries.Tables.prep]] pin this.
  */
object Coerce {

  /** Null-ish sentinel tokens, compared EXACTLY (case-sensitive) after
    * trim, matching the reference (main.py:441-444: `-`, ``, `nan`,
    * `None`). Other casings (`NONE`, `NaN`) fall through to the
    * numeric branch, where the failed cast yields 0.0 anyway — same
    * observable result for every input except literal `'NaN'`-style
    * floats, which the reference returns as NaN and we map to 0.0
    * (documented deviation: NaN is never a useful duration). */
  private val NullTokens: Seq[Any] = Seq("-", "", "nan", "None")

  /** Strict decimal/scientific-notation matcher guarding every
    * plain-number branch. Spark's non-ANSI string→double cast
    * delegates to Java `Double.parseDouble` plus special literals, so
    * it accepts Java-only forms — `'1d'`, `'1f'`, hex floats like
    * `'0x1p3'`, `'inf'` — that the reference's Python `float()`
    * (main.py:459) and the DuckDB oracle's `try_cast` both reject.
    * The guard pins all engines to the common subset: anything
    * outside plain decimal/scientific notation coerces to the
    * default. (Infinity LITERALS — 'inf', 'Infinity' — are rejected
    * by the grammar; overflow forms like '1e999' match it and yield
    * Infinity IDENTICALLY in Spark cast, DuckDB try_cast, and Python
    * float(), so no guard is needed there.) */
  private[graft] val NumRe =
    "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  /** Strip ALL leading/trailing whitespace/control chars (<= U+0020),
    * not just spaces: Spark's `trim()` removes only ' ', but the
    * reference's Python `strip()` and the native expression's Java
    * `String.trim` both strip tabs/newlines too — `'7.5\t'` must
    * coerce to 7.5 in every implementation, and a trailing `'\n'`
    * must not sneak past NumRe via Java regex's before-final-newline
    * `$` match. */
  private def wsTrim(c: Column): Column =
    regexp_replace(c, "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")

  /** A `H`/`M`/`S` piece is valid iff it parses as a Python `int()`
    * does in the reference (main.py:452-457: `map(int, parts)`) —
    * optional sign, digits only, surrounding whitespace tolerated.
    * `'1.5'` is NOT a valid piece (reference raises → 0.0). */
  private def intPiece(parts: Column, i: Int): Column = {
    val p = wsTrim(element_at(parts, i))
    when(p.rlike("^[+-]?[0-9]+$"), p.cast("double"))
  }

  /** `HH:MM:SS` / `HH:MM` / plain-number string → decimal minutes.
    * Total function, never errors (reference main.py:425-462):
    *   - NULL / `-` / `''` / `nan` / `None`  → 0.0
    *   - `H:M:S` (integer pieces)            → H*60 + M + S/60
    *   - `H:M` (integer pieces)              → H*60 + M
    *   - plain number                        → its double value
    *   - anything unparseable (any piece)    → 0.0
    */
  def timeToMinutes(c: Column): Column = {
    val s = wsTrim(c.cast("string"))
    val parts = split(s, ":")
    val p1 = intPiece(parts, 1)
    val p2 = intPiece(parts, 2)
    val p3 = intPiece(parts, 3)
    val plain = when(s.rlike(NumRe), s.cast("double"))
    when(c.isNull || s.isin(NullTokens: _*), lit(0.0))
      .when(
        s.contains(":"),
        when(size(parts) === 3,
          when(p1.isNull || p2.isNull || p3.isNull, lit(0.0))
            .otherwise(p1 * 60 + p2 + p3 / 60))
          .when(size(parts) === 2,
            when(p1.isNull || p2.isNull, lit(0.0)).otherwise(p1 * 60 + p2))
          .otherwise(lit(0.0)))
      .otherwise(
        when(plain.isNull, lit(0.0)).otherwise(plain))
  }

  /** Lenient double: garbage/NULL/NaN → 0.0
    * (reference main.py:516-528, `to_numeric(errors='coerce').fillna(0.0)`). */
  def lenientDouble(c: Column): Column = {
    val s = wsTrim(c.cast("string"))
    val d = when(s.rlike(NumRe), s.cast("double"))
    when(d.isNull, lit(0.0)).otherwise(d)
  }

  /** Lenient int: parse as double then truncate toward zero, garbage → 0
    * (reference main.py:501-513, `.fillna(0).astype(int)` truncates).
    * Returns LONG — the reference's `int` is int64; a 32-bit cast
    * would silently WRAP values beyond ±2^31 (e.g. '3000000000' →
    * -1294967296) where both the reference and the DuckDB oracle keep
    * the value. Callers conforming to an INT-typed target schema cast
    * down explicitly there, where the DDL makes the range contract
    * visible. */
  def lenientInt(c: Column): Column =
    lenientDouble(c).cast("long")

  /** Day-first date parse, garbage → NULL (then droppable)
    * (reference main.py:1239/1295, `to_datetime(dayfirst=True)`). */
  def parseDateDayFirst(c: Column): Column = {
    val s = wsTrim(c.cast("string"))
    coalesce(to_date(s, "dd/MM/yyyy"), to_date(s, "d/M/yyyy"))
  }
}
