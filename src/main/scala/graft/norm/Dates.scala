package graft.norm

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** X7 date helpers (reference main.py:201-209 `calcular_fecha_ayer`
  * and main.py:1527-1531 DD/MM/YYYY → ISO for the DELETE predicate).
  * Driver-side run parameters — plain Scala, no Spark. */
object Dates {

  // STRICT resolver: '31/02/2024' must be garbage (pandas coerce
  // semantics), not silently clamped to Feb 29. STRICT requires the
  // era-free 'uuuu' year field.
  private val DayFirst = DateTimeFormatter.ofPattern("dd/MM/uuuu")
    .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  /** Yesterday as `DD/MM/YYYY` — the run's logical date
    * (reference main.py:201-209). */
  def yesterday(today: LocalDate = LocalDate.now()): String =
    today.minusDays(1).format(DayFirst)

  /** `DD/MM/YYYY` → ISO `YYYY-MM-DD` (reference main.py:1527-1531);
    * returns None on garbage instead of raising. */
  def dayFirstToIso(s: String): Option[String] =
    try Some(LocalDate.parse(s.trim, DayFirst).toString)
    catch { case _: java.time.format.DateTimeParseException => None }
}
