package graft.norm

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** X7 date helpers (reference main.py:201-209, 1527-1531). */
class DatesSpec extends AnyFunSuite {

  test("yesterday in DD/MM/YYYY") {
    assert(Dates.yesterday(LocalDate.of(2024, 1, 16)) === "15/01/2024")
    assert(Dates.yesterday(LocalDate.of(2024, 3, 1)) === "29/02/2024") // leap
    assert(Dates.yesterday(LocalDate.of(2024, 1, 1)) === "31/12/2023")
  }

  test("day-first to ISO; garbage -> None") {
    assert(Dates.dayFirstToIso("15/01/2024") === Some("2024-01-15"))
    assert(Dates.dayFirstToIso(" 05/02/2024 ") === Some("2024-02-05"))
    assert(Dates.dayFirstToIso("2024-01-15") === None)
    assert(Dates.dayFirstToIso("31/02/2024") === None)
    assert(Dates.dayFirstToIso("junk") === None)
  }
}
