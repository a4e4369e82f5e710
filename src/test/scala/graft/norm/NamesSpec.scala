package graft.norm

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** P1 column-name normalization, cases from reference main.py:386-422.
  * Properties use plain ScalaCheck generators (the scalatest bridge
  * artifact isn't available offline). */
class NamesSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("reference cases (main.py:386-422)") {
    assert(Names.normalizeName("% In") === "pct_in")
    assert(Names.normalizeName("Campaña") === "campana")
    assert(Names.normalizeName("Tiempo Medio De Respuesta In") ===
      "tiempo_medio_de_respuesta_in")
    assert(Names.normalizeName("% In Rechazadas / Ignoradas") ===
      "pct_in_rechazadas_ignoradas")
    assert(Names.normalizeName("Agente") === "agente")
    assert(Names.normalizeName("ID") === "id")
  }

  test("accent stripping (á->a, ñ->n, NFKD)") {
    assert(Names.normalizeName("ñÁéÍóÚü") === "naeiouu")
    assert(Names.normalizeName("Café Niño") === "cafe_nino")
  }

  test("special chars collapse to single underscore, trimmed") {
    assert(Names.normalizeName("  a -- b  ") === "a_b")
    assert(Names.normalizeName("__x__") === "x")
    assert(Names.normalizeName("a(b)c") === "a_b_c")
  }

  test("property: output is always sql-safe snake_case") {
    for (s <- samples(Gen.asciiPrintableStr)) {
      val n = Names.normalizeName(s)
      assert(n.matches("[a-z0-9_]*"), s"input '$s' -> '$n'")
      assert(!n.startsWith("_") && !n.endsWith("_"), s"input '$s' -> '$n'")
      assert(!n.contains("__"), s"input '$s' -> '$n'")
    }
  }

  test("property: idempotent") {
    for (s <- samples(Gen.asciiPrintableStr)) {
      val once = Names.normalizeName(s)
      assert(Names.normalizeName(once) === once, s"input '$s'")
    }
  }
}
