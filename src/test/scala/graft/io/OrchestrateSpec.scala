package graft.io

import scala.util.Failure

import org.scalatest.funsuite.AnyFunSuite

/** R1 retry + R3 continue-on-failure (reference main.py:535-542,
  * 1154-1167). Pure driver logic — no SparkSession needed. */
class OrchestrateSpec extends AnyFunSuite {
  import Orchestrate._

  private def noSleep(delays: collection.mutable.Buffer[Long]) =
    RetryPolicy(sleep = delays += _)

  test("flaky action succeeds on attempt 2; one backoff sleep happened") {
    val delays = collection.mutable.Buffer.empty[Long]
    var calls = 0
    val out = retry(noSleep(delays)) {
      calls += 1
      if (calls < 2) throw new RuntimeException("transient")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 2)
    assert(delays.toSeq === Seq(4000L)) // 2s * 2^0, clamped up to min 4s
  }

  test("attempts exhaust: the third failure propagates after two sleeps") {
    val delays = collection.mutable.Buffer.empty[Long]
    var calls = 0
    val e = intercept[RuntimeException] {
      retry(noSleep(delays)) { calls += 1; throw new RuntimeException(s"boom $calls") }
    }
    assert(e.getMessage === "boom 3") // the LAST attempt's error
    assert(calls === 3)
    assert(delays.toSeq === Seq(4000L, 4000L)) // 2s, 4s -> both clamp to 4s
  }

  test("exponential schedule clamps to [min, max]") {
    val p = RetryPolicy(attempts = 10)
    assert(p.delayMs(1) === 4000L)  // 2s  -> min-clamped
    assert(p.delayMs(2) === 4000L)  // 4s
    assert(p.delayMs(3) === 8000L)
    assert(p.delayMs(4) === 16000L)
    assert(p.delayMs(5) === 32000L)
    assert(p.delayMs(6) === 40000L) // 64s -> max-clamped
  }

  test("non-matching errors are not retried (retry_if_exception_type)") {
    var calls = 0
    val p = RetryPolicy(retryOn = _.isInstanceOf[java.io.IOException],
      sleep = _ => ())
    intercept[IllegalStateException] {
      retry(p) { calls += 1; throw new IllegalStateException("not transient") }
    }
    assert(calls === 1)
  }

  test("one failing dataset doesn't stop the rest; hook fires once") {
    val recovered = collection.mutable.Buffer.empty[String]
    val outcomes = continueOnFailure(Seq(
      "a" -> 1, "bad" -> -1, "c" -> 3))(
      load = (_, v) => if (v < 0) throw new RuntimeException("unreadable") else v * 10,
      onFailure = (name, _) => recovered += name)
    assert(outcomes.map(_.name) === Seq("a", "bad", "c"))
    assert(outcomes.map(_.ok) === Seq(true, false, true))
    assert(outcomes.collect { case Outcome(_, scala.util.Success(v)) => v }
      === Seq(10, 30))
    assert(outcomes(1).result.isInstanceOf[Failure[_]])
    assert(recovered.toSeq === Seq("bad"))
  }
}
