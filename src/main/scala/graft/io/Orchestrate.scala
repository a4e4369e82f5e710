package graft.io

import scala.util.{Failure, Success, Try}
import scala.util.control.NonFatal

/** Driver-level run orchestration (R1/R3):
  *
  *   - [[retry]] — bounded exponential-backoff retry around one
  *     action, the reference's tenacity decorator
  *     (main.py:535-542: `stop_after_attempt(3)`,
  *     `wait_exponential(multiplier=2, min=4, max=40)`,
  *     `retry_if_exception_type(...)`, `before_sleep` warning);
  *   - [[continueOnFailure]] — the per-dataset loop where one failing
  *     report is logged, a recovery hook runs, and the run CONTINUES
  *     with the remaining datasets (main.py:1154-1167).
  *
  * These are deliberately driver-side: Spark's own task retries cover
  * executor-level faults, but a daily batch also needs dataset-level
  * resilience — an unreadable drop or a flaky sink connection must
  * not abort the other tables' loads.
  */
object Orchestrate {

  /** R1 retry policy. Delay before retrying the n-th failed attempt is
    * `clamp(multiplierMs * 2^(n-1), minDelayMs, maxDelayMs)` —
    * tenacity's wait_exponential with the reference's constants
    * (multiplier=2 s, min=4 s, max=40 s). `retryOn` narrows the retried
    * class like retry_if_exception_type; `onRetry` is the before_sleep
    * warning hook; `sleep` is injectable so specs run without waiting. */
  final case class RetryPolicy(
      attempts: Int = 3,
      multiplierMs: Long = 2000,
      minDelayMs: Long = 4000,
      maxDelayMs: Long = 40000,
      retryOn: Throwable => Boolean = NonFatal(_),
      onRetry: (Int, Throwable) => Unit = (_, _) => (),
      sleep: Long => Unit = Thread.sleep) {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    def delayMs(failedAttempt: Int): Long =
      math.min(maxDelayMs,
        math.max(minDelayMs, multiplierMs << (failedAttempt - 1)))
  }

  /** Run `action`, retrying per `policy`. Non-retryable errors and the
    * final attempt's error propagate unchanged. */
  def retry[A](policy: RetryPolicy = RetryPolicy())(action: => A): A = {
    var attempt = 1
    while (true) {
      try return action
      catch {
        case e: Throwable if attempt < policy.attempts && policy.retryOn(e) =>
          policy.onRetry(attempt, e)
          policy.sleep(policy.delayMs(attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One dataset's outcome in a continue-on-failure run. */
  final case class Outcome[A](name: String, result: Try[A]) {
    def ok: Boolean = result.isSuccess
  }

  /** R3: run `load` for every named dataset, in order. A failure is
    * recorded as a [[Outcome]], the `onFailure` hook runs (the
    * reference's navigate-back-before-next-report recovery,
    * main.py:1161-1166), and the loop continues — one bad report never
    * kills the daily run. Fatal JVM errors still propagate. */
  def continueOnFailure[I, A](datasets: Seq[(String, I)])(
      load: (String, I) => A,
      onFailure: (String, Throwable) => Unit = (_, _) => ()): Seq[Outcome[A]] =
    datasets.map { case (name, input) =>
      try Outcome(name, Success(load(name, input)))
      catch {
        case NonFatal(e) =>
          onFailure(name, e)
          Outcome[A](name, Failure(e))
      }
    }
}
