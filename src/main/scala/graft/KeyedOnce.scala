package graft

/** A keyed exactly-once memo whose side-effecting body runs AT MOST
  * ONCE per key even under racing threads.
  *
  * `TrieMap.getOrElseUpdate` evaluates its default lazily but NOT
  * exclusively: two threads racing on the same absent key may both
  * run the body, and for bodies that write a deterministic physical
  * path (the z-order layout, the fecha warehouse) the second run
  * deletes+rewrites files the first run's returned handle already
  * points at (advisor find, round 11). Here
  * `ConcurrentHashMap.computeIfAbsent` installs a holder cell
  * atomically — its mapping function allocates only, never runs the
  * body — and the cell's `lazy val` then runs the body under the
  * cell's own monitor, OUTSIDE the map's bin lock: exactly-once, no
  * map-wide stall while a multi-second write runs, and safe against
  * re-entrant use of the same map from inside a body.
  */
final class KeyedOnce[K, V] {
  private final class Cell(body: () => V) {
    // the thunk is nulled once evaluated: a retained `body` field
    // would pin the builder closure's whole captured scope for the
    // application lifetime — the TrieMap this class replaced stored
    // only the computed value (reviewer find, round 11)
    private[this] var thunk: () => V = body
    lazy val value: V = { val v = thunk(); thunk = null; v }
  }
  private val cells = new java.util.concurrent.ConcurrentHashMap[K, Cell]()

  def apply(key: K)(body: => V): V =
    cells.computeIfAbsent(key, _ => new Cell(() => body)).value

  /** Drop entries whose key matches (listener-driven eviction — the
    * [[graft.queries.Tables]] application-end cleanup). An entry mid-
    * initialization stays referenced by its in-flight caller, so
    * removal never strands a running body.
    *
    * CONTRACT: terminal cleanup ONLY. Removing a key whose body may
    * still be STARTED lets the next `apply` install a fresh Cell and
    * run the side-effecting body a second time, concurrently with an
    * in-flight first run — the exact delete+rewrite race this class
    * exists to prevent (advisor find, round 11). The sole intended
    * caller is an application-end listener, after which no body for a
    * matching key can begin. */
  def removeKeys(p: K => Boolean): Unit = {
    cells.keySet().removeIf(k => p(k)); ()
  }

  /** Snapshot of the installed keys (spec introspection — the
    * cold-daily contract asserts a fresh session's memo domain stays
    * empty). Includes keys whose body is still in flight. */
  private[graft] def keys: Seq[K] = {
    import scala.jdk.CollectionConverters._
    cells.keySet().asScala.toSeq
  }
}
