package graft.sources

/** Cross-cutting phase-cost registry for bench attribution.
  *
  * Harness-heavy queries (the TCP socket replay, the retract changelog)
  * spend wall-clock in phases a plan audit cannot see — feeding a socket,
  * waiting for a micro-batch drain, diffing a changelog per batch. Those
  * operators record their phase costs here and [[graft.Bench]] surfaces
  * them as compact fields inside its final stdout JSON line: the one
  * channel the driver retains in full (it keeps only the tail of stdout,
  * so the longer stderr attribution lines never reach the round artifact).
  */
object PhaseStats {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Keep the MINIMUM observed value across runs: the bench re-runs heavy
    * queries best-of-2 and reports the min pass, so the phase split should
    * describe that same best pass (first-pass-only costs like the fixture
    * id scan then show up as ~0, which is exactly their steady-state). */
  def recordMin(name: String, sec: Double): Unit =
    m.merge(name, sec, (a, b) => math.min(a, b))

  /** Accumulate (per-batch costs summed across a query's batches). */
  def add(name: String, sec: Double): Unit =
    m.merge(name, sec, (a, b) => a + b)

  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }

  def clear(): Unit = m.clear()
}
