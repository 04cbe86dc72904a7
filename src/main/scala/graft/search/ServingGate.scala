package graft.search

/** Bounded admission for the serving fan-in (VERDICT r12 #8).
  *
  * The concurrent-serving measurement quantified the single-JVM
  * ceiling: 1→8 request threads buys ~3.8× throughput, 8→32 buys
  * nothing and inflates p95 ~8× — past the executor-slot saturation
  * point every extra in-flight request only queues INSIDE Spark's
  * scheduler, where it holds compile/scan resources and blows up the
  * tail. This gate keeps the excess OUTSIDE the engine:
  *
  *   - at most `maxConcurrent` requests execute (a fair semaphore —
  *     FIFO admission, no starvation under sustained overload);
  *   - at most `maxQueued` more wait for a permit (back-pressure);
  *   - anything beyond that is REJECTED IMMEDIATELY (`None` — the
  *     HTTP-429 semantics) and counted, so overload degrades by
  *     visible queue-depth rejection instead of tail blow-up.
  *
  * Sizing: `maxConcurrent` at the saturation knee the measurement
  * found (≈ executor slots / 4 on this workload; 8 on local[32]),
  * `maxQueued` at the same order — each waiter adds at most one
  * service time to the tail, so p95 stays within ~(1 + queue/permits)×
  * of the saturated-but-ungated level. The gate is engine-agnostic
  * (wraps any `=> T`); the serving layer applies it per request —
  * see ThroughputBench's gated N=32 row and `throughput_last.json`.
  */
final class ServingGate(maxConcurrent: Int, maxQueued: Int) {
  require(maxConcurrent >= 1, s"maxConcurrent must be >= 1 (got $maxConcurrent)")
  require(maxQueued >= 0, s"maxQueued must be >= 0 (got $maxQueued)")

  private val permits =
    new java.util.concurrent.Semaphore(maxConcurrent, true)
  private val queued = new java.util.concurrent.atomic.AtomicInteger(0)
  private val rejectedCount = new java.util.concurrent.atomic.AtomicLong(0L)
  private val cancelledCount = new java.util.concurrent.atomic.AtomicLong(0L)
  private val admittedCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Requests turned away at the door so far (the response-metadata
    * counter — the hot-bucket-cap diagnostics doctrine: a cap is
    * never silent). Queue-depth overload ONLY — client cancellations
    * count under [[cancelled]], so this stays a pure capacity signal
    * (r14, ADVICE: conflating the two made the overload diagnostic
    * read high under cancel-happy clients).
    */
  def rejected: Long = rejectedCount.get()

  /** Waiters interrupted mid-queue (client timeout/cancel) so far —
    * not served, but not a capacity rejection either.
    */
  def cancelled: Long = cancelledCount.get()

  /** Requests admitted (immediately or after queueing) so far. */
  def admitted: Long = admittedCount.get()

  /** Run `body` under admission: `Some(result)` if admitted (possibly
    * after bounded queueing), `None` if rejected because
    * `maxConcurrent` requests are in flight AND `maxQueued` more are
    * already waiting. Exceptions from `body` propagate after the
    * permit is released (an engine failure is not an admission
    * concern).
    */
  def apply[T](body: => T): Option[T] = {
    // the zero-timeout form HONORS fairness (bare tryAcquire() barges
    // past the FIFO queue — under rejection-and-retry load the
    // retrying clients would steal every freed permit and starve the
    // queued waiters into exactly the tail blow-up this gate exists
    // to prevent; measured: barging pushed gated p95 PAST the
    // ungated level before this fix)
    val fast =
      try permits.tryAcquire(0L, java.util.concurrent.TimeUnit.NANOSECONDS)
      catch { case _: InterruptedException =>
        Thread.currentThread().interrupt(); false }
    if (fast) {
      admittedCount.incrementAndGet()
      try Some(body) finally permits.release()
    } else {
      // full: join the bounded wait queue or reject. The counter is
      // reserved BEFORE waiting so at most maxQueued threads ever
      // block here (a reserve-then-check would admit stampedes), and
      // released in a finally — a waiter interrupted mid-acquire
      // (client timeout/cancel) must not leak its slot, or the queue
      // silently shrinks toward reject-on-saturation. An interrupted
      // wait is counted as a CANCELLATION, not a rejection — the
      // request is not served, but the gate was not over capacity.
      val q = queued.incrementAndGet()
      if (q > maxQueued) {
        queued.decrementAndGet()
        rejectedCount.incrementAndGet()
        None
      } else {
        val acquired =
          try { permits.acquire(); true }
          catch { case _: InterruptedException =>
            Thread.currentThread().interrupt(); false }
          finally queued.decrementAndGet()
        if (!acquired) {
          cancelledCount.incrementAndGet()
          None
        } else {
          admittedCount.incrementAndGet()
          try Some(body) finally permits.release()
        }
      }
    }
  }
}
