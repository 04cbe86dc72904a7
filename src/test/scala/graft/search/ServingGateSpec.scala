package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** The admission-gate invariants: concurrency never exceeds the
  * permit count, the wait queue is bounded, overflow rejects
  * immediately and is counted, admitted work all completes, and
  * engine failures release their permit.
  */
class ServingGateSpec extends AnyFunSuite {

  test("concurrency is bounded, overflow rejects, admitted work completes") {
    val gate = new ServingGate(2, 2)
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val completed = new java.util.concurrent.atomic.AtomicInteger(0)
    val rejected = new java.util.concurrent.atomic.AtomicInteger(0)
    // deterministic: admitted bodies BLOCK on a latch the test holds
    // until every outcome is decided (no sleep-length scheduling race
    // — a descheduled late thread cannot sneak into a freed permit,
    // because no permit frees before the latch opens)
    val release = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 10).map { _ =>
      new Thread(() => {
        gate {
          val n = inFlight.incrementAndGet()
          maxSeen.accumulateAndGet(n, (a: Int, b: Int) => math.max(a, b))
          release.await()
          inFlight.decrementAndGet()
        } match {
          case Some(_) => completed.incrementAndGet()
          case None    => rejected.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start())
    // 2 hold permits (blocked in the body), 2 hold queue slots
    // (blocked in acquire), 6 reject — spin until the rejections land
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (gate.rejected < 6L && System.nanoTime() < deadline)
      Thread.sleep(5)
    assert(gate.rejected === 6L)
    release.countDown()
    threads.foreach(_.join())
    assert(maxSeen.get() <= 2, s"saw ${maxSeen.get()} concurrent bodies")
    // 2 ran + 2 queued = 4 admitted; 6 turned away at the door
    assert(completed.get() === 4)
    assert(rejected.get() === 6)
    assert(gate.admitted === 4L)
  }

  test("an interrupted waiter frees its queue slot and counts as cancelled") {
    val gate = new ServingGate(1, 1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => { gate { release.await() }; () })
    holder.start()
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (gate.admitted < 1L && System.nanoTime() < deadline) Thread.sleep(5)
    // a waiter takes the ONE queue slot, then gets interrupted
    val waiterOutcome = new java.util.concurrent.atomic.AtomicReference[String]("")
    val waiter = new Thread(() => {
      waiterOutcome.set(if (gate(42).isEmpty) "rejected" else "served")
    })
    waiter.start()
    while (waiter.getState != Thread.State.WAITING &&
      System.nanoTime() < deadline) Thread.sleep(5)
    waiter.interrupt()
    waiter.join(30000)
    assert(waiterOutcome.get() === "rejected")
    // counted as a cancellation, NOT a capacity rejection — the
    // overload diagnostic stays a pure queue-depth signal
    assert(gate.cancelled === 1L)
    assert(gate.rejected === 0L)
    // the queue slot must be FREE again: a new waiter queues (not
    // rejects) and is served once the holder releases
    val late = new Thread(() => {
      waiterOutcome.set(if (gate(7).isDefined) "late-served" else "late-rejected")
    })
    late.start()
    while (late.getState != Thread.State.WAITING &&
      System.nanoTime() < deadline) Thread.sleep(5)
    release.countDown()
    late.join(30000); holder.join(30000)
    assert(waiterOutcome.get() === "late-served")
  }

  test("an uncontended gate admits everything with zero rejections") {
    val gate = new ServingGate(4, 0)
    val results = (0 until 20).map(i => gate(i * 2))
    assert(results.flatten === (0 until 20).map(_ * 2))
    assert(gate.rejected === 0L)
    assert(gate.admitted === 20L)
  }

  test("a failing body releases its permit and propagates") {
    val gate = new ServingGate(1, 0)
    intercept[RuntimeException](gate { throw new RuntimeException("boom") })
    // the permit must be free again
    assert(gate(41 + 1) === Some(42))
  }

  test("sizing validation fails loud") {
    intercept[IllegalArgumentException](new ServingGate(0, 4))
    intercept[IllegalArgumentException](new ServingGate(4, -1))
  }
}
