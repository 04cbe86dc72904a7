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
    val started = new java.util.concurrent.CountDownLatch(10)
    val threads = (0 until 10).map { _ =>
      new Thread(() => {
        started.countDown()
        started.await() // all 10 arrive together
        gate {
          val n = inFlight.incrementAndGet()
          maxSeen.accumulateAndGet(n, (a: Int, b: Int) => math.max(a, b))
          Thread.sleep(150)
          inFlight.decrementAndGet()
        } match {
          case Some(_) => completed.incrementAndGet()
          case None    => rejected.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(maxSeen.get() <= 2, s"saw ${maxSeen.get()} concurrent bodies")
    // 2 run + 2 queue = 4 admitted; 6 turned away at the door
    assert(completed.get() === 4)
    assert(rejected.get() === 6)
    assert(gate.rejected === 6L)
    assert(gate.admitted === 4L)
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
