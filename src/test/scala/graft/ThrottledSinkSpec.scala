package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{MemoryEventSink, ThrottledEventSink}

/** Backpressure semantics of the Kinesis-quota sink decorator, on virtual
  * time: throttled batches drain under backoff without loss or reorder, and
  * exhausted retries surface the throughput error instead of dropping data.
  */
class ThrottledSinkSpec extends AnyFunSuite {

  private def events(n: Int, from: Int = 0): Seq[(String, String)] =
    (from until from + n).map(i => ("hr.employee", s"""{"i":$i}"""))

  test("burst over the shard quota drains fully, in order, under backoff") {
    var now = 0L // virtual nanos; sleep advances it
    val inner = new MemoryEventSink
    val sink = new ThrottledEventSink(inner, capacityPerSec = 1000,
      maxRetries = 10, backoffMs = 1000L,
      nanoTime = () => now, sleep = ms => now += ms * 1000000L)

    sink.append(events(2500))

    assert(inner.size == 2500)
    assert(sink.throttleCount >= 2, s"2500 records at 1000/s need >=2 waits, got ${sink.throttleCount}")
    // prefix-accept keeps shard order across retries
    assert(inner.all.map(_.envelope) == events(2500).map(_._2))
    // token bucket, not batch-per-second: ~1.5s of virtual backoff suffices
    assert(now <= 3L * 1000000000L, s"drained too slowly: ${now / 1e9}s virtual")
  }

  test("exhausted retries raise ProvisionedThroughputExceeded, nothing is dropped silently") {
    var now = 0L
    val inner = new MemoryEventSink
    val sink = new ThrottledEventSink(inner, capacityPerSec = 10,
      maxRetries = 2, backoffMs = 1000L,
      nanoTime = () => now, sleep = _ => ()) // sleeper that never frees quota

    val ex = intercept[IllegalStateException](sink.append(events(25)))
    assert(ex.getMessage.contains("ProvisionedThroughputExceeded"))
    assert(inner.size == 10) // the accepted prefix made it through
  }

  test("steady rate under the quota never throttles") {
    var now = 0L
    val inner = new MemoryEventSink
    val sink = new ThrottledEventSink(inner, capacityPerSec = 1000,
      nanoTime = () => now, sleep = ms => now += ms * 1000000L)
    (0 until 10).foreach { i =>
      sink.append(events(100, from = i * 100))
      now += 200L * 1000000L // 100 records per 200ms = 500/s
    }
    assert(inner.size == 1000 && sink.throttleCount == 0)
  }
}
