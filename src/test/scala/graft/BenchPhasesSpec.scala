package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-artifact attribution registry: thread-scoped recording,
  * retry-reset semantics, and no-op outside a begin/end scope (the Verify
  * and unit-test paths run the same instrumented code with zero
  * bookkeeping).
  */
class BenchPhasesSpec extends AnyFunSuite {

  test("recording is a no-op outside a begin/end scope") {
    BenchPhases.end() // ensure no scope leaks in from another test
    BenchPhases.add("staging", 1.0)
    val r = BenchPhases.timed("stream_wall")(21 * 2)
    assert(r == 42)
    assert(BenchPhases.snapshot("no_scope_q").isEmpty)
  }

  test("phases accumulate within a scope and sum repeated adds") {
    BenchPhases.begin("q_spec_a")
    try {
      BenchPhases.add("staging", 1.25)
      BenchPhases.add("staging", 0.75)
      BenchPhases.timed("stream_wall")(Thread.sleep(10))
    } finally BenchPhases.end()
    val ph = BenchPhases.snapshot("q_spec_a").get
    assert(ph("staging") == 2.0)
    assert(ph("stream_wall") >= 0.01)
    // after end(), the thread records nothing new
    BenchPhases.add("staging", 99.0)
    assert(BenchPhases.snapshot("q_spec_a").get("staging") == 2.0)
  }

  test("begin() discards the previous run's phases (budget-retry contract)") {
    BenchPhases.begin("q_spec_retry")
    BenchPhases.add("staging", 5.0)
    BenchPhases.end()
    BenchPhases.begin("q_spec_retry") // the retry: staging is cached, absent
    BenchPhases.add("stream_wall", 1.0)
    BenchPhases.end()
    val ph = BenchPhases.snapshot("q_spec_retry").get
    assert(!ph.contains("staging"))
    assert(ph("stream_wall") == 1.0)
  }

  test("scopes are per-thread: a worker records only its own query") {
    BenchPhases.begin("q_spec_main")
    try {
      val t = new Thread(() => {
        BenchPhases.begin("q_spec_worker")
        try BenchPhases.add("staging", 3.0)
        finally BenchPhases.end()
      })
      t.start(); t.join()
      BenchPhases.add("staging", 7.0)
    } finally BenchPhases.end()
    assert(BenchPhases.snapshot("q_spec_worker").get("staging") == 3.0)
    assert(BenchPhases.snapshot("q_spec_main").get("staging") == 7.0)
  }

  test("bench JSON strings survive control characters (the disk-full exception class)") {
    // r14: a multi-line SparkException in the errors field made the whole
    // artifact unparseable — the writer must escape every control char
    val nasty = "Job aborted:\n\tjava.io.IOException: No space left\rend\"q\\p"
    val json = s"""{"errors":{"q_x":${Bench.jsonString(nasty)}}}"""
    // strict round-trip through a real JSON parser (Spark's Jackson)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(json)
    assert(tree.get("errors").get("q_x").asText() === nasty,
      "escape must be lossless under a strict parser")
  }
}
