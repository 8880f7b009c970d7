package graft

import org.scalatest.funsuite.AnyFunSuite

/** The official bench record must be clobber-proof (round-11 verdict
  * item 2): `BENCH_RESULT.json` was destroyed twice in round 11 by
  * non-official runs (a single-query sf1.0 measurement, a judge
  * sf0.001 probe) because the write path was unconditional. Only the
  * driver's configuration — full headline set at sf0.1 — may write the
  * canonical file; everything else is suffixed.
  */
class BenchRecordSpec extends AnyFunSuite {

  test("only a full-set sf0.1 run writes the canonical record") {
    assert(Bench.resultPath("/root/testdata/sf0.1", partial = false)
      == "BENCH_RESULT.json")
    // trailing slash must not flip the decision (same normalization
    // discipline as the floors gate, ADVICE r9)
    assert(Bench.resultPath("/root/testdata/sf0.1/", partial = false)
      == "BENCH_RESULT.json")
  }

  test("non-sf0.1 runs write a suffixed record") {
    assert(Bench.resultPath("/root/testdata/sf0.001", partial = false)
      == "BENCH_RESULT.sf0.001.json")
    assert(Bench.resultPath("/tmp/scale_sf1.0", partial = false)
      == "BENCH_RESULT.scale_sf1.0.json")
  }

  test("a scratch directory merely NAMED sf0.1 is not official (ADVICE r12)") {
    // basename collision: divergent data in /tmp/foo/sf0.1 must not
    // clobber the canonical record — the gate is the exact official path
    assert(Bench.resultPath("/tmp/foo/sf0.1", partial = false)
      == "BENCH_RESULT.sf0.1.json")
  }

  test("micro-floors are clamped to 1 s in the gate denominator") {
    // round-12 verdict item 2: q226's 0.59 s floor read ratio 1.93 on a
    // 0.55 s wobble; the clamp makes sub-second floors report
    // "best, in seconds" instead of a noise-amplified ratio
    assert(Bench.effectiveFloor(0.59) == 1.0)
    assert(Bench.effectiveFloor(0.12) == 1.0)
    assert(Bench.effectiveFloor(5.76) == 5.76)
  }

  test("SPARK_GRAFT_BENCH_ONLY runs never write the canonical record") {
    assert(Bench.resultPath("/root/testdata/sf0.1", partial = true)
      == "BENCH_RESULT.sf0.1.partial.json")
    assert(Bench.resultPath("/tmp/scale_sf1.0", partial = true)
      == "BENCH_RESULT.scale_sf1.0.partial.json")
  }
}
