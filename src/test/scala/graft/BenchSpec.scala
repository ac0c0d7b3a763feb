package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench self-adjudication trigger. Round-10 driver run let
  * q26_asof through unadjudicated at 0.333 s vs a 0.147 s baseline
  * (2.27x) because the old predicate gated on the DIFFERENCE > 0.2 s
  * (delta was 0.186 s); the trigger now gates on the larger side's
  * magnitude, so the only excluded rows are the both-sides-tiny noise
  * class. */
class BenchSpec extends AnyFunSuite {

  test("isMover: the q26_asof round-10 miss now triggers") {
    assert(Bench.isMover(0.147, 0.333))
  }

  test("isMover: >2x in either direction triggers; exactly 2x does not") {
    assert(Bench.isMover(0.3, 0.7))    // regression
    assert(Bench.isMover(0.7, 0.3))    // improvement — confirm it's real
    assert(!Bench.isMover(0.2, 0.4))   // exactly 2x: strict >
    assert(!Bench.isMover(0.4, 0.2))
    assert(!Bench.isMover(0.3, 0.5))   // <2x move
  }

  test("isMover: both-sides-tiny rows are noise class, excluded") {
    assert(!Bench.isMover(0.05, 0.15)) // 3x but max 0.15 <= 0.2
    assert(!Bench.isMover(0.01, 0.04))
    // one side above the magnitude gate is enough
    assert(Bench.isMover(0.05, 0.25))
    assert(Bench.isMover(0.25, 0.05))
  }

  test("isMover: errored runs (-1 sentinel) never adjudicate") {
    assert(!Bench.isMover(-1.0, 0.5))
    assert(!Bench.isMover(0.5, -1.0))
    assert(!Bench.isMover(-1.0, -1.0))
  }
}
