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

  test("isMover: rows over 1 s trip the tighter 1.8x wire (the q105 " +
      "r13 near-miss class); sub-second rows keep 2x") {
    assert(Bench.isMover(1.426, 2.78))   // 1.95x at >1 s: now re-timed
    assert(Bench.isMover(2.78, 1.426))   // and symmetric
    assert(!Bench.isMover(1.426, 2.50))  // 1.75x at >1 s: in band
    assert(!Bench.isMover(0.40, 0.76))   // 1.9x sub-second: noise class
    assert(Bench.isMover(0.40, 0.81))    // >2x sub-second still trips
  }

  test("isMover: errored runs (-1 sentinel) never adjudicate") {
    assert(!Bench.isMover(-1.0, 0.5))
    assert(!Bench.isMover(0.5, -1.0))
    assert(!Bench.isMover(-1.0, -1.0))
  }

  test("isDriftWatch: the round-15 blind band (1.5-1.8x at >1 s) " +
      "re-times; wire movers and sub-second rows stay out") {
    assert(Bench.isDriftWatch(1.66, 2.96))   // q90: 1.78x — flagged
    assert(Bench.isDriftWatch(1.81, 2.93))   // q141: 1.62x — flagged
    assert(Bench.isDriftWatch(2.96, 1.66))   // symmetric (improvement)
    assert(!Bench.isDriftWatch(1.426, 2.78)) // 1.95x: isMover takes it
    assert(!Bench.isDriftWatch(1.0, 1.4))    // 1.4x: inside noise
    assert(!Bench.isDriftWatch(0.40, 0.70))  // sub-second: excluded
    assert(Bench.isDriftWatch(0.8, 1.25))    // hi>1 s, exactly 1.5x+:
    assert(!Bench.isDriftWatch(-1.0, 2.0))   // errored never flagged
    assert(!Bench.isDriftWatch(2.0, -1.0))
  }

  test("parseBaseline: per-query map, cross-SF record rejected") {
    val rec = """{"metric":"total","value":1.5,"unit":"sec","sf":"/d/sf0.1","queries":{"q01_a":0.625,"q02_b":0.875}}"""
    assert(Bench.parseBaseline(rec, "/d/sf0.1") ===
      Map("q01_a" -> 0.625, "q02_b" -> 0.875))
    assert(Bench.parseBaseline(rec, "/d/sf0.01").isEmpty)
  }

  // Round-12 verdict finding #2: interim BENCH_SELF captures ratcheted
  // the adjudication baseline, so a query drifting 1.5x per capture
  // across two captures (0.625 -> 0.94 -> 1.41 = 2.25x total) never
  // tripped the 2x wire — each interim capture moved "prev" under it.
  // With the round pin, every capture adjudicates against the ROUND
  // boundary, so the cumulative drift trips.
  test("round pin: 1.5x-per-capture drift across two captures trips the 2x wire") {
    val pin = Map("q154" -> 0.625)
    val cap1 = 0.625 * 1.5          // first interim capture: 0.9375
    val cap2 = cap1 * 1.5           // second capture: 1.406, 2.25x the pin
    // the ratchet (baseline = last capture) never fires:
    assert(!Bench.isMover(pin("q154"), cap1))
    assert(!Bench.isMover(cap1, cap2))
    // the pinned baseline fires on capture 2:
    val base = Bench.pickBaseline(Some(pin), Map("q154" -> cap1))
    assert(base("q154") === 0.625)
    assert(Bench.isMover(base("q154"), cap2))
  }

  // Round-14 verdict finding #1: adjudicated-to-environment rows
  // recorded median5, which became the next round's pin — an upward
  // ratchet (q104: prev 1.077, first 5.514, min5 0.639, median5 2.925
  // recorded; a future REAL 2.9 s regression would read as 1.0×
  // against the inherited pin). When the re-timing proves environment
  // (regression-direction mover, min5 at/below prev), record min5.
  test("recordValue: environment verdict records min5, not the noisy median") {
    // the q104 r14 scenario: min5 under prev proves the plan's cost
    assert(Bench.recordValue(1.077, 5.514, 0.639, 2.925) === 0.639)
    // min5 exactly at prev is still environment
    assert(Bench.recordValue(1.0, 3.0, 1.0, 2.5) === 1.0)
  }

  test("recordValue: a genuine regression keeps its slow median visible") {
    // min5 ABOVE prev: every warm run is slower — the move is real
    assert(Bench.recordValue(1.0, 3.0, 2.4, 2.6) === 2.6)
  }

  test("recordValue: improvement-direction movers keep the conservative " +
      "median (no downward ratchet from one lucky warm run)") {
    // first < prev (improvement direction): median5 recorded even
    // though min5 <= prev trivially holds
    assert(Bench.recordValue(2.0, 0.5, 0.4, 1.9) === 1.9)
    assert(Bench.recordValue(2.0, 0.5, 0.4, 0.45) === 0.45)
  }

  test("pickBaseline: falls back to BENCH_SELF when pin absent or empty") {
    val self = Map("q01" -> 0.5)
    assert(Bench.pickBaseline(None, self) === self)
    assert(Bench.pickBaseline(Some(Map.empty), self) === self)
    assert(Bench.pickBaseline(Some(Map("q01" -> 0.3)), self) ===
      Map("q01" -> 0.3))
  }
}
