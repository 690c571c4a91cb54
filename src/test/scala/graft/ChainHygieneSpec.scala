package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hygiene gates over the COMMITTED bench pins (round-15 verdict
  * items 2 and 3) — the chain artifacts future rounds regress
  * against:
  *
  *  1. zero `"noisy": true` rows — a noisy flag inside a pin is a
  *     contradiction (the flag says "this number is contaminated, the
  *     retry is the believable probe"); chain acceptance settles the
  *     row (`scripts/settle_noisy.py`, min-of-warm-and-retry — the
  *     same effectiveWarm rule every reader applies) before the
  *     artifact can be committed;
  *  2. chain-level warm drift <= 1.10x — uniform host-throttle creep
  *     inflates every row ~15% without tripping any per-query retry
  *     trigger (round 15 accepted a +20% leg at noisy=3), so the
  *     accepted-leg test is the SUM over rows shared with the prior
  *     pin, recorded by Bench as `drift` in the artifact.
  *
  * Driver round artifacts (BENCH_rNN) are record-and-discard and are
  * deliberately NOT gated here.
  */
class ChainHygieneSpec extends AnyFunSuite {

  private val pins = Seq("BENCH_FULL.json", "BENCH_SF1_FULL.json",
    "BENCH_SF01_REF.json", "BENCH_SF1.json", "BENCH_30X.json")

  private def read(path: String): String = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.mkString finally src.close()
  }

  test("committed pins carry zero noisy rows") {
    val offenders = pins.flatMap { p =>
      val f = new java.io.File(p)
      if (!f.isFile) Nil
      else {
        val txt = read(p)
        val names = "\"([A-Za-z0-9_]+)\":\\{[^}]*\"noisy\":true".r
          .findAllMatchIn(txt).map(_.group(1)).toList
        names.map(n => s"$p:$n")
      }
    }
    assert(offenders.isEmpty,
      s"noisy rows inside committed pins (settle with " +
        s"scripts/settle_noisy.py before committing): " +
        offenders.mkString(", "))
  }

  test("committed pins sit within the 1.10x chain-level drift gate") {
    val offenders = pins.flatMap { p =>
      val f = new java.io.File(p)
      if (!f.isFile) Nil
      else "\"drift\":([0-9.]+)".r.findFirstMatchIn(read(p))
        .map(_.group(1).toDouble).filter(_ > 1.10)
        .map(d => f"$p: drift $d%.3f")
    }
    assert(offenders.isEmpty,
      s"committed pin absorbed chain-level warm creep (re-pin the leg " +
        s"rested; the per-query triggers cannot see uniform inflation): " +
        offenders.mkString(", "))
  }
}
