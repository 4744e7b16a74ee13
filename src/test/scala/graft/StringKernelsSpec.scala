package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinklerKernel

/** Golden values for the Jaro–Winkler kernel, captured from DuckDB's
  * `jaro_winkler_similarity` (the er4 oracle engine) — textbook pairs
  * plus the corner the two published conventions disagree on (odd raw
  * transposition count: rapidfuzz/DuckDB FLOORS the half, Jaro's paper
  * divides exactly; er4's 32k-pair fixture found the divergence).
  */
class StringKernelsSpec extends AnyFunSuite {

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches DuckDB's jaro_winkler_similarity golden values") {
    val golden = Seq(
      ("martha", "marhta") -> 0.9611111111111111,
      ("dixon", "dicksonx") -> 0.8133333333333332,
      ("jellyfish", "smellyfish") -> 0.8962962962962964, // prefix 0: no boost
      ("abc", "abc") -> 1.0,
      ("", "abc") -> 0.0,
      ("", "") -> 0.0,
      ("a", "b") -> 0.0,
      ("ab", "ba") -> 0.0,                  // window 0: no matches
      ("abcdxxxxxx", "abcdyyyyyy") -> 0.6,  // jaro <= 0.7: boost withheld
      ("aabbcc", "ccbbaa") -> 0.5555555555555555,
      // ODD raw transposition count (3): floored half -> 0.9660...;
      // exact-half Jaro would give 0.9601... (the bug er4 caught)
      ("Customer#000000360", "Customer#x00000360") -> 0.9660130718954247,
      ("Customer#000000001", "Customer#000000013") -> 0.9777777777777777)
    golden.foreach { case ((a, b), expect) =>
      assert(jw(a, b) == expect, s"jw($a, $b)")
    }
    // symmetry on asymmetric-looking inputs
    assert(jw("dixon", "dicksonx") == jw("dicksonx", "dixon"))
  }
}
