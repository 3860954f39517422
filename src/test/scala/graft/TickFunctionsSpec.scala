package graft

import graft.functions.TickFunctions._
import org.scalatest.funsuite.AnyFunSuite

class TickFunctionsSpec extends AnyFunSuite {

  test("erf matches known values") {
    assert(math.abs(erfImpl(0.0)) < 1e-7)
    assert(math.abs(erfImpl(1.0) - 0.8427007929) < 1e-6)
    assert(math.abs(erfImpl(-1.0) + 0.8427007929) < 1e-6)
  }

  test("gamma matches factorials and sqrt(pi)") {
    assert(math.abs(gammaImpl(5.0) - 24.0) < 1e-9)
    assert(math.abs(gammaImpl(0.5) - math.sqrt(math.Pi)) < 1e-10)
  }

  test("bessel j0/j1/y0 match reference values") {
    assert(math.abs(j0Impl(1.0) - 0.7651976866) < 1e-7)
    assert(math.abs(j1Impl(1.0) - 0.4400505857) < 1e-7)
    assert(math.abs(y0Impl(1.0) - 0.0882569642) < 1e-6)
    assert(math.abs(jnImpl(2, 1.0) - 0.1149034849) < 1e-7)
  }

  test("humanBytes matches Go humanize.Bytes formatting") {
    assert(humanBytesImpl(0) == "0 B")
    assert(humanBytesImpl(9) == "9 B")
    assert(humanBytesImpl(82854982) == "83 MB")
    assert(humanBytesImpl(1000) == "1.0 kB")
    assert(humanBytesImpl(9500) == "9.5 kB")
    assert(humanBytesImpl(-5) == "0 B")
  }
}
