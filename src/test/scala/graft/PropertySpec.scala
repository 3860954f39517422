package graft

import graft.llm.TextOps
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property invariants (SURVEY §5): window/join alignment and sketch
  * estimator behavior under generated inputs (scalacheck, fixed default
  * parameters → reproducible). */
class PropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // --- joinTolerance bucket function ≡ Go time.Round over the µs domain ---

  private def bucket(tUs: Long, tolS: Long): Long =
    (math.floor(tUs / 1000000.0 / tolS + 0.5) * tolS).toLong

  test("tolerance bucketing centers each point within tol/2 and is monotone") {
    val gen = for {
      t <- Gen.chooseNum(0L, 4102444800L * 1000000) // through year 2100
      tol <- Gen.oneOf(1L, 10L, 60L, 3600L)
    } yield (t, tol)
    holds(Prop.forAll(gen) { case (t, tol) =>
      math.abs(t / 1000000.0 - bucket(t, tol)) <= tol / 2.0 + 1e-6
    })
    holds(Prop.forAll(Gen.chooseNum(0L, 1L << 50), Gen.chooseNum(0L, 1L << 50)) { (t1, t2) =>
      val (lo, hi) = (math.min(t1, t2), math.max(t1, t2))
      bucket(lo, 60) <= bucket(hi, 60) // monotone in time
    })
  }

  // ----------------------- minhash estimator sanity ----------------------

  test("minhash: equal sets agree on every family, disjoint sets on few") {
    val consts = TextOps.minhashConsts(16)
    def mix(h: Long, c: (Long, Long)): Long =
      ((h >> 30) * c._1 + (h & ((1L << 30) - 1)) * c._2) % TextOps.mixPrime
    def sig(hs: Seq[Long]): Seq[Long] = consts.map(c => hs.map(mix(_, c)).min)
    val gen = Gen.listOfN(30, Gen.chooseNum(1L, (1L << 60) - 1)).map(_.distinct)
    holds(Prop.forAll(gen, gen) { (a, b) =>
      val disjointB = b.filterNot(a.contains)
      (a.nonEmpty && disjointB.nonEmpty) ==> {
        val same = sig(a).zip(sig(a)).count { case (x, y) => x == y }
        val cross = sig(a).zip(sig(disjointB)).count { case (x, y) => x == y }
        same == 16 && cross <= 4 // families decorrelated (would be ~16 without the mod wrap)
      }
    })
  }

  // ------------------------ simhash blocking bound ------------------------

  private def chunks(sh: Long): Seq[Long] = (0 until 4).map(c => (sh >> (c * 8)) % 256)

  test("simhash chunk blocking is lossless for hamming <= 3 (pigeonhole)") {
    val pair = for {
      sh <- Gen.chooseNum(0L, (1L << 32) - 1)
      flips <- Gen.listOfN(3, Gen.chooseNum(0, 31))
    } yield (sh, flips.foldLeft(sh)((s, b) => s ^ (1L << b)))
    holds(Prop.forAll(pair) { case (a, b) =>
      java.lang.Long.bitCount(a ^ b) <= 3 &&
        chunks(a).zip(chunks(b)).exists { case (x, y) => x == y }
    })
  }

  // ------------- aligned window emission: closed form ≡ sequential FSM -----
  //
  // Pipe.windowAligned relies on a closed-form characterization of the
  // reference's windowByTime FSM under align (window.go:108-224): boundary
  // B=k·every emits iff some point arms it (point in [B-every,B), or B is
  // the fillPeriod first boundary) and some point is ≥ B; contents are
  // [B-period, B). This property pins the derivation against a direct port
  // of the Go FSM on arbitrary point sets. Empty batches are excluded on
  // both sides (rows can't express them — documented WindowFSM deviation).

  private def fsmAligned(times: Seq[Long], periodS: Long, everyS: Long,
      fillPeriod: Boolean): Seq[(Long, Seq[Long])] = {
    val out = Seq.newBuilder[(Long, Seq[Long])]
    var buf = Vector.empty[Long]
    var nextEmit = 0L
    var first = true
    for (t <- times) {
      if (first) {
        nextEmit =
          if (fillPeriod) (t + periodS) / everyS * everyS + everyS
          else (t + everyS) / everyS * everyS
        first = false
      }
      if (t >= nextEmit) {
        val oldest = nextEmit - periodS
        buf = buf.dropWhile(_ < oldest)
        out += ((nextEmit, buf))
        nextEmit = (t + everyS) / everyS * everyS
      }
      buf :+= t
    }
    out.result()
  }

  private def closedFormAligned(times: Seq[Long], periodS: Long, everyS: Long,
      fillPeriod: Boolean): Seq[(Long, Seq[Long])] = {
    val mn = times.min
    val mx = times.max
    val firstK = if (fillPeriod) (mn + periodS) / everyS + 1 else mn / everyS + 1
    val armed = times.map(_ / everyS + 1).toSet + firstK
    armed.toSeq.sorted
      .filter(k => k >= firstK && k * everyS <= mx)
      .map(k => (k * everyS, times.filter(t => t >= k * everyS - periodS && t < k * everyS)))
  }

  test("windowAligned closed form ≡ Go windowByTime FSM (align) on random point sets") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 400L))
      every <- Gen.chooseNum(1L, 12L)
      period <- Gen.chooseNum(1L, 30L)
      fp <- Gen.oneOf(true, false)
    } yield (ts.sorted, period, every, fp)
    holds(Prop.forAll(gen) { case (ts, period, every, fp) =>
      fsmAligned(ts, period, every, fp).filter(_._2.nonEmpty) ==
        closedFormAligned(ts, period, every, fp).filter(_._2.nonEmpty)
    })
  }

  // ------------------- sliding-window covering-k arithmetic ---------------

  test("windowSliding pmod arithmetic yields exactly the covering k·every grid") {
    // Pipe.windowSliding derives covering window starts as k·e for
    // k ∈ [floor((t−p)/e)+1, floor(t/e)] (floor via pmod). The defining
    // property (Spark's window() generator semantics): start ≤ t < start+p
    // over the epoch-anchored k·e grid. Negative epochs included.
    val gen = for {
      t <- Gen.chooseNum(-4000000L, 4000000L)
      e <- Gen.chooseNum(1L, 900L)
      p <- Gen.chooseNum(1L, 2700L)
    } yield (t, p, e)
    holds(Prop.forAll(gen) { case (t, p, e) =>
      val lo = (t - p - Math.floorMod(t - p, e)) / e + 1
      val hi = (t - Math.floorMod(t, e)) / e
      val arith = (lo to hi).map(_ * e).toSet
      val brute = (((t - p) / e - 2) to (t / e + 2))
        .map(_ * e).filter(s => s <= t && t < s + p).toSet
      arith == brute
    })
  }

  // ------------------------- percentile rank bounds -----------------------

  test("nearest-rank percentile index stays within [0, n] and is monotone in pct") {
    val gen = for {
      n <- Gen.chooseNum(1, 10000)
      p1 <- Gen.chooseNum(1.0, 100.0)
      p2 <- Gen.chooseNum(1.0, 100.0)
    } yield (n, math.min(p1, p2), math.max(p1, p2))
    holds(Prop.forAll(gen) { case (n, lo, hi) =>
      def rank(pct: Double) = math.floor(n * pct / 100 + 0.5).toInt
      rank(lo) >= 0 && rank(hi) <= n && rank(lo) <= rank(hi)
    })
  }
}
