package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2 property checks, pure-JVM (no Spark session needed):
  * the Welford recurrence must agree with the two-pass formulas on
  * arbitrary count series, and the winnowing guarantee must hold on
  * arbitrary token sequences. ScalaCheck generators drawn with fixed
  * seeds (the scalatest bridge artifact is not in the offline cache)
  * — 200 deterministic cases per property. */
class WelfordPropertySpec extends AnyFunSuite {
  import AnomalyDetector._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val countSeries: Gen[List[Long]] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 100000L)))

  test("Welford state equals two-pass mean/variance on arbitrary series") {
    samples(countSeries, 200).foreach { xs =>
      var st = WelfordState(0, 0.0, 0.0)
      xs.zipWithIndex.foreach { case (x, i) =>
        st = step(st, AggRow(i * 60000L, "/", "US", x))._1
      }
      val n = xs.length
      val mean = xs.map(_.toDouble).sum / n
      assert(st.n == n)
      assert(math.abs(st.mean - mean) <= 1e-9 * math.max(1.0, math.abs(mean)))
      if (n > 1) {
        val varSamp = xs.map(x => math.pow(x - mean, 2)).sum / (n - 1)
        val tol = 1e-6 * math.max(1.0, varSamp)
        assert(math.abs(st.sampleStd * st.sampleStd - varSamp) <= tol,
          s"m2-based variance ${st.sampleStd * st.sampleStd} vs two-pass $varSamp")
      }
    }
  }

  test("z-score never exceeds the (n-1)/sqrt(n) bound and never flags before n=6") {
    samples(countSeries, 200).foreach { xs =>
      var st = WelfordState(0, 0.0, 0.0)
      xs.zipWithIndex.foreach { case (x, i) =>
        val (s2, row) = step(st, AggRow(i * 60000L, "/", "US", x))
        st = s2
        assert(row.z_score <= (row.n - 1).toDouble / math.sqrt(row.n.toDouble) + 1e-9)
        if (row.n <= MinPoints) assert(!row.is_anomaly && row.z_score == 0.0)
      }
    }
  }

  test("winnowing guarantee: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    import graft.functions.TextFunctions.winnow
    val tokenSeq: Gen[List[String]] =
      Gen.chooseNum(0, 80).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")))
    val gen = for {
      pre <- tokenSeq; mid <- tokenSeq; post <- tokenSeq
      shared <- Gen.listOfN(6, Gen.oneOf("x1", "x2", "x3", "x4", "x5")) // 6 >= w+k-1
    } yield (pre, shared, mid, post)
    samples(gen, 200).foreach { case (pre, shared, mid, post) =>
      val a = (pre ++ shared ++ mid).mkString(" ")
      val b = (post ++ shared).mkString(" ")
      assert(winnow(a).toSet.intersect(winnow(b).toSet).nonEmpty,
        s"no shared fingerprint for shared run '${shared.mkString(" ")}'")
    }
  }
}
