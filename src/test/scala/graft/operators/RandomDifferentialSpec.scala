package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized DIFFERENTIAL checks for the round-11 kernels: generate
  * corpora from a small vocabulary (dense collisions, lengths that
  * include empty and shorter-than-n documents), run the Spark operator
  * ONCE over the whole batch, and compare every output row against an
  * independent in-memory implementation sharing no code with the
  * operator. Fixed seeds — deterministic, like WelfordPropertySpec
  * (the scalacheck-scalatest bridge is not in the offline cache). */
class RandomDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Array("a0", "b1", "c2", "d3", "e4", "f5", "g6", "h7")

  private def randomDocs(seed: Int, nDocs: Int, maxLen: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nDocs).map { i =>
      val len = rnd.nextInt(maxLen + 1) // includes 0 and < n lengths
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
  }

  private def grams(text: String, n: Int): Seq[String] =
    text.split(" ").filter(_.nonEmpty).sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toSeq

  test("containment kernel == in-memory set computation on random corpora (2 seeds)") {
    for (seed <- Seq(11, 42)) {
      val docs = randomDocs(seed, nDocs = 30, maxLen = 12)
      val sets = docs.map { case (id, t) => id -> grams(t, 3).toSet }.toMap
      // expected: every pair sharing >= 1 trigram, both containments exact
      val expected = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa intersect sb).size if inter > 0
      } yield (a, b) -> ((inter.toDouble / sa.size, inter.toDouble / sb.size))).toMap
      val got = Dedup.ngramContainmentPairsCapped(
          docs.toDF("doc_id", "text"), n = 3, threshold = 0.0, maxDf = 1000)
        .as[(Long, Long, Double, Double)].collect()
        .map { case (a, b, ab, ba) => (a, b) -> ((ab, ba)) }.toMap
      assert(got.keySet == expected.keySet,
        s"seed $seed: pair sets differ: ${got.keySet.diff(expected.keySet)} / ${expected.keySet.diff(got.keySet)}")
      expected.foreach { case (k, (ab, ba)) =>
        assert(math.abs(got(k)._1 - ab) < 1e-12 && math.abs(got(k)._2 - ba) < 1e-12,
          s"seed $seed pair $k: ${got(k)} vs ($ab, $ba)")
      }
    }
  }

  test("maxSharedSpan == in-memory island computation on random corpora (2 seeds)") {
    val n = 4
    for (seed <- Seq(7, 99)) {
      val incoming = randomDocs(seed, nDocs = 25, maxLen = 14)
      val reference = randomDocs(seed + 1000, nDocs = 10, maxLen = 14)
        .map { case (id, t) => (id + 500L, t) }
      val refSet = reference.flatMap { case (_, t) => grams(t, n) }.toSet
      val expected = incoming.map { case (id, t) =>
        val matched = grams(t, n).zipWithIndex.collect {
          case (g, p) if refSet.contains(g) => p
        }
        if (matched.isEmpty) id -> ((0L, 0L, 0L))
        else {
          // island merge: same rule as the operator — a gram extends the
          // island when its coverage touches or overlaps the running end
          var spans = List.empty[(Int, Int, Int)] // (start, end, grams)
          matched.foreach { p =>
            spans match {
              case (s, e, g) :: rest if p <= e + 1 =>
                spans = (s, math.max(e, p + n - 1), g + 1) :: rest
              case _ => spans = (p, p + n - 1, 1) :: spans
            }
          }
          id -> ((spans.map(s => s._2 - s._1 + 1).max.toLong,
                  matched.size.toLong, spans.size.toLong))
        }
      }.toMap
      val got = Dedup.maxSharedSpan(
          incoming.toDF("doc_id", "text"), reference.toDF("doc_id", "text"), n = n)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == expected, s"seed $seed: " +
        expected.keys.filter(k => got(k) != expected(k))
          .map(k => s"$k: got ${got(k)} want ${expected(k)}").mkString("; "))
    }
  }

  test("DSIR scoring == in-memory smoothed LLR on random corpora (2 seeds)") {
    for (seed <- Seq(5, 77)) {
      val docs = randomDocs(seed, nDocs = 40, maxLen = 12)
      val benchMod = 7
      val isT = (id: Long) => id % benchMod == 0
      val toks = (t: String) => t.split(" ").filter(_.nonEmpty).toSeq
      val ct = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      val cc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      docs.foreach { case (id, t) =>
        toks(t).foreach(w => if (isT(id)) ct(w) += 1 else cc(w) += 1)
      }
      val v = (ct.keySet ++ cc.keySet).size
      val nt = ct.values.sum; val nc = cc.values.sum
      val expected = docs.filterNot(d => isT(d._1)).flatMap { case (id, t) =>
        val ws = toks(t)
        if (ws.isEmpty) None
        else Some(id -> ((ws.size.toLong, ws.map(w =>
          math.log((ct(w) + 1).toDouble / (nt + v)) -
          math.log((cc(w) + 1).toDouble / (nc + v))).sum)))
      }.toMap
      val (tc, tot) = Curation.dsirModel(docs.toDF("doc_id", "text"), benchMod)
      val got = Curation.dsirScore(
          docs.filterNot(d => isT(d._1)).toDF("doc_id", "text"), tc, tot)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.keySet == expected.keySet, s"seed $seed: ${got.keySet} vs ${expected.keySet}")
      expected.foreach { case (id, (w, lw)) =>
        assert(got(id)._1 == w, s"seed $seed doc $id token count")
        assert(math.abs(got(id)._2 - lw) < 1e-6, // operator rounds to 6
          s"seed $seed doc $id: ${got(id)._2} vs $lw")
      }
    }
  }

  private def md5hex2(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    f"${d(0) & 0xff}%02x".take(2)
  }

  test("x101 hashed bigram xent == in-memory bucketed model on random corpora (2 seeds)") {
    for (seed <- Seq(13, 88)) {
      val docs = randomDocs(seed, nDocs = 35, maxLen = 14)
      val toks = (t: String) => t.split(" ").filter(_.nonEmpty).map(md5hex2).toSeq
      val bgs = (t: String) => { val w = toks(t); w.zip(w.drop(1)) }
      val bm = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      val ctx = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      var total = 0L
      docs.foreach { case (_, t) =>
        bgs(t).foreach { bg => bm(bg) += 1; ctx(bg._1) += 1 }
        toks(t).foreach { w => uni(w) += 1; total += 1 }
      }
      val expected = docs.flatMap { case (id, t) =>
        val b = bgs(t)
        if (b.isEmpty) None
        else {
          val tf = b.groupBy(identity).view.mapValues(_.size.toLong)
          val x = tf.map { case (bg, f) =>
            f * -math.log(0.9 * bm(bg).toDouble / ctx(bg._1) +
              0.1 * uni(bg._2).toDouble / total) }.sum / b.size
          Some(id -> ((b.size.toLong, x)))
        }
      }.toMap
      val got = Curation.bigramScoreHashed(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.keySet == expected.keySet, s"seed $seed: key sets differ")
      expected.foreach { case (id, (n, x)) =>
        assert(got(id)._1 == n, s"seed $seed doc $id n_bigrams")
        assert(math.abs(got(id)._2 - x) < 1e-5,
          s"seed $seed doc $id: ${got(id)._2} vs $x")
      }
    }
  }

  test("x103 snapshot drift == in-memory smoothed KL/JS on random corpora (2 seeds)") {
    for (seed <- Seq(21, 63)) {
      val a = randomDocs(seed, nDocs = 25, maxLen = 12)
      val b = randomDocs(seed + 500, nDocs = 25, maxLen = 12)
      def counts(rows: Seq[(Long, String)]) = rows
        .flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (ca, cb) = (counts(a), counts(b))
      val joint = (ca.keySet ++ cb.keySet).toSeq
      val (no, nn, v) = (ca.values.sum, cb.values.sum, joint.size.toLong)
      val ps = joint.map(t => (ca.getOrElse(t, 0L) + 1).toDouble / (no + v))
      val qs = joint.map(t => (cb.getOrElse(t, 0L) + 1).toDouble / (nn + v))
      val klAB = ps.zip(qs).map { case (p, q) => p * math.log(p / q) }.sum
      val klBA = ps.zip(qs).map { case (p, q) => q * math.log(q / p) }.sum
      val js = ps.zip(qs).map { case (p, q) =>
        val m = (p + q) / 2
        (p * math.log(p / m) + q * math.log(q / m)) / 2 }.sum
      val r = Curation.snapshotDrift(a.toDF("doc_id", "text"),
        b.toDF("doc_id", "text")).collect().head
      assert(r.getLong(0) == v && r.getLong(1) == no && r.getLong(2) == nn,
        s"seed $seed: totals $r vs ($v, $no, $nn)")
      assert(math.abs(r.getDouble(3) - klAB) < 1e-5, s"seed $seed KL a->b")
      assert(math.abs(r.getDouble(4) - klBA) < 1e-5, s"seed $seed KL b->a")
      assert(math.abs(r.getDouble(5) - js) < 1e-5, s"seed $seed JS")
    }
  }
}
