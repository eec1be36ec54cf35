package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("text").select(c.as[T]).head()

  test("shingles: n-grams for len>=n, EMPTY (not truncated) for len<n") {
    assert(one[Seq[String]](TextFunctions.shingles(col("text"), 3), "a b c d")
      == Seq("a b c", "b c d"))
    assert(one[Seq[String]](TextFunctions.shingles(col("text"), 3), "a b") == Seq.empty)
    assert(one[Seq[String]](TextFunctions.shingles(col("text"), 3), "a b c") == Seq("a b c"))
    // distinct: repeated n-grams collapse
    assert(one[Seq[String]](TextFunctions.shingles(col("text"), 2), "a b a b") == Seq("a b", "b a"))
  }

  test("shingles kernel edge cases match split-on-single-space semantics") {
    // empty text: split yields one empty token — n=1 keeps it, n>=2 empty
    assert(one[Seq[String]](TextFunctions.shingles(col("text"), 1), "") == Seq(""))
    assert(one[Seq[String]](TextFunctions.shingles(col("text"), 2), "") == Seq.empty)
    // consecutive spaces produce empty tokens, same as split(text, ' ')
    assert(one[Seq[String]](TextFunctions.shingles(col("text"), 2), "a  b")
      == Seq("a ", " b"))
    // non-ASCII round-trips through the UTF8String boundary
    assert(one[Seq[String]](TextFunctions.shingles(col("text"), 2), "héllo wörld ünïcode")
      == Seq("héllo wörld", "wörld ünïcode"))
    // null text: null-intolerant expression yields null, not a crash
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(TextFunctions.shingles(col("text"), 2)).head()
    assert(r.isNullAt(0))
  }

  test("gramSeq: positional (non-distinct) grams, one per start, same edge semantics") {
    // repeated grams KEPT, document order — the positional contract
    assert(one[Seq[String]](TextFunctions.gramSeq(col("text"), 2), "a b a b")
      == Seq("a b", "b a", "a b"))
    // one gram per start position: len - n + 1 entries
    assert(one[Seq[String]](TextFunctions.gramSeq(col("text"), 3), "a b c d")
      == Seq("a b c", "b c d"))
    // < n tokens ⇒ empty (no truncated gram), n=1 ⇒ the token array
    assert(one[Seq[String]](TextFunctions.gramSeq(col("text"), 3), "a b") == Seq.empty)
    assert(one[Seq[String]](TextFunctions.gramSeq(col("text"), 1), "a b a") == Seq("a", "b", "a"))
    // posexplode positions are 0-based start-token indices
    val pos = Seq("t0 t1 t2 t3 t4").toDF("text")
      .select(posexplode(TextFunctions.gramSeq(col("text"), 2)))
      .as[(Int, String)].collect()
    assert(pos.toSeq == Seq((0, "t0 t1"), (1, "t1 t2"), (2, "t2 t3"), (3, "t3 t4")))
    // null text: null-intolerant expression yields null, not a crash
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(TextFunctions.gramSeq(col("text"), 2)).head()
    assert(r.isNullAt(0))
  }

  test("wordOccurrences counts whole words only") {
    assert(one[Long](TextFunctions.wordOccurrences(col("text"), "the"), "the theater the") == 2L)
    assert(one[Long](TextFunctions.wordOccurrences(col("text"), "the"), "theater") == 0L)
  }

  test("langId: marker argmax with deterministic tie-break, und for no markers") {
    assert(one[String](TextFunctions.langId(col("text")), "the cat and the dog of doom") == "en")
    assert(one[String](TextFunctions.langId(col("text")), "der hund und die katze") == "de")
    assert(one[String](TextFunctions.langId(col("text")), "xyzzy plugh") == "und")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = Seq("Hello   World", "hello world", "other").toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as[String]).collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("quality score stays in [0,1] and empty text scores low") {
    val scores = Seq("", "the the the the", "a reasonable sentence about engines and data")
      .toDF("text").select(TextFunctions.qualityScore(col("text")).as[Double]).collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) < scores(2))
  }
}

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dot_product / cosine_similarity match reference math (codegen path)") {
    VectorFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val expectedDot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    val row = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.dot_product(col("a"), col("b")).as("d"),
              VectorFunctions.cosine_similarity(col("a"), col("b")).as("c"))
      .as[(Double, Double)].head()
    assert(math.abs(row._1 - expectedDot) < 1e-9)
    assert(math.abs(row._2 - expectedDot / (na * nb)) < 1e-9)
  }

  test("cosine of a zero vector is 0.0, not NaN") {
    VectorFunctions.register(spark)
    val z = Seq((Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
      .select(VectorFunctions.cosine_similarity(col("a"), col("b")).as[Double]).head()
    assert(z == 0.0)
  }

  test("functions are callable from SQL after registration") {
    VectorFunctions.register(spark)
    val v = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(v == 11.0)
  }
}
