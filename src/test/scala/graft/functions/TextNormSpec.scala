package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Kernel contract for x74's `normalize_text` (NFC + control strip).
  * The cross-engine agreement with DuckDB's utf8proc is hash-checked by
  * the driver; these pin the JVM-side semantics directly. */
class TextNormSpec extends AnyFunSuite {
  private def n(s: String) = TextNormKernel.normalize(s)

  test("NFC composes decomposed sequences") {
    assert(n("e\u0301") == "\u00e9")         // e + combining acute -> LATIN SMALL E WITH ACUTE
    assert(n("a\u0300") == "\u00e0")         // grave
    assert(n("o\u0308") == "\u00f6")         // diaeresis
    assert(n("cafe\u0301s") == "caf\u00e9s") // mid-string composition
  }

  test("C0 controls and DEL are stripped; newline and tab survive") {
    assert(n("abc\u0007\u001b\u007f\rd") == "abcd")
    assert(n("a\nb\tc") == "a\nb\tc")
    assert(n("\u0007\u0000") == "")
    assert(n("") == "")
  }

  test("already-clean ASCII is unchanged and the function is idempotent") {
    val s = "plain ascii text, nothing to do."
    assert(n(s) == s)
    val messy = "cafe\u0301 \u0007 a\u0300\r"
    assert(n(n(messy)) == n(messy))
  }

  test("already-composed characters pass through NFC untouched") {
    assert(n("caf\u00e9 \u00f6 \u00e0") == "caf\u00e9 \u00f6 \u00e0")
  }
}
