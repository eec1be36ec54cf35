package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as a native Catalyst expression — the
  * ingest-side cleanup step every text-curation pipeline runs before
  * tokenization/fingerprinting (the CCNet/Dolma `fix_text` family):
  *
  *  1. NFC normalization (canonical composition): decomposed sequences
  *     like `e` + U+0301 become the single codepoint `é`, so exact
  *     dedup/fingerprinting (x04/x05) can't be defeated by encoding
  *     variants of identical text;
  *  2. control-character strip: C0 controls except `\n`/`\t`, plus DEL —
  *     the bytes that break downstream tokenizers and terminal dumps.
  *
  * Why a custom Expression and not a UDF: the normalize runs in the
  * hottest possible place (every document, before every other text
  * operator), and a native expression stays inside WholeStageCodegen —
  * no SerDe boundary, null handling generated. `java.text.Normalizer`
  * is the JDK's ICU-derived implementation; NFC is STABLE for assigned
  * codepoints across Unicode versions, which is what makes a
  * cross-engine oracle (DuckDB's utf8proc `nfc_normalize`) meaningful
  * rather than coincidental.
  */
object TextNormKernel {
  /** NFC-compose, then drop C0 controls (except \n and \t) and DEL. */
  def normalize(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    var i = 0
    var dirty = false
    while (i < nfc.length && !dirty) {
      val c = nfc.charAt(i)
      dirty = (c < ' ' && c != '\n' && c != '\t') || c == '\u007f'
      i += 1
    }
    if (!dirty) nfc
    else {
      val sb = new java.lang.StringBuilder(nfc.length)
      i = 0
      while (i < nfc.length) {
        val c = nfc.charAt(i)
        if (!((c < ' ' && c != '\n' && c != '\t') || c == '\u007f')) sb.append(c)
        i += 1
      }
      sb.toString
    }
  }
}

/** `normalize_text(text)` — StringType; null-intolerant. */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def prettyName: String = "normalize_text"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any): Any =
    UTF8String.fromString(
      TextNormKernel.normalize(t.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
      s"graft.functions.TextNormKernel.normalize($t.toString()))")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextNorm {
  import org.apache.spark.sql.{GraftColumnBridge => B}

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text", es => NormalizeText(es.head), "built-in")

  def normalize_text(text: Column): Column =
    B.column(NormalizeText(B.expression(text)))
}
