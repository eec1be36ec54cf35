package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram counting as a native Catalyst expression.
  *
  * Why not the HOF composition `size(array_distinct(transform(...)))`
  * (which is what [[TextFunctions.shingles]] builds for the operators
  * that need the gram ARRAY): higher-order functions are
  * CodegenFallback — interpreted, one lambda binding per element — and
  * measured 3.4 s for the x28 entry at sf0.1. When only the COUNT is
  * needed, this expression stays inside WholeStageCodegen and makes one
  * pass over the tokens with a single reused StringBuilder. Same
  * split-on-single-space token semantics as `split(text, ' ')`, so the
  * DuckDB oracle is unchanged.
  */
object NgramKernel {

  /** One pass: split, slide an n-window, count distinct joined grams.
    * n = 1 degenerates to distinct-token counting. Fewer than n tokens
    * ⇒ 0 grams for n ≥ 2 (no truncated gram — mirrors TF.shingles). */
  def distinctNgramCount(text: String, n: Int): Long = {
    val toks = text.split(" ", -1)
    if (n <= 1) {
      val set = new java.util.HashSet[String](toks.length * 2)
      var i = 0
      while (i < toks.length) { set.add(toks(i)); i += 1 }
      set.size.toLong
    } else if (toks.length < n) 0L
    else {
      val set = new java.util.HashSet[String](toks.length * 2)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        set.add(sb.toString)
        i += 1
      }
      set.size.toLong
    }
  }

  /** Per-gram multiplicity map over one token pass — the shared core
    * of [[topNgramCount]] and [[dupNgramPositions]]. Same
    * split-on-single-space semantics as the rest of the family. */
  private def gramCounts(text: String, n: Int): java.util.HashMap[String, Int] = {
    val toks = text.split(" ", -1)
    val m = new java.util.HashMap[String, Int](toks.length * 2)
    if (n <= 1) {
      var i = 0
      while (i < toks.length) { m.merge(toks(i), 1, Integer.sum); i += 1 }
    } else if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        m.merge(sb.toString, 1, Integer.sum)
        i += 1
      }
    }
    m
  }

  /** Highest multiplicity of any word n-gram (0 when the doc has no
    * n-gram) — the numerator of the Gopher "fraction of positions
    * covered by the most common n-gram" repetition signal. */
  def topNgramCount(text: String, n: Int): Long = {
    var max = 0
    val it = gramCounts(text, n).values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > max) max = v }
    max.toLong
  }

  /** Number of n-gram POSITIONS whose gram occurs more than once in the
    * document (Σ multiplicity over grams with multiplicity > 1) — the
    * numerator of the duplicated-n-gram position fraction. */
  def dupNgramPositions(text: String, n: Int): Long = {
    var dup = 0L
    val it = gramCounts(text, n).values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > 1) dup += v }
    dup
  }

  /** Distinct word n-grams as an array, first-occurrence order — the
    * array-returning sibling of [[distinctNgramCount]] and the kernel
    * behind [[TextFunctions.shingles]]. Same semantics as the HOF
    * composition `array_distinct(transform(sequence(...), slice ∘
    * concat_ws))` it replaces (that composition is CodegenFallback and
    * measured 3.6 s just to ENUMERATE sf0.1's shingles; this stays in
    * WholeStageCodegen). n ≤ 1 ⇒ distinct tokens; < n tokens ⇒ empty. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val set = new java.util.LinkedHashSet[String](toks.length * 2)
    if (n <= 1) {
      var i = 0
      while (i < toks.length) { set.add(toks(i)); i += 1 }
    } else if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        set.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-grams in document order, one per start position — the
    * POSITIONAL sibling of [[wordShingles]] (which deduplicates and so
    * loses positions). `posexplode(word_gram_seq(text, n))` yields
    * (pos, gram) with pos the 0-based token index of the gram's first
    * word — the input unit of duplicated-SPAN detection, where "where
    * in the document" matters as much as "which gram". Same
    * split-on-single-space semantics as the rest of the family;
    * < n tokens ⇒ empty (no truncated gram). n ≤ 1 ⇒ the token array
    * itself. */
  def wordGramSeq(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (n <= 1) {
      val out = new Array[Any](toks.length)
      var i = 0
      while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
      new GenericArrayData(out)
    } else if (toks.length < n) new GenericArrayData(new Array[Any](0))
    else {
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `top_ngram_count(text, n)` — LongType; null-intolerant. */
case class TopNgramCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "top_ngram_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, n: Any): Any =
    NgramKernel.topNgramCount(
      t.asInstanceOf[UTF8String].toString, n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.NgramKernel.topNgramCount($t.toString(), $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `dup_ngram_positions(text, n)` — LongType; null-intolerant. */
case class DupNgramPositions(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "dup_ngram_positions"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, n: Any): Any =
    NgramKernel.dupNgramPositions(
      t.asInstanceOf[UTF8String].toString, n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.NgramKernel.dupNgramPositions($t.toString(), $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `distinct_ngram_count(text, n)` — LongType; null-intolerant. */
case class DistinctNgramCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "distinct_ngram_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, n: Any): Any =
    NgramKernel.distinctNgramCount(
      t.asInstanceOf[UTF8String].toString, n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.NgramKernel.distinctNgramCount($t.toString(), $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `word_shingles(text, n)` — ArrayType(StringType); null-intolerant. */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, n: Any): Any =
    NgramKernel.wordShingles(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.NgramKernel.wordShingles($t, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `word_gram_seq(text, n)` — ArrayType(StringType), positional
  * (non-distinct, document order); null-intolerant. */
case class WordGramSeq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "word_gram_seq"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, n: Any): Any =
    NgramKernel.wordGramSeq(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.NgramKernel.wordGramSeq($t, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column facade. The Scala builders construct the expression directly
  * (via [[org.apache.spark.sql.GraftColumnBridge]] — no registry, no
  * session needed, so a column can be built before any SparkSession
  * exists); [[register]] remains for the SQL-text surface (see also
  * [[graft.GraftExtensions]] for the application-wide
  * `spark.sql.extensions` path). */
object TextKernels {
  import org.apache.spark.sql.{GraftColumnBridge => B}

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "distinct_ngram_count", es => DistinctNgramCount(es.head, es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", es => WordShingles(es.head, es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_gram_seq", es => WordGramSeq(es.head, es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_ngram_count", es => TopNgramCount(es.head, es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dup_ngram_positions", es => DupNgramPositions(es.head, es(1)), "built-in")
  }

  def distinct_ngram_count(text: Column, n: Int): Column =
    B.column(DistinctNgramCount(B.expression(text), B.expression(lit(n))))

  def top_ngram_count(text: Column, n: Int): Column =
    B.column(TopNgramCount(B.expression(text), B.expression(lit(n))))

  def dup_ngram_positions(text: Column, n: Int): Column =
    B.column(DupNgramPositions(B.expression(text), B.expression(lit(n))))

  def word_shingles(text: Column, n: Int): Column =
    B.column(WordShingles(B.expression(text), B.expression(lit(n))))

  def word_gram_seq(text: Column, n: Int): Column =
    B.column(WordGramSeq(B.expression(text), B.expression(lit(n))))
}
