package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DistinctNgramCount, DotProduct, NormalizeText, WordGramSeq, WordShingles}

/** Spark-native installation of graft's custom Catalyst expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes `word_shingles`, `word_gram_seq`, `distinct_ngram_count`,
  * `dot_product` and
  * `cosine_similarity` available to EVERY session of the application —
  * plain SQL, thriftserver/JDBC clients, notebooks — without any
  * driver-side `register` call. The per-session
  * `TextKernels.register` / `VectorFunctions.register` facades remain
  * for embedded use (and are what the library's own operators call);
  * this class is the deployment-grade path, since extensions are applied
  * at session build time, survive `newSession()`, and need no code on
  * the user's side.
  *
  * All five are codegen'd binary expressions (no UDFs): they stay inside
  * WholeStageCodegen wherever they appear, so the SQL surface has the
  * same plan shape as the Scala DataFrame surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def fn2(mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => mk(a, b)
    case es => throw new IllegalArgumentException(
      s"expected 2 arguments, got ${es.length}")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-grams, first-occurrence order"),
      fn2(WordShingles)))
    ext.injectFunction((FunctionIdentifier("word_gram_seq"),
      info("word_gram_seq", "word_gram_seq(text, n) - all word n-grams in document order, one per start position"),
      fn2(WordGramSeq)))
    ext.injectFunction((FunctionIdentifier("distinct_ngram_count"),
      info("distinct_ngram_count", "distinct_ngram_count(text, n) - number of distinct word n-grams"),
      fn2(DistinctNgramCount)))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - float-vector dot product"),
      fn2(DotProduct)))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - float-vector cosine similarity"),
      fn2(CosineSimilarity)))
    ext.injectFunction((FunctionIdentifier("normalize_text"),
      info("normalize_text", "normalize_text(text) - NFC-compose + strip C0 controls (except \\n, \\t) and DEL"),
      { case Seq(a) => NormalizeText(a)
        case es => throw new IllegalArgumentException(
          s"expected 1 argument, got ${es.length}") }))
  }
}
