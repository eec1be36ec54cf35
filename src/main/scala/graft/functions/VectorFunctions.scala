package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expressions for embedding math over `array<float>` /
  * `array<double>` columns (the `embeddings.embedding` fixture column).
  *
  * Why a custom Expression rather than `zip_with`/`aggregate` built-ins or
  * a Scala UDF: the built-in higher-order functions bind a lambda variable
  * per element and break the tight loop; a UDF additionally pays
  * serialization. These expressions generate a primitive `for` loop over
  * the underlying `ArrayData` (no boxing, no allocation), so a 64-float
  * dot product stays a ~64-iteration FMA loop inside WholeStageCodegen —
  * the difference between feasible and not at 2000×2000 (bench) or
  * 10⁹-row (cluster) pair scoring.
  *
  * Accumulation is always double precision, which makes results
  * comparable with the DuckDB oracle's double-precision reference
  * implementation to well under the 9-significant-digit canonicalization.
  */
abstract class FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Element accessor is chosen from the static input type, so the same
    * expression works for array<float> and array<double>. */
  protected lazy val elemIsDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  protected def get(a: ArrayData, i: Int): Double =
    if (elemIsDouble) a.getDouble(i) else a.getFloat(i).toDouble
  protected def getter: String = if (elemIsDouble) "getDouble" else "getFloat"

  protected def loopCode(ctx: CodegenContext, a: String, b: String,
                         result: String): String
  protected def eval(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    eval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => loopCode(ctx, a, b, ev.value.code))
}

/** dot(a, b) = Σ aᵢ·bᵢ in double precision. */
case class DotProduct(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "dot_product"
  override protected def eval(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, i) * get(b, i); i += 1 }
    s
  }
  // Every Java local goes through ctx.freshName: two instances of this
  // expression in one generated function would otherwise redeclare the
  // same identifiers — a janino CompileException that silently drops the
  // whole stage to interpreted execution.
  override protected def loopCode(ctx: CodegenContext, a: String, b: String,
                                  result: String): String = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    s"""
       |int $n = Math.min($a.numElements(), $b.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += (double)$a.$getter($i) * (double)$b.$getter($i);
       |}
       |$result = $acc;
       |""".stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot(a,b) / (‖a‖·‖b‖); 0.0 when either norm is 0.
  * One fused loop — a and b are each traversed exactly once. */
case class CosineSimilarity(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "cosine_similarity"
  override protected def eval(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i); val y = get(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def loopCode(ctx: CodegenContext, a: String, b: String,
                                  result: String): String = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    s"""
       |int $n = Math.min($a.numElements(), $b.numElements());
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = (double)$a.$getter($i);
       |  double $y = (double)$b.$getter($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |$result = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
       |""".stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** margin(js, xs, ws) = Σ ws[js(i)] · xs(i) — the per-doc linear-model
  * margin over array-packed sparse features (parallel arrays: bucket
  * ids `js: array<int>`, values `xs: array<double>`) against a dense
  * weight vector `ws: array<double>` (a constant-folded literal in the
  * classifier paths). The row-local form of the x125 fit/serve margin:
  * evaluating it per doc row removes the per-iteration doc-grain
  * window (shuffle + sort) the flat (doc, j, x) layout needed — the
  * iteration's only exchange left is the model-sized gradient-partial
  * aggregation. Same double-precision accumulation discipline as the
  * expressions above; summation order is the array order (j-ascending
  * after sort_array), which makes the fit MORE deterministic than the
  * window-order sum it replaces. No bounds guard on js: the classifier
  * packs j ∈ [0, 16^QcHexLen) by construction and ws is exactly that
  * long — an out-of-range id is a build bug and should throw. */
case class IndexedDot(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "indexed_dot"
  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val js = a.asInstanceOf[ArrayData]; val xs = b.asInstanceOf[ArrayData]
    val ws = c.asInstanceOf[ArrayData]
    val n = math.min(js.numElements(), xs.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += ws.getDouble(js.getInt(i)) * xs.getDouble(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $c.getDouble($a.getInt($i)) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Column/SQL facade. `Column ↔ Expression` bridging is sql-private in
  * Spark 4, so construction goes through the session FunctionRegistry +
  * the public `call_function` — same analysis path as built-ins. */
object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Source string must be exactly "built-in" — Spark 4 validates it
    // against ExpressionInfo's accepted set and throws otherwise.
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_similarity", es => CosineSimilarity(es.head, es(1)), "built-in")
  }

  /** Requires [[register]] to have been called on the active session. */
  // Scala builders construct the expression directly — no registry and
  // no active session needed (register stays for the SQL-text surface)
  import org.apache.spark.sql.{GraftColumnBridge => B}
  def dot_product(a: Column, b: Column): Column =
    B.column(DotProduct(B.expression(a), B.expression(b)))
  def cosine_similarity(a: Column, b: Column): Column =
    B.column(CosineSimilarity(B.expression(a), B.expression(b)))
  def indexed_dot(js: Column, xs: Column, ws: Column): Column =
    B.column(IndexedDot(B.expression(js), B.expression(xs), B.expression(ws)))
}
