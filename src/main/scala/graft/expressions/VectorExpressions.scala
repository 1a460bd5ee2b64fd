package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `ArrayType(FloatType)` columns, with whole-stage codegen (`doGenCode`
  * emits a tight primitive loop — no per-element Column-expression
  * overhead, no boxing, no lambda dispatch).
  *
  * Numerical contract: float multiply, widen each product to double,
  * accumulate left-to-right from 0.0 — IDENTICAL to the HOF formulation
  * in graft.functions.VectorFunctions.cosine, so swapping one for the
  * other can never change a query's hash-checked result.
  *
  * Scale note: a per-row scalar expression — fully parallel, no shuffle;
  * at 100 TB this is the inner loop of the ANN scan, which is why it gets
  * the codegen treatment (the HOF version allocates an intermediate array
  * per row for the zip_with products; this one allocates nothing).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // Length mismatch → NULL, matching the HOF twin (zip_with pads the
    // shorter side with null and null propagates through the fold).
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i)
      val yi = y.getFloat(i)
      dot += (xi * yi).toDouble
      na += (xi * xi).toDouble
      nb += (yi * yi).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  final int $n = $a.numElements();
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final float $x = $a.getFloat($i);
        |    final float $y = $b.getFloat($i);
        |    $dot += (double) ($x * $y);
        |    $na += (double) ($x * $x);
        |    $nb += (double) ($y * $y);
        |  }
        |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Register the native functions on a session's function registry so
    * `expr("cosine_similarity(a, b)")` resolves (used by query fns that
    * receive an extension-less session from the driver).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokens_of", exprs => TokensOf(exprs.head), "built-in")
  }
}

/** SparkSessionExtensions installer — the official injection route for
  * library users:
  * `SparkSession.builder().withExtensions(new GraftExtensions) …` or
  * `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HyperLogLogAgg].getName, "hll_distinct"),
      (exprs: Seq[Expression]) => HyperLogLogAgg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("tokens_of"),
      new ExpressionInfo(classOf[TokensOf].getName, "tokens_of"),
      (exprs: Seq[Expression]) => TokensOf(exprs.head)))
    ext.injectOptimizerRule(_ => graft.plans.RangeBandJoinRule())
  }
}
