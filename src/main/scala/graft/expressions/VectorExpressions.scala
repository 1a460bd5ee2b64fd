package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

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
  // NULL on length mismatch even for non-null inputs — see ArgminSqDist.
  override def nullable: Boolean = true
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

/** Nearest-centroid index: `argmin_sqdist(vec, cvecs)` returns the
  * 0-based index into `cvecs` (an array of centroid vectors) minimizing
  * squared euclidean distance to `vec`; ties keep the lowest index, so
  * with centroids packed in cid order this is exactly
  * `row_number() OVER (ORDER BY d2, cid) = 1`.
  *
  * Numerical contract: identical to VectorFunctions.sqDist (and its
  * DuckDB mirror) — subtract in the element type (float or double),
  * widen the diff to double, square and left-fold from 0.0. Centroids
  * with a length different from `vec` are skipped (the HOF twin yields
  * a null distance there, which sorts last); all-skipped/empty → NULL.
  *
  * Scale note: this is the shuffle-free IVF/k-means assignment — the
  * corpus row never leaves its partition; the k centroids ride in as one
  * broadcast row. Replaces the crossJoin+window (n×k wide-row shuffle +
  * sort) and groupBy-min_by (n-row shuffle) formulations.
  */
case class ArgminSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => DoubleType
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(ArrayType(b, _), _))
        if a == b && (a == FloatType || a == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<array<float>>) or (array<double>, " +
        s"array<array<double>>), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  // Can produce NULL even for non-null inputs (empty / all-mismatched
  // centroid array), so nullable regardless of child nullability —
  // keeps nullSafeCodeGen's isNull a real variable.
  override def nullable: Boolean = true
  override def prettyName: String = "argmin_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    val isFloat = elemType == FloatType
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cs.numElements()) {
      if (!cs.isNullAt(c)) {
        val cv = cs.getArray(c)
        if (cv.numElements() == n) {
          var d = 0.0
          var i = 0
          if (isFloat) while (i < n) {
            val df = v.getFloat(i) - cv.getFloat(i)
            d += df.toDouble * df.toDouble
            i += 1
          } else while (i < n) {
            val dd = v.getDouble(i) - cv.getDouble(i)
            d += dd * dd
            i += 1
          }
          if (d < bestD) { bestD = d; best = c }
        }
      }
      c += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val df = ctx.freshName("df")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val (jty, getter) =
        if (elemType == FloatType) ("float", "getFloat") else ("double", "getDouble")
      s"""
        |final int $n = $v.numElements();
        |int $best = -1;
        |double $bestD = Double.POSITIVE_INFINITY;
        |for (int $c = 0; $c < $cs.numElements(); $c++) {
        |  if ($cs.isNullAt($c)) continue;
        |  final org.apache.spark.sql.catalyst.util.ArrayData $cv = $cs.getArray($c);
        |  if ($cv.numElements() != $n) continue;
        |  double $d = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final $jty $df = $v.$getter($i) - $cv.$getter($i);
        |    $d += (double) $df * (double) $df;
        |  }
        |  if ($d < $bestD) { $bestD = $d; $best = $c; }
        |}
        |if ($best < 0) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgminSqDist =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket: `lsh_bucket(vec, p)` computes p sign
  * bits over deterministic pseudo-random hyperplanes
  * w[i][j] = ((i·31 + j·17) mod 7) − 3 (i = dimension, j = plane) and
  * packs them little-endian into a long: bit j set iff Σᵢ vecᵢ·w[i][j] > 0.
  *
  * Numerical contract: identical to the HOF formulation it replaces
  * (and the DuckDB list_reduce oracle) — each element widens to double,
  * multiplies by the integer weight, left-folds from 0.0; strict `> 0`
  * sign test. The nested-lambda HOF version defeated whole-stage codegen
  * (two aggregate() levels with a captured outer variable); this is one
  * tight codegen'd loop, p·dim multiply-adds per row, no allocation.
  */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, int), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(a: Any, p: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val planes = p.asInstanceOf[Int]
    val n = x.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += x.getFloat(i).toDouble * (((i * 31 + j * 17) % 7) - 3).toDouble
        i += 1
      }
      if (dot > 0) bucket += (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, p) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
        |final int $n = $x.numElements();
        |long $bucket = 0L;
        |for (int $j = 0; $j < $p; $j++) {
        |  double $dot = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $dot += (double) $x.getFloat($i) * (double) ((($i * 31 + $j * 17) % 7) - 3);
        |  }
        |  if ($dot > 0) $bucket += (1L << $j);
        |}
        |${ev.value} = $bucket;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBucket =
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmin_sqdist", exprs => ArgminSqDist(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bucket", exprs => LshBucket(exprs(0), exprs(1)), "built-in")
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
    ext.injectFunction((
      FunctionIdentifier("argmin_sqdist"),
      new ExpressionInfo(classOf[ArgminSqDist].getName, "argmin_sqdist"),
      (exprs: Seq[Expression]) => ArgminSqDist(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      (exprs: Seq[Expression]) => LshBucket(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (exprs: Seq[Expression]) => BloomRuntime.buildAgg(exprs)))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.RangeBandJoinRule())
  }
}
