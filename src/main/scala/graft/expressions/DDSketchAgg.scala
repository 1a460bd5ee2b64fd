package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

import scala.collection.mutable

/** DDSketch quantile aggregate as a Catalyst `TypedImperativeAggregate`
  * — the mergeable-sketch quantile companion to [[HyperLogLogAgg]]
  * (distinct counts) and the built-in GK `approx_percentile`.
  *
  * DDSketch (Masson, Rim, Lee — VLDB 2019, "DDSketch: a fast and
  * fully-mergeable quantile sketch with relative-error guarantees"):
  * positive values map to geometric buckets i = ceil(log_γ(x)) with
  * γ = (1+α)/(1−α); the quantile estimate 2γ^i/(γ+1) (the bucket's
  * geometric midpoint) is then within relative error α of the true
  * value — a GUARANTEE, not an expectation, which is what makes the
  * band-check oracle sound. Merge = bucket-wise count add: associative,
  * commutative, deterministic under any partitioning — partial
  * aggregation works exactly like a built-in agg and shuffle volume is
  * O(groups · buckets), independent of row count. At α = 0.02, values
  * spanning 1..1e6 need ~⌈log_γ 1e6⌉ ≈ 350 buckets — a few KB per
  * group at 100 TB.
  *
  * Scope: strictly-positive inputs (prices, latencies, sizes — the
  * sketch's native domain); non-positive values are rejected loudly
  * rather than silently bucketed wrong.
  */
case class DDSketchAgg(
    child: Expression,
    quantile: Double,
    alpha: Double = 0.02,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] with UnaryLike[Expression] {

  require(quantile >= 0.0 && quantile <= 1.0, s"quantile must be in [0,1], got $quantile")
  require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")

  private val gamma: Double = (1.0 + alpha) / (1.0 - alpha)
  private val logGamma: Double = math.log(gamma)

  override def createAggregationBuffer(): mutable.LongMap[Long] = mutable.LongMap.empty

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (x <= 0.0 || x.isNaN || x.isInfinity) throw new IllegalArgumentException(
        s"ddsketch_quantile requires strictly positive finite values, got $x")
      val idx = math.ceil(math.log(x) / logGamma).toLong
      buf.update(idx, buf.getOrElse(idx, 0L) + 1L)
    }
    buf
  }

  override def merge(a: mutable.LongMap[Long], b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    a
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) null
    else {
      val n = buf.values.sum
      // rank of the q-quantile under the same nearest-rank convention
      // DDSketch's guarantee is stated for
      val target = math.max(0L, math.ceil(quantile * (n - 1)).toLong)
      val sorted = buf.toArray.sortBy(_._1)
      var cum = 0L
      var i = 0
      var idx = sorted(0)._1
      while (i < sorted.length && cum + sorted(i)._2 <= target) {
        cum += sorted(i)._2
        i += 1
      }
      if (i < sorted.length) idx = sorted(i)._1
      else idx = sorted(sorted.length - 1)._1
      2.0 * math.pow(gamma, idx.toDouble) / (gamma + 1.0)
    }
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    // sorted for a canonical byte form (merge order must not leak)
    buf.toArray.sortBy(_._1).foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(off: Int): DDSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): DDSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): DDSketchAgg =
    copy(child = newChild)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ddsketch_quantile"
}

object DDSketchAgg {
  /** Register `ddsketch_quantile(col, q)` (α = 0.02) on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ddsketch_quantile",
      exprs => DDSketchAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs.head, DoubleType),
        exprs(1).eval(InternalRow.empty) match {
          case d: java.lang.Double => d.doubleValue()
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case other => other.toString.toDouble
        }),
      "built-in")
}
