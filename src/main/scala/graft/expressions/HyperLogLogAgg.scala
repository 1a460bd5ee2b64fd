package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom HyperLogLog distinct-count sketch as a Catalyst
  * `TypedImperativeAggregate` (SURVEY §2.11 q_udaf_2 stretch goal).
  *
  * Buffer = 2^p byte registers (p=12 → 4 KiB, ~1.6% standard error).
  * update: register[hash >>> (64-p)] = max(reg, leadingZeros(rest)+1);
  * merge: element-wise max — associative and commutative, so partial
  * aggregation (map-side combine) works exactly like built-in aggs and
  * shuffle volume is O(groups · 4 KiB) regardless of row count.
  *
  * Scale note: this is the sketch shape used for distinct counts over
  * 100 TB — mergeable state, single pass, no shuffle of raw values. The
  * built-in approx_count_distinct covers the same capability; this
  * implementation exists to exercise the TypedImperativeAggregate
  * extension point with explicit serialize/merge control.
  */
case class HyperLogLogAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    p: Int = 12)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val m: Int = 1 << p
  private val alphaMM: Double = p match {
    case 4 => 0.673 * m * m
    case 5 => 0.697 * m * m
    case 6 => 0.709 * m * m
    case _ => (0.7213 / (1.0 + 1.079 / m)) * m * m
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - p)).toInt
      val rest = h << p
      // rank = position of the first 1-bit in the remaining 64-p bits
      val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (p - 1))) + 1).toByte
      if (rank > buf(idx)) buf(idx) = rank
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val e = alphaMM / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else e
    math.round(corrected)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(off: Int): HyperLogLogAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HyperLogLogAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): HyperLogLogAgg =
    copy(child = newChild)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"
}

object HyperLogLogAgg {
  /** Register `hll_distinct(col)` on a session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_distinct", exprs => HyperLogLogAgg(exprs.head), "built-in")
}
