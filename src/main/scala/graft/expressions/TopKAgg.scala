package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Group-wise top-k as a mergeable Catalyst aggregate — the scale-first
  * alternative to the `row_number() OVER (PARTITION BY g ORDER BY v) <= k`
  * window idiom.
  *
  * The window form materializes and SORTS every group in full before
  * discarding all but k rows: one shuffle of the whole fact plus an
  * O(n log n) per-group sort. This aggregate keeps a bounded k-element
  * buffer per group instead, so it rides the normal partial-aggregation
  * path: map-side combine shrinks each partition's contribution to
  * ≤ k rows per group BEFORE the shuffle, shuffle volume is
  * O(groups · k) regardless of fact size, and no sort of the corpus ever
  * happens (the only sorts are k-element buffer compactions). Merge is
  * "concatenate + re-truncate", associative and commutative, so the
  * result is deterministic under any partitioning — the property that
  * makes it safe at 1000 executors.
  *
  * Ordering is total and explicit: ord DESC, then tie1 ASC, tie2 ASC
  * (callers pass unique tiebreak keys; SURVEY §2.12 rule 1). NaN ord
  * values rank GREATEST (java.lang.Double.compare semantics — the same
  * convention as Spark's sort, and what keeps the comparator
  * transitive). Rows where ord or a tie key is NULL are skipped, like
  * any Spark aggregate input — note this DIVERGES from the row_number
  * window idiom, which ranks null-keyed rows instead of dropping them.
  * Returns the winners as an array<struct<ord,tie1,tie2>> in rank
  * order — callers `posexplode` it to get (rank, row).
  */
case class TopKByAgg(
    ord: Expression,
    tie1: Expression,
    tie2: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long, Long)]] {

  require(k > 0 && k <= 1000000, s"topk_by k must be in [1, 1e6], got $k")

  override def children: Seq[Expression] = Seq(ord, tie1, tie2)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long, Long)] =
    mutable.ArrayBuffer.empty

  /** true iff x ranks strictly before y (ord DESC, tie1 ASC, tie2 ASC).
    * Double.compare (not raw >) keeps the comparator total when NaN
    * appears: NaN compares greatest, so sortWith never sees the
    * contract-violating `NaN > x == false && x > NaN == false` case.
    */
  private def beats(x: (Double, Long, Long), y: (Double, Long, Long)): Boolean = {
    val c = java.lang.Double.compare(x._1, y._1)
    c > 0 || (c == 0 &&
      (x._2 < y._2 || (x._2 == y._2 && x._3 < y._3)))
  }

  private def compact(buf: mutable.ArrayBuffer[(Double, Long, Long)]): Unit =
    if (buf.length > k) {
      val kept = buf.sortWith(beats).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(
      buf: mutable.ArrayBuffer[(Double, Long, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long, Long)] = {
    val o = ord.eval(input)
    val t1 = tie1.eval(input)
    val t2 = tie2.eval(input)
    if (o != null && t1 != null && t2 != null) {
      buf += ((o.asInstanceOf[Double], t1.asInstanceOf[Long], t2.asInstanceOf[Long]))
      // amortized: sort-and-truncate every 4k appends, never per row
      if (buf.length >= math.max(4 * k, 64)) compact(buf)
    }
    buf
  }

  override def merge(
      a: mutable.ArrayBuffer[(Double, Long, Long)],
      b: mutable.ArrayBuffer[(Double, Long, Long)]): mutable.ArrayBuffer[(Double, Long, Long)] = {
    a ++= b
    compact(a)
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long, Long)]): Any = {
    val ranked = buf.sortWith(beats).take(k)
    new GenericArrayData(ranked.map(r => InternalRow(r._1, r._2, r._3)).toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long, Long)]): Array[Byte] = {
    compact(buf)
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 24)
    bb.putInt(buf.length)
    buf.foreach { case (o, t1, t2) => bb.putDouble(o); bb.putLong(t1); bb.putLong(t2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.ArrayBuffer.empty[(Double, Long, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKByAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKByAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(ord = newChildren(0), tie1 = newChildren(1), tie2 = newChildren(2))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("tie1", LongType, nullable = false),
    StructField("tie2", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by"
}

object TopKByAgg {
  /** Register `topk_by(ord, tie1, tie2, k)` on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by",
      exprs => TopKByAgg(
        Cast(exprs.head, DoubleType),
        Cast(exprs(1), LongType),
        Cast(exprs(2), LongType),
        exprs(3).eval(InternalRow.empty) match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.intValue()
          case other => other.toString.toInt
        }),
      "built-in")
}
