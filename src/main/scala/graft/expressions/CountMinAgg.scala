package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * Catalyst `TypedImperativeAggregate` — the frequency-estimation member
  * of the engine's mergeable-sketch family (HLL = distinct counts,
  * DDSketch = quantiles, CM = per-key counts).
  *
  * depth hash rows × width counters; update increments one counter per
  * row, estimate = min over rows. The one-sided guarantee — estimate ≥
  * true count always, and ≤ true + t·N/width with probability
  * ≥ 1 − t^{-depth} — is what the band-check oracle asserts
  * (q_agg_24_countmin). Merge is counter-wise add: associative,
  * commutative, deterministic under any partitioning; partial
  * aggregation shuffles O(width · depth) longs per group regardless of
  * row count — at 100 TB the sketch is the only thing that moves.
  *
  * Hashes are the same overflow-safe multiplicative family the engine
  * uses everywhere (deterministicSplit, q_scan_13):
  * ((v mod p) · A_j + B_j) mod p mod width, p = 1e9+7 — so probe
  * expressions in plain SQL/Column arithmetic reproduce them exactly
  * (graft.expressions.CountMinAgg.probe).
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(width > 0 && width <= (1 << 20), s"countmin width must be in [1, 2^20], got $width")
  require(depth > 0 && depth <= CountMinAgg.A.length,
    s"countmin depth must be in [1, ${CountMinAgg.A.length}], got $depth")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](width * depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < depth) {
        buf(j * width + CountMinAgg.hash(x, j, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): CountMinAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMinAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "countmin"
}

object CountMinAgg {
  val P: Long = 1000000007L
  /** xxhash/Knuth multiplicative primes — one row per hash. */
  val A: Array[Long] = Array(2654435761L, 2246822519L, 3266489917L, 668265263L,
    374761393L, 2123456791L, 1597334677L, 2869860233L)
  val B: Array[Long] = Array(1L, 2L, 3L, 5L, 7L, 11L, 13L, 17L)

  /** Row-j bucket of value v — ((v mod p)·A_j + B_j) mod p mod width.
    * (v mod p) < 1e9 and A_j < 2^32, so the product stays under 2^62:
    * overflow-safe in BIGINT on both engines.
    */
  def hash(v: Long, j: Int, width: Int): Int =
    ((((v % P + P) % P) * A(j) + B(j)) % P % width).toInt

  /** The same bucket as a Column expression over a BIGINT column —
    * probe side of the sketch, mirroring [[hash]] term for term.
    */
  def probe(v: org.apache.spark.sql.Column, j: Int, width: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod}
    (pmod(v, lit(P)) * A(j) + B(j)) % P % width
  }

  /** Register `countmin(col, width, depth)` on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "countmin",
      exprs => CountMinAgg(
        Cast(exprs.head, LongType),
        exprs(1).eval(InternalRow.empty).toString.toInt,
        exprs(2).eval(InternalRow.empty).toString.toInt),
      "built-in")
}
