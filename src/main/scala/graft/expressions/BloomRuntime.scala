package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Explicit bloom-filter semi-join pruning, built from the same Catalyst
  * expressions Spark's own InjectRuntimeFilter rule plants
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, both codegen'd).
  *
  * Spark only injects runtime bloom filters when a shuffle is provably
  * on the probe side and CBO stats clear its thresholds — conditions a
  * bare-parquet lake often fails. Registering the pair as SQL functions
  * lets a pipeline author place the filter deliberately:
  *
  * {{{
  *   might_contain((SELECT bloom_agg(o_orderkey) FROM dim), xxhash64(l_orderkey))
  * }}}
  *
  * The scalar subquery executes once (one compact sketch, never the dim
  * rows), is injected as a literal, and the probe-side scan drops
  * non-matching rows BEFORE the join shuffle — the 100 TB win: shuffle
  * bytes scale with the semi-join selectivity instead of the fact table.
  * Both sides hash with `xxhash64` (seed 42) so the aggregate's inserts
  * and the probe's lookups agree.
  */
object BloomRuntime {
  /** Only the FIRST argument is the inserted value; the optional
    * trailing args size the sketch (estimatedNumItems, numBits).
    */
  private[expressions] def buildAgg(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): BloomFilterAggregate =
    exprs match {
      case Seq(c) => new BloomFilterAggregate(new XxHash64(Seq(c)))
      case Seq(c, n, b) => new BloomFilterAggregate(new XxHash64(Seq(c)), n, b)
      case other => throw new IllegalArgumentException(
        s"bloom_agg takes 1 or 3 arguments, got ${other.size}")
    }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", buildAgg, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain", exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}
