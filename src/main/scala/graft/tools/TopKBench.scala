package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev evidence: group-wise top-k via the window idiom vs the native
  * `topk_by` mergeable aggregate, on a synthetic frame whose groups are
  * big enough to expose the difference the fixture tables cannot
  * (50k rows/group vs the fixtures' ~200): the window form must
  * shuffle + sort ALL rows per group before discarding all but k,
  * while the aggregate's map-side combine caps the shuffle at
  * O(groups · k). Results are asserted identical before timing.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expressions.TopKByAgg.register(spark)

    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val groups = 100L
    // deterministic pseudo-random ordering value (no RNG: reruns match)
    val df = spark.range(n).select(
      (col("id") % groups).as("g"),
      pmod(col("id") * 2654435761L, lit(1000000007L)).cast("double").as("v"),
      col("id").as("t1"), lit(0L).as("t2"))
      .localCheckpoint()

    val w = Window.partitionBy("g").orderBy(col("v").desc, col("t1"), col("t2"))
    def windowForm = df
      .select(col("g"), row_number().over(w).as("rnk"), col("v"), col("t1"))
      .filter(col("rnk") <= 3)
      .select(col("g"), (col("rnk") - 1).cast("int").as("pos"), col("v"), col("t1"))
    def aggForm = df
      .groupBy("g").agg(expr("topk_by(v, t1, t2, 3)").as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.ord").as("v"), col("col.tie1").as("t1"))

    val a = windowForm.orderBy("g", "pos").collect().toSeq
    val b = aggForm.orderBy("g", "pos").collect().toSeq
    require(a.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      == b.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))),
      "window and topk_by forms disagree")

    def time(name: String, f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s min=${ts.min}%.2fs  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    println(s"rows=$n groups=$groups k=3")
    time("window row_number", windowForm.count())
    time("native topk_by", aggForm.count())
    spark.stop()
  }
}
