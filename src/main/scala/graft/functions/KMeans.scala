package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd-iteration building blocks over (vec_id, v: array<double>)
  * vector tables and (cid, cvec: array<double>) centroid tables, shared
  * by q_sim_7_kmeans (training) and q_sim_8_ann_multiprobe (IVF index +
  * search).
  *
  * Scale notes: `assign` broadcasts the k centroids and argmins per row —
  * no shuffle of the vector table, O(n·k·dim) flops, embarrassingly
  * parallel. `update` shuffles exploded (cid, pos, val) rows but Spark's
  * hash aggregate partial-combines map-side, so wire volume is
  * executors×k×dim, not n×dim. Deterministic throughout: argmin ties
  * break on cid; centroid arrays are rebuilt in pos order.
  */
object KMeans {

  /** Nearest-centroid assignment; keeps (vec_id, v, cid, cvec). */
  def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(VectorFunctions.sqDist(col("v"), col("cvec")), col("cid"))
    e.crossJoin(broadcast(cents))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"), col("cvec"))
  }

  /** Recompute centroids as per-dimension means of their members. */
  def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")))
      .groupBy("cid", "pos").agg(avg("col").as("c"))
      .groupBy("cid").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          _.getField("c")).as("cvec"))
}
