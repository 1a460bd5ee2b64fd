package graft.functions

import org.apache.spark.sql.DataFrame
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

  /** Nearest-centroid assignment; keeps (vec_id, v, cid, cvec).
    * The k centroids are packed cid-sorted into ONE broadcast row and
    * the argmin is a single native `argmin_sqdist` projection — the
    * vector row never leaves its partition (zero shuffle; the round-1
    * min_by formulation still exchanged n single-row aggregation states).
    * Ties keep the lowest index = lowest cid (cid-sorted packing), so
    * results are identical to the `row_number() OVER (ORDER BY d2, cid)`
    * oracle formulation.
    */
  def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    graft.expressions.VectorExpressions.register(e.sparkSession)
    val packed = cents
      .agg(array_sort(collect_list(struct(col("cid"), col("cvec")))).as("cs"))
      .select(transform(col("cs"), _.getField("cid")).as("cids"),
        transform(col("cs"), _.getField("cvec")).as("cvecs"))
    e.crossJoin(broadcast(packed))
      .withColumn("__i", expr("argmin_sqdist(v, cvecs)") + 1)
      .select(col("vec_id"), col("v"),
        element_at(col("cids"), col("__i")).as("cid"),
        element_at(col("cvecs"), col("__i")).as("cvec"))
  }

  /** Recompute centroids as per-dimension means of their members. */
  def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")))
      .groupBy("cid", "pos").agg(avg("col").as("c"))
      .groupBy("cid").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          _.getField("c")).as("cvec"))
}
