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
    * Implemented as a map-side-combined min_by aggregation, NOT a
    * row_number window: the window would exchange all n·k crossed rows
    * (each carrying both vector arrays) and sort them; min_by partial-
    * aggregates inside the input partitions, so only n single-row
    * states cross the wire. Ties break on cid via the (d2, cid) struct
    * ordering — identical results to the window formulation (golden
    * digests unchanged).
    */
  def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = VectorFunctions.sqDist(col("v"), col("cvec"))
    e.crossJoin(broadcast(cents))
      .groupBy("vec_id")
      .agg(
        first(col("v")).as("v"), // constant within the group
        min_by(struct(col("cid"), col("cvec")), struct(d2, col("cid"))).as("__best"))
      .select(col("vec_id"), col("v"),
        col("__best.cid").as("cid"), col("__best.cvec").as("cvec"))
  }

  /** Recompute centroids as per-dimension means of their members. */
  def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")))
      .groupBy("cid", "pos").agg(avg("col").as("c"))
      .groupBy("cid").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          _.getField("c")).as("cvec"))
}
