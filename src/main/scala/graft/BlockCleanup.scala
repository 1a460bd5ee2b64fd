package graft

import org.apache.spark.sql.SparkSession

/** Per-query block-manager janitor for the harness mains (round 9,
  * verdict item 3 — the bench run1→run2 drift).
  *
  * Many queries materialize an intermediate with `localCheckpoint()`
  * (148 operator sites); each invocation pins fresh MEMORY_AND_DISK
  * blocks that nothing unpersists, so a 603-query bench accumulates
  * storage blocks across its warm + two timed passes, squeezing
  * execution memory for the later queries (run2 measured +77 s over
  * run1 in BENCH_r08). Calling this after each query drops every
  * persistent RDD except the session-scoped [[sources.SampledEdges]]
  * cache, which the whole graph family shares by design.
  *
  * Unpersisting a locally checkpointed RDD makes Spark WARN that its
  * truncated lineage cannot recompute — correct and intended here (the
  * query is finished; the blocks are garbage), so the sweep silences
  * that one logger for its duration.
  */
object BlockCleanup {

  /** Run `body` with the RDD-class loggers that emit the
    * "locally checkpointed … cannot be recomputed" WARN held at ERROR.
    */
  def silencingCheckpointWarn[A](body: => A): A = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val logger = "org.apache.spark.rdd"
    val prev = LogManager.getLogger(logger).getLevel
    Configurator.setLevel(logger, Level.ERROR)
    try body finally Configurator.setLevel(logger, prev)
  }

  /** Unpersist every persistent RDD except the shared SampledEdges
    * cache. Cheap (async driver messages); call between queries.
    */
  def apply(spark: SparkSession): Unit = {
    val keep = sources.SampledEdges.persistentRddIds
    val residue = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => keep.contains(id) }
    if (residue.nonEmpty) silencingCheckpointWarn {
      residue.foreach { case (_, rdd) => scala.util.Try(rdd.unpersist(false)) }
    }
  }
}
