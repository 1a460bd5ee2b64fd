package graft.tools
import org.apache.spark.sql.functions._
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val edges = graft.sources.SampledEdges.handoff(spark, d, 200)
    println("edges=" + edges.count())
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().localCheckpoint()
    println("nodes=" + nodes.count())
    val root = nodes.agg(min("node")).head().getLong(0)
    for (aqe <- Seq("true", "false"); i <- 1 to 2) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val t0 = System.nanoTime()
      val d1 = graft.api.Pipelines.bfsDistances(nodes, "node", edges, "src", "dst", root, maxIters = 40)
      val mx = d1.agg(max("dist"), count(lit(1))).head()
      println(s"aqe=$aqe pass$i: ecc=${mx.getLong(0)} reached=${mx.getLong(1)} time=${(System.nanoTime()-t0)/1e9}s")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
