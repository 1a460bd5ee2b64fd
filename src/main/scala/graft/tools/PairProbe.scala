package graft.tools
object PairProbe {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession("32")
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      val r = graft.Registry.byName("q_join_8_theta_range").fn(spark, d)
        .agg(org.apache.spark.sql.functions.sum("n_pairs")).head()
      println(s"$d total_pairs=${r.get(0)}")
    }
    spark.stop()
  }
}
