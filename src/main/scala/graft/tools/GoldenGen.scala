package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerate the golden sf0.001 snapshots (row count + content digest
  * per declared query) → src/test/resources/golden_sf0001.txt.
  * Run after intentionally changing any query's semantics; GoldenSpec
  * fails on any unintentional drift without needing DuckDB.
  */
object GoldenGen {
  def digestOf(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val rows = df.collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      md.update(r.mkString("", "", "").getBytes("UTF-8"))
    }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  def main(args: Array[String]): Unit = {
    val spark = LocalSession("8") // MUST match SparkSpec: goldens are digested at local[8]/shuffle=8
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val out = new StringBuilder
    graft.Registry.all.foreach { q =>
      val (n, h) = digestOf(q.fn(spark, sf))
      out.append(s"${q.name},$n,$h\n")
    }
    val path = java.nio.file.Paths.get("src/test/resources/golden_sf0001.txt")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, out.toString)
    println(s"wrote ${graft.Registry.all.size} snapshots to $path")
    spark.stop()
  }
}
