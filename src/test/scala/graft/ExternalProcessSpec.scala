package graft

import graft.api.ExternalProcess
import org.apache.spark.sql.functions._

/** The arbitrary-language UDF surface: line protocol, loud-failure
  * contract, and python-vs-Spark value agreement for the declared
  * demo query.
  */
class ExternalProcessSpec extends SparkSpec {

  import spark.implicits._

  test("pipeLines through cat is the identity, with the output column appended") {
    val src = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "s")
      .repartition(2)
    val out = ExternalProcess.pipeLines(src, "s", "echoed", Seq("cat"))
    assert(out.columns.toSeq == Seq("id", "s", "echoed"))
    assert(out.filter(col("s") =!= col("echoed")).count() == 0)
    assert(out.count() == 3)
  }

  test("pipeLines survives empty partitions (no process spawned for them)") {
    val src = Seq((1L, "x")).toDF("id", "s").repartition(8)
    assert(ExternalProcess.pipeLines(src, "s", "o", Seq("cat")).count() == 1)
  }

  test("row-count mismatch fails loudly, not silently") {
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s").coalesce(1)
    val dropper = Seq("python3", "-c",
      "import sys\nlines = sys.stdin.readlines()\nfor l in lines[1:]: print(l, end='')")
    val e = intercept[Exception] {
      ExternalProcess.pipeLines(src, "s", "o", dropper).count()
    }
    assert(e.getMessage.contains("one output line per input line")
      || Option(e.getCause).exists(_.getMessage.contains("one output line per input line")))
  }

  test("non-zero exit fails loudly") {
    val src = Seq((1L, "a")).toDF("id", "s").coalesce(1)
    val bad = Seq("python3", "-c", "import sys\nsys.stdin.read()\nsys.exit(3)")
    val e = intercept[Exception] {
      ExternalProcess.pipeLines(src, "s", "o", bad).count()
    }
    assert(e.getMessage.contains("exited 3")
      || Option(e.getCause).exists(_.getMessage.contains("exited 3")))
  }

  test("raw newline in the payload is rejected with the framing hint") {
    val src = Seq((1L, "two\nlines")).toDF("id", "s").coalesce(1)
    val e = intercept[Exception] {
      ExternalProcess.pipeLines(src, "s", "o", Seq("cat")).count()
    }
    assert(e.getMessage.contains("to_json")
      || Option(e.getCause).exists(_.getMessage.contains("to_json")))
  }

  test("q_udf_2_pipe: python-side values equal the Spark-native computation") {
    val got = Registry.byName("q_udf_2_pipe").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Spark-native twin: length() counts UTF-16 code units and python
    // len() counts code points, but the fixtures are ASCII where the two
    // agree; split(" ") semantics (keep empties) match python split(" ")
    val want = graft.sources.Tables(spark, sf, "documents")
      .select(col("lang"), coalesce(col("text"), lit("")).as("t"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("t"))).as("sum_nfc_len"),
        sum(size(array_distinct(split(col("t"), " ")))).as("sum_uniq_toks"))
      .orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sameElements(want), s"got=${got.toSeq}\nwant=${want.toSeq}")
  }
}
