package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.Num.round
import org.apache.spark.sql.Encoders

/** §2.11 — user-defined scalar / aggregate / table functions.
  *
  * Scale notes: a Scala UDF is an opaque codegen boundary (serialization +
  * no pushdown through it) — q_udf_1 exists to exercise the surface and is
  * deliberately paired with the equivalent built-in-functions expression.
  * The typed Aggregator UDAF participates in partial aggregation (its
  * buffer merges map-side), so it scales like a built-in agg. The typed
  * flatMap "UDTF" is the Dataset-native generator form.
  */
object Extensibility {

  /** Weighted average as a typed Aggregator: IN=(value, weight). */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Double)): Double = r._1 / r._2
    def bufferEncoder = Encoders.product[(Double, Double)]
    def outputEncoder = Encoders.scalaDouble
  }

  final case class Doc(doc_id: Long, text: String)

  val all: Seq[Q] = Seq(

    Q("q_udf_1_scalar",
      """SELECT c_custkey,
        | upper(substring(lower(c_mktsegment), 1, 1)) || lower(substring(lower(c_mktsegment), 2)) AS seg_title_udf,
        | upper(substring(lower(c_mktsegment), 1, 1)) || lower(substring(lower(c_mktsegment), 2)) AS seg_title_builtin
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      // Same logic twice: as a Scala UDF (opaque to Catalyst) and as a
      // built-in-functions Column (codegen'd) — the comparison the survey
      // calls for. Single-token segments → title case = capitalize.
      val titleCase = udf((v: String) =>
        v.split(' ').map(w => if (w.isEmpty) w else w.head.toUpper +: w.tail).mkString(" "))
      Tables(s, d, "customer").select(
        col("c_custkey"),
        titleCase(lower(col("c_mktsegment"))).as("seg_title_udf"),
        initcap(lower(col("c_mktsegment"))).as("seg_title_builtin"))
        .orderBy("c_custkey")
    },

    Q("q_udaf_1_wavg",
      """SELECT l_returnflag, floor((sum(l_extendedprice * l_quantity) / sum(l_quantity)) * 1000000 + 0.5) / 1000000 AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val wavg = udaf(WeightedAvg)
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 6).as("wavg_price"))
        .orderBy("l_returnflag")
    },

    // Custom TypedImperativeAggregate HLL banded against exact — sketch
    // values differ across engines (ours vs DuckDB's HLL), so each
    // engine verdicts its own estimate inside the 5% band (p=12 →
    // ~1.6% standard error, so 5% ≈ 3σ) and the hash gate compares
    // exact counts + verdicts.
    Q("q_udaf_2_hll_custom",
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_cust,
        | CAST(abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
        |       <= count(DISTINCT o_custkey) * 0.05 AS BIGINT) AS approx_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      graft.expressions.HyperLogLogAgg.register(s)
      Tables(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("exact_cust"),
          (abs(expr("hll_distinct(o_custkey)") - countDistinct(col("o_custkey")))
            <= countDistinct(col("o_custkey")) * lit(0.05)).cast("long").as("approx_ok"))
        .orderBy("o_orderpriority")
    },

    // Arbitrary-language UDF surface (the one capability a Scala-only
    // engine otherwise lacks): JSON-lines through a stdlib-only python3
    // subprocess, ONE process per partition via
    // graft.api.ExternalProcess.pipeLines. to_json/from_json frame the
    // payloads (JSON escapes embedded newlines, so the line protocol is
    // safe for arbitrary text). No oracle: the result depends on an
    // external interpreter; the unit suite proves the python-side
    // values equal the Spark-native computation row for row, plus the
    // loud-failure contract (row-count mismatch, non-zero exit).
    Q.noOracle("q_udf_2_pipe") { (s, d) =>
      import org.apache.spark.sql.types.{LongType, StructType}
      val py = Seq("python3", "-c",
        """import sys, json, unicodedata
          |for line in sys.stdin:
          |    o = json.loads(line)
          |    t = unicodedata.normalize("NFC", o["text"])
          |    toks = t.split(" ")
          |    print(json.dumps({"nfc_len": len(t), "n_uniq": len(set(toks))},
          |                     sort_keys=True))
          |""".stripMargin)
      val in = Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          to_json(struct(coalesce(col("text"), lit("")).as("text"))).as("__in"))
      val sch = new StructType().add("nfc_len", LongType).add("n_uniq", LongType)
      graft.api.ExternalProcess.pipeLines(in, "__in", "__out", py)
        .select(col("lang"), from_json(col("__out"), sch).as("o"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("o.nfc_len").as("sum_nfc_len"),
          sum("o.n_uniq").as("sum_uniq_toks"))
        .orderBy("lang")
    },

    Q("q_udtf_1_generator",
      """SELECT doc_id, unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
        | unnest(string_split(text, ' ')) AS token
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      // Typed UDTF-equivalent: Dataset.flatMap generator. Cross-checked
      // against q_arr_2_explode (same oracle) — explode vs flatMap must
      // agree row-for-row.
      import s.implicits._
      Tables(s, d, "documents")
        .filter(col("doc_id") < 50)
        .select("doc_id", "text").as[Doc]
        .flatMap(dc => dc.text.split(" ", -1).iterator.zipWithIndex  // limit -1: keep trailing empties like Spark's split
          .map { case (t, i) => (dc.doc_id, i.toLong, t) })
        .toDF("doc_id", "pos", "token")
        .orderBy("doc_id", "pos")
    }
  )
}
