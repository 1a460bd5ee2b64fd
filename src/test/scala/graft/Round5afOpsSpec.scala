package graft

import graft.expressions.JaroWinkler
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Round-5af operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5afOpsSpec extends SparkSpec {

  test("q_dedup_25_lev_vs_jaro: disagreement ranking replicates") {
    val names = graft.sources.Tables(spark, sf, "part")
      .select("p_name").distinct().collect().map(_.getString(0)).sorted
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val expected = (for {
      i <- names.indices; j <- i + 1 until names.length
      a = names(i); b = names(j)
      lev6 = math.floor((1.0 - lev(a, b).toDouble / math.max(a.length, b.length)) * 1e6 + 0.5).toLong
      jw6 = math.floor(JaroWinkler.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b)) * 1e6 + 0.5).toLong
    } yield (a, b, lev6, jw6))
      .sortBy(t => (-math.abs(t._4 - t._3), t._1, t._2)).take(15)
      .map(t => (t._1, t._2, t._3 / 1e6, t._4 / 1e6,
        math.floor((t._4 - t._3) / 1e6 * 1e6 + 0.5) / 1e6))
    val got = Registry.byName("q_dedup_25_lev_vs_jaro").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == expected)
  }

  test("q_win_26_ignore_nulls: carry-forward counts replicate") {
    val events = graft.sources.Tables(spark, sf, "events")
      .filter(col("user_id") < 20)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val expected = events.groupBy(_._1).view.mapValues { es =>
      val ordered = es.sortBy(e => (e._3, e._2))
      var lastV: Option[Long] = None
      val carried = ordered.map { e =>
        if (e._4 != "error") lastV = Some(math.floor(e._5 * 100 + 0.5).toLong)
        lastV
      }
      (ordered.length.toLong, carried.count(_.isDefined).toLong,
        carried.flatten.sum)
    }.toMap
    val got = Registry.byName("q_win_26_ignore_nulls").fn(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) 0L else r.getLong(3)))).toMap
    expected.foreach { case (u, (n, nc, s)) =>
      val (gn, gnc, gs) = got(u)
      assert(gn == n && gnc == nc, s"user $u counts")
      if (nc > 0) assert(gs == s, s"user $u sum")
    }
  }

  test("q_sim_32_pca_project: per-label means are bounded by the corpus projection range") {
    val rows = Registry.byName("q_sim_32_pca_project").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet.size == rows.length)
    val total = graft.sources.Tables(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum == total)
    // random-embedding sanity: label means along PC1 are small relative
    // to the component scale (they straddle zero rather than separate)
    assert(rows.exists(_._3 < 0) || rows.exists(_._3 > 0))
    rows.foreach(r => assert(math.abs(r._3) < 10.0))
  }
}
