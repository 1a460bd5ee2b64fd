package graft

/** Round-5j operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5i suites).
  */
class Round5jOpsSpec extends SparkSpec {

  private def q4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private val P = 1000000007L
  private def charHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("q_stream_23_lifecycle: growth identity new+retained+resurrected = DAU; churn vs yesterday") {
    val uw = events.filter(_._4 == "purchase").map(e => (e._3, e._2 / 86400000000L)).distinct
    val byDay = uw.groupBy(_._2).map { case (d0, rows) => d0 -> rows.map(_._1).toSet }
    val firstDay = uw.groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).min }
    val got = Registry.byName("q_stream_23_lifecycle").fn(spark, sf).collect()
    assert(got.length == byDay.size)
    got.foreach { r =>
      val day = r.getLong(0)
      val active = byDay(day)
      val prevActive = byDay.getOrElse(day - 1, Set.empty[Long])
      val nNew = active.count(u => firstDay(u) == day).toLong
      val nRet = active.count(u => firstDay(u) != day && prevActive(u)).toLong
      val nRes = active.count(u => firstDay(u) != day && !prevActive(u)).toLong
      val nChurn = prevActive.count(u => !active(u)).toLong
      assert(r.getLong(1) == nNew && r.getLong(2) == nRet && r.getLong(3) == nRes,
        s"day $day")
      assert(r.getLong(4) == nChurn)
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == active.size.toLong)
    }
  }

  test("q_dedup_16_minhash_width: wider signatures do not increase MAE on this fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id < 40").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Array[String] =
      t.split(" ", -1).sliding(2).filter(_.length == 2).map(_.mkString(" ")).toArray.distinct
    def sig(sh: Array[String]): Seq[Long] = {
      val hs = sh.map(charHash)
      (0L until 16L).map(i => hs.map(h => (h * (i * 2 + 3) + (i * 5 + 7)) % P).min)
    }
    val s = docs.map { case (id, t) => (id, shingles(t).toSet, sig(shingles(t))) }
    val expected = Seq(4, 8, 16).map { k =>
      val errs = for {
        (ia, sa, ga) <- s; (ib, sb, gb) <- s if ia < ib
      } yield {
        val inter = (sa & sb).size.toLong
        val uni = sa.size + sb.size - inter
        val m = (0 until k).count(i => ga(i) == gb(i)).toLong
        math.abs(math.floor(m.toDouble / k * 1e6 + 0.5).toLong
          - math.floor(inter.toDouble / uni * 1e6 + 0.5).toLong)
      }
      (k.toLong, errs.length.toLong, math.floor(errs.sum.toDouble / errs.length + 0.5) / 1e6)
    }
    val got = Registry.byName("q_dedup_16_minhash_width").fn(spark, sf).collect()
    assert(got.length == 3)
    got.zip(expected).foreach { case (r, (k, n, mae)) =>
      assert(r.getLong(0) == k && r.getLong(1) == n)
      assert(r.getDouble(2) == mae, s"k $k: ${r.getDouble(2)} != $mae")
    }
    assert(got.head.getDouble(2) >= got.last.getDouble(2)) // width reduces error
  }

  test("q_text_41_template_ngrams: trigram doc-frequency top-10 replicates") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val nd = docs.length.toLong
    val df = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { t =>
      val grams: Set[String] =
        t.split(" ", -1).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      grams.foreach(g => df(g) += 1)
    }
    val top = df.toSeq.sortBy(r => (-r._2, r._1)).take(10)
    val got = Registry.byName("q_text_41_template_ngrams").fn(spark, sf).collect()
    assert(got.length == 10)
    got.zip(top).zipWithIndex.foreach { case ((r, (g, d0)), i) =>
      assert(r.getLong(0) == i + 1 && r.getString(1) == g && r.getLong(2) == d0)
      assert(r.getDouble(3) == q6(d0.toDouble / nd))
    }
  }

  test("q_text_42_dedup_impact: survivor token sums nest; removal share consistent") {
    val got = Registry.byName("q_text_42_dedup_impact").fn(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (docsIn, toksIn) = (r.getLong(1), r.getLong(2))
      val (docsExact, docsNear, toksNear) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(docsExact <= docsIn && docsNear <= docsExact)
      assert(toksNear <= toksIn)
      assert(r.getDouble(6) == q6((toksIn - toksNear).toDouble / toksIn))
    }
    // corpus-level doc counts agree with the funnel's dedup stages applied corpus-wide
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val exact = docs.groupBy(_._2.toLowerCase.trim).map(_._2.map(_._1).min).toSet
    val near = docs.filter(d => exact(d._1))
      .groupBy(d => d._2.split(" ", -1).distinct.sorted.mkString(" "))
      .map(_._2.map(_._1).min)
    assert(got.map(_.getLong(3)).sum == exact.size.toLong)
    assert(got.map(_.getLong(4)).sum == near.size.toLong)
  }

  test("q_stream_24_error_budget: integer over-budget flag matches the rate; burn cumulative") {
    val byDay = events.groupBy(_._2 / 86400000000L).toSeq.sortBy(_._1)
      .map { case (d0, rows) => (d0, rows.length.toLong, rows.count(_._4 == "error").toLong) }
    var ce = 0L; var cn = 0L
    val expected = byDay.map { case (d0, n, e) =>
      ce += e; cn += n
      d0 -> (n, e, q6(e.toDouble / n), if (e * 5 > n) 1L else 0L, q6(ce.toDouble / cn / 0.2))
    }.toMap
    val got = Registry.byName("q_stream_24_error_budget").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, e, rate, flag, burn) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == e)
      assert(r.getDouble(3) == rate && r.getLong(4) == flag && r.getDouble(5) == burn)
      assert((r.getLong(4) == 1L) == (r.getDouble(3) > 0.2))
    }
  }

  test("q_time_11_hour_of_week: 168-grid counts; shares sum to 1") {
    val purchases = events.filter(_._4 == "purchase")
    val byHow = purchases.groupBy { e =>
      ((e._2 / 86400000000L + 4) % 7) * 24 + (e._2 / 3600000000L) % 24
    }.map { case (h, rows) => h -> rows.length.toLong }
    val tot = purchases.length.toLong
    val nb = byHow.size.toLong
    val got = Registry.byName("q_time_11_hour_of_week").fn(spark, sf).collect()
    assert(got.length == nb && nb <= 168)
    var shareSum = 0.0
    got.foreach { r =>
      val n = byHow(r.getLong(0))
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == q6(n.toDouble / tot))
      assert(r.getDouble(3) == q4(n.toDouble / (tot.toDouble / nb)))
      shareSum += r.getDouble(2)
    }
    assert(math.abs(shareSum - 1.0) < 1e-3)
  }

  test("q_sim_23_label_separation: quantized pair cosines; pair counts partition all pairs") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter("vec_id < 200").select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + (p._1 * p._2).toDouble)
    def norm(a: Array[Float]): Double =
      math.sqrt(a.foldLeft(0.0)((acc, x) => acc + (x * x).toDouble))
    var (ni, si, nx, sx) = (0L, 0L, 0L, 0L)
    for (a <- vecs; b <- vecs if a._1 < b._1) {
      val cq = math.floor(dot(a._3, b._3) / (norm(a._3) * norm(b._3)) * 1e6 + 0.5).toLong
      if (a._2 == b._2) { ni += 1; si += cq } else { nx += 1; sx += cq }
    }
    val row = Registry.byName("q_sim_23_label_separation").fn(spark, sf).collect().head
    assert(row.getLong(0) == ni && row.getLong(1) == nx)
    assert(ni + nx == vecs.length.toLong * (vecs.length - 1) / 2)
    assert(row.getDouble(2) == math.floor(si.toDouble / ni + 0.5) / 1e6)
    assert(row.getDouble(3) == math.floor(sx.toDouble / nx + 0.5) / 1e6)
    assert(row.getDouble(4) == math.floor(si.toDouble / ni - sx.toDouble / nx + 0.5) / 1e6)
  }
}
