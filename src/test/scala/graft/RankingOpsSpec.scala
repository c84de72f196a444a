package graft

import org.apache.spark.sql.functions._

/** Value-level checks for the retrieval/scoring operators (X41–X44) against
  * independent driver-side recomputation on the sf0.001 fixture — the same
  * math, written imperatively, so a formula typo in the distributed version
  * can't hide behind its own oracle string.
  */
class RankingOpsSpec extends SparkSpec {

  private def toks(text: String): Seq[String] = text.split(" ").filter(_.nonEmpty).toSeq

  private lazy val corpus: Seq[(Long, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("inverted_index: exact df, postings capped at 16 and sorted") {
    val rows = Registry.queries("inverted_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    val df = corpus.flatMap { case (id, t) => toks(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (term, xs) => term -> xs.map(_._2).sorted }
    rows.foreach { r =>
      val (term, dfCnt, postings) = (r.getString(0), r.getLong(1), r.getString(2))
      val want = df(term)
      assert(dfCnt == want.size, s"$term df")
      val posted = postings.split(",").map(_.toLong).toSeq
      assert(posted == want.take(16), s"$term postings")
    }
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
  }

  test("bm25_topk matches a driver-side recomputation exactly") {
    val q = Seq("spark", "join", "vector")
    val dl = corpus.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val n = corpus.size.toLong
    val t = dl.values.sum
    val tf = corpus.flatMap { case (id, txt) =>
      toks(txt).filter(q.contains).groupBy(identity).map { case (w, xs) => (id, w, xs.size.toLong) }
    }
    val dfq = tf.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val scores = tf.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map { case (_, w, f) =>
        val df = dfq(w)
        ((2 * n - 2 * df + 1) * 88 * f * t * 10000L) / ((2 * df + 1) * (40 * f * t + 12 * t + 36 * dl(id) * n))
      }.sum
    }
    val want = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(15)
    val got = Registry.queries("bm25_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("quality_classifier: keep flag consistent with score, score recomputed") {
    val got = Registry.queries("quality_classifier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.nonEmpty)
    val byId = corpus.toMap
    got.foreach { case (id, stopRate, score, keep) =>
      val ws = toks(byId(id))
      val nw = ws.size.toLong
      val stop = ws.count(w => w == "a" || w == "the").toLong
      val letters = byId(id).count(_ != ' ').toLong
      assert(stopRate == stop * 1000 / nw)
      assert(score == 500 + 2 * (stop * 1000 / nw) - math.abs(letters * 1000 / nw - 4000) / 4)
      assert(keep == (score >= 400))
    }
    // the threshold actually separates: both classes present on the fixture
    assert(got.exists(_._4) && got.exists(!_._4), "degenerate classifier split")
  }

  test("quality_classifier survives empty and all-space documents (no ANSI div-0)") {
    import spark.implicits._
    // empty docs are routine input to a first-pass corpus filter: nw = 0
    // must degrade to score -500 / rejected, not an ANSI divide-by-zero
    val dir = java.nio.file.Files.createTempDirectory("qc_empty").toString
    Seq((1L, ""), (2L, "   "), (3L, "the a the b"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.queries("quality_classifier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got.take(2) == Seq((1L, 0L, -500L, false), (2L, 0L, -500L, false)))
    // nonempty doc unaffected by the guard: stop 3/4, letters 8/4 words
    assert(got(2) == (3L, 750L, 1500L, true))
  }

  test("bm25 scaled division is exact where the naive x10000 product would overflow") {
    // p*10000 here is ~9e21 (overflows int64 ~488x over); the base-100
    // long-division form must still produce the exact scaled quotient
    val p = 900000000000000000L
    val d = 7777777777777L
    val got = spark.sql(
      s"SELECT ($p div $d) * 10000 + ((($p % $d) * 100) div $d) * 100 + (((($p % $d) * 100) % $d) * 100) div $d AS s")
      .head.getLong(0)
    val want = ((BigInt(p) * 10000) / BigInt(d)).toLong
    assert(got == want)
  }

  test("quality_weighted_sample keep decisions match an exact driver recount") {
    def md5hex8(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    val src = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = src.map { case (id, source, text) =>
      val ws = toks(text)
      val nw = ws.size.toLong
      val srs = if (nw > 0) ws.count(w => w == "a" || w == "the") * 1000 / nw else 0L
      val wls = if (nw > 0) text.count(_ != ' ') * 1000 / nw else 0L
      val p = math.max(0L, math.min(1000L, 500 + 2 * srs - math.abs(wls - 4000) / 4))
      val keep = if (md5hex8(id.toString) < f"${p * 4294967L}%08x") 1L else 0L
      (source, p, keep)
    }.groupBy(_._1).map { case (s, xs) =>
      (s, xs.size.toLong, xs.map(_._3).sum, xs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val got = Registry.queries("quality_weighted_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // the sampler actually samples: strictly between none and all
    assert(got.map(_._3).sum > 0 && got.map(_._3).sum < got.map(_._2).sum)
  }

  test("ewma_smooth matches per-series driver recomputation") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100d).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val want = daily.groupBy(_._1).toSeq.flatMap { case (et, xs) =>
      val s = xs.sortBy(_._2)
      s.indices.drop(4).map { i =>
        val c = (0 to 4).map(k => s(i - k)._3)
        (et, s(i)._2, s(i)._3, (16 * c(0) + 8 * c(1) + 4 * c(2) + 2 * c(3) + c(4)) / 31)
      }
    }.sortBy(x => (x._1, x._2))
    val got = Registry.queries("ewma_smooth")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }
}
