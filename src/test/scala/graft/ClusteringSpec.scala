package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** Round-7 additions: exact k-means (`embed_kmeans`), the bottom-k-by-hash
  * quantile sketch (`quantile_sketch`), and degree-ordered triangle
  * counting (`triangle_count`).
  *
  * The k-means claims under test: (a) the fixed-point Lloyd iteration is
  * PARTITION-INVARIANT (bit-identical output at 1 and 7 partitions — a
  * double-typed implementation fails this); (b) on planted gaussian
  * clusters it recovers the structure (each planted center matched by a
  * distinct recovered centroid). The quantile claim: nearest-rank
  * estimates off a 256-sample land within a few rank percent of the true
  * CDF position. The triangle claim: the oriented-wedge count equals a
  * naive all-triples count.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("embed_kmeans output is bit-identical across partition counts") {
    val e = Tables.embeddings(spark, sf)
    val a = VectorOps.kmeans(e.repartition(1), k = 8, iters = 3)
      .collect().map(_.toSeq).toSeq
    val b = VectorOps.kmeans(e.repartition(7), k = 8, iters = 3)
      .collect().map(_.toSeq).toSeq
    assert(a == b, "Lloyd iteration diverged across partition counts")
  }

  test("embed_kmeans covers the corpus and every dim of every cluster") {
    val rows = Registry.queries("embed_kmeans")(spark, sf).collect()
    assert(rows.length == 8 * 64)
    val n = Tables.embeddings(spark, sf).count()
    val sizes = rows.map(r => (r.getLong(0), r.getLong(3))).distinct
    assert(sizes.map(_._2).sum == n, "cluster sizes must partition the corpus")
  }

  /** 5 well-separated gaussian clusters; k-means OVERPROVISIONED to K=8
    * (standard practice — k-means with K = true cluster count is
    * init-sensitive: two sampled seeds in one cluster leave another pair
    * merged at a ~0.71-cosine midpoint) must cover every planted center
    * with at least one centroid at cosine > 0.9. */
  test("kmeans recovers planted clusters") {
    val rnd = new scala.util.Random(11)
    val dim = 32
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centers = Array.fill(5)(normalize(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val rows = for (c <- 0 until 5; i <- 0 until 100) yield
      (c * 1000L + i,
        normalize(centers(c).map(x => x + 0.05f * rnd.nextGaussian().toFloat)))
    val e = rows.toDF("vec_id", "embedding")
    val cents = VectorOps.kmeans(e, k = 8, iters = 5)
      .collect()
      .filter(_.getLong(3) > 0) // only centroids that own points
      .groupBy(_.getLong(0))
      .map { case (c, rs) =>
        c -> rs.sortBy(_.getLong(1)).map(_.getLong(2).toDouble / 10000d)
      }
    def cos(a: Array[Double], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    centers.foreach { ctr =>
      val best = cents.values.map(cos(_, ctr)).max
      assert(best > 0.9, s"no recovered centroid covers a planted center ($best)")
    }
  }

  test("quantile_sketch estimates sit near the true CDF position") {
    val est = Registry.queries("quantile_sketch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(est.keySet == Set(50L, 90L, 99L))
    val cents = Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 100d).cast("long").as("c"))
      .as[Long].collect().sorted
    val n = cents.length.toDouble
    est.foreach { case (pct, v) =>
      val cdf = cents.count(_ <= v) / n
      assert(math.abs(cdf - pct / 100d) < 0.08,
        s"p$pct estimate $v lands at CDF $cdf")
    }
  }

  test("quantile_sketch tie handling: exact vs an independent (h, cents) total-order recompute") {
    // (l_orderkey, l_linenumber) is NOT unique in this testdata, so the
    // bottom-k hash sample has md5 ties; at sf0.001 a tie group with
    // DIFFERENT prices straddles the k=256 boundary (this is the exact
    // configuration that produced an engine-arbitrary sample before the
    // (h, cents) tiebreak). Pin: the query equals a from-scratch SQL
    // recompute using the total order, and the tie actually exists.
    val li = Tables.lineitem(spark, sf).select(
      round(col("l_extendedprice") * 100d).cast("long").as("cents"),
      md5(concat_ws(":", col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"))).as("h"))
    val dupHs = li.groupBy("h").agg(countDistinct("cents").as("nc"))
      .filter(col("nc") > 1).count()
    assert(dupHs > 0, "fixture lost its duplicate-key md5 ties; test is vacuous")
    li.createOrReplaceTempView("qs_li")
    val expected = spark.sql(
      """WITH smp AS (SELECT cents, h FROM qs_li ORDER BY h, cents LIMIT 256),
         rk AS (SELECT cents, row_number() OVER (ORDER BY cents, h) AS rk FROM smp),
         p AS (SELECT explode(array(50L, 90L, 99L)) AS pct)
         SELECT p.pct, r.cents AS est_cents
         FROM p JOIN rk r ON r.rk = (p.pct * 255) div 100 + 1
         ORDER BY pct""").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Registry.queries("quantile_sketch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, s"sample tie handling drifted: $got vs $expected")
  }

  test("triangle_count equals the naive all-triples count") {
    val row = Registry.queries("triangle_count")(spark, sf).collect().head
    val tri = row.getAs[Long]("n_triangles")
    // naive: undirected simple edges, all a<b<c triples
    val docs = Tables.documents(spark, sf).select(col("doc_id").cast("long").as("id"))
    val n = docs.count()
    val ue = Seq(1L, 8L, 15L)
      .map(q => docs.select(col("id").as("src"), ((col("id") * col("id") + q) % n).as("dst")))
      .reduce(_.unionAll(_))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val naive = ue.as("e1")
      .join(ue.as("e2"), col("e2.a") === col("e1.a") && col("e2.b") > col("e1.b"))
      .join(ue.as("e3"), col("e3.a") === col("e1.b") && col("e3.b") === col("e2.b"))
      .count()
    assert(tri == naive, s"oriented count $tri != naive $naive")
    assert(row.getAs[Long]("n_wedges") > 0 && row.getAs[Long]("closure_scaled") >= 0)
  }

  /** The distributed fixed-point PageRank must equal a sequential
    * in-memory evaluation of the same integer recurrence — the claim
    * behind the oracle ("any partition count, any engine, bit-identical
    * ranks") checked against a third, plain-Scala implementation. */
  test("pagerank_topk equals a sequential fixed-point evaluation") {
    val n = Tables.documents(spark, sf).count().toInt
    val base = 1000000000000L / n
    val out = Array.tabulate(n)(i =>
      Seq(1L, 8L, 15L).map(q => ((i.toLong * i + q) % n).toInt))
    var ranks = Array.fill(n)(base)
    for (_ <- 1 to 5) {
      val incoming = Array.fill(n)(0L)
      for (src <- 0 until n; dst <- out(src))
        incoming(dst) += Math.floorDiv(ranks(src), 3L)
      ranks = Array.tabulate(n)(i =>
        Math.floorDiv(15L * base + 85L * incoming(i), 100L))
    }
    val expected = ranks.zipWithIndex
      .map { case (r, i) => (i.toLong, r) }
      .sortBy { case (id, r) => (-r, id) }.take(20).toSeq
    val got = Registry.queries("pagerank_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, s"distributed $got != sequential $expected")
  }

  /** Random graphs exercise shapes the fixture never produces — stars,
    * isolated nodes, duplicate and self edges — against a naive count. */
  test("triangleStats equals naive counting on random graphs") {
    val rnd = new scala.util.Random(23)
    (1 to 8).foreach { trial =>
      val n = 5 + rnd.nextInt(25)
      val m = rnd.nextInt(4 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val df = edges.toDF("src", "dst")
      val got = graft.operators.GraphOps.triangleStats(df)
        .collect().head.getAs[Long]("n_triangles")
      val simple = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val nodes = simple.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      var naive = 0L
      for {
        i <- nodes.indices; j <- i + 1 until nodes.length; k <- j + 1 until nodes.length
        if simple((nodes(i), nodes(j))) && simple((nodes(j), nodes(k))) &&
          simple((nodes(i), nodes(k)))
      } naive += 1
      assert(got == naive, s"trial $trial (n=$n m=$m): oriented $got != naive $naive")
    }
  }

  test("triangleStats on a wedge-free graph returns closure 0 instead of ANSI div-0") {
    // disjoint edges: nonempty graph, zero wedges — the unguarded
    // `div n_wedges` would abort the whole job under Spark 4's ANSI mode
    val df = Seq((0L, 1L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val row = graft.operators.GraphOps.triangleStats(df).collect().head
    assert(row.getAs[Long]("n_wedges") == 0L)
    assert(row.getAs[Long]("n_triangles") == 0L)
    assert(row.getAs[Long]("closure_scaled") == 0L)
  }
}
