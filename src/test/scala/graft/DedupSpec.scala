package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** MinHash/LSH near-dup detection on planted duplicates — covers the
  * non-oracled fuzzy-dedup path (SURVEY.md §2.12 X2).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("minhash finds planted near-duplicates and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow") // 1-word edit → high jaccard
    val far  = "completely different words about spark shuffle partitions and codegen stages"
    val docs = Seq(
      (0L, base), (1L, near), (2L, far),
      (3L, "another unrelated document mentioning parquet row groups and column chunks"),
    ).toDF("doc_id", "text")

    val pairs = TextOps.minhashPairs(docs, bands = 6, rowsPerBand = 4, threshold = 0.5)
      .collect()
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((0L, 1L)), s"expected (0,1) in $ids")
    assert(!ids.exists { case (a, b) => a == 2L || b == 2L }, s"false positive: $ids")
  }

  test("minhash jaccard estimate is exact-shingle jaccard") {
    val docs = Seq((0L, "a b c d e f g h"), (1L, "a b c d e f g x")).toDF("doc_id", "text")
    val got = TextOps.minhashPairs(docs, 6, 4, 0.1).collect()
    // 6 shingles each, 5 shared → 5/7
    if (got.nonEmpty) assert(math.abs(got.head.getDouble(2) - 5.0 / 7.0) < 1e-3)
  }

  test("connected components resolve transitive duplicate clusters") {
    // chain 1-2-3-4 (diameter 3: propagation needs multiple rounds),
    // pair 10-11, singleton edge endpoints only — no isolated nodes
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("id1", "id2")
    val got = TextOps.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L), s"got $got")
  }

  test("connected components converge on a 200-node path graph in log rounds") {
    // diameter 199: plain min-label propagation needs ~199 rounds and would
    // trip the 25-round cap; pointer jumping closes it in ~9
    val edges = (1L until 200L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = TextOps.connectedComponents(edges).collect()
    assert(got.length == 200, s"expected 200 labeled nodes, got ${got.length}")
    assert(got.forall(_.getLong(1) == 1L),
      s"all labels must be the component min 1, got ${got.map(_.getLong(1)).distinct.mkString(",")}")
  }

  /** Random-graph differential vs a sequential union-find: catches label
    * propagation bugs on shapes the planted fixtures never produce
    * (dense blobs, many small components, repeated edges). */
  test("connected components equal union-find on random graphs") {
    val rnd = new scala.util.Random(17)
    (1 to 5).foreach { trial =>
      val n = 10 + rnd.nextInt(60)
      val m = rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) => parent(find(a)) = find(b) }
        // canonical label = min member id per root
        val label = parent.keys.toSeq.groupBy(find).flatMap { case (_, ms) =>
          val lo = ms.min; ms.map(_ -> lo)
        }
        val got = TextOps.connectedComponents(edges.toDF("id1", "id2"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == label, s"trial $trial (n=$n m=$m) mismatch")
      }
    }
  }

  test("connected components on an empty edge list is empty") {
    val edges = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(TextOps.connectedComponents(edges).count() == 0)
  }

  test("dedup_components and dedup_resolve share one memoized closure") {
    // the resolve step must consume the closure, never re-derive it: the
    // memo hands back the SAME materialized label table for a given
    // (session, dir), so the pair costs one iterative closure + one agg
    val a = TextOps.dupComponents(spark, sf)
    val b = TextOps.dupComponents(spark, sf)
    assert(a eq b, "dupComponents re-derived the closure for the same (session, dir)")
    // and the two public queries built on it still agree with each other:
    // resolve's cluster sizes must sum to the component listing's rows
    val nDocs = Registry.queries("dedup_components")(spark, sf).count()
    val sumMembers = Registry.queries("dedup_resolve")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_members")).head.getLong(0)
    assert(sumMembers == nDocs)
  }
}
