package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over a deterministic link graph (SURVEY.md
  * §2.12 extension — the "web-graph signals" side of a crawl-curation
  * pipeline: rank pages before sampling training documents from them).
  *
  * The graph is derived from `documents` itself: doc_ids are contiguous
  * 0..N-1 at every scale factor, so three quadratic maps `(id² + c) mod N`
  * give every node out-degree 3 with a skewed in-degree profile (quadratic
  * residues absorb ~2× the links; non-residues get none) — both engines
  * (and any future one) can rebuild the identical edge list, which is what
  * makes an *iterative* algorithm oracle-checkable end to end.
  *
  * Fixed-point arithmetic: ranks are BIGINTs scaled by 1e12. Every update
  * is integer multiply/divide (`div`), and integer sums are associative —
  * a 1000-executor partial/final aggregate and DuckDB's serial sum agree
  * bit-for-bit, which a double-typed PageRank cannot guarantee.
  *
  * Scale shape: each of the K iterations is one shuffle of contributions
  * keyed by `dst` plus one id-keyed join back to the node list — O(K·|E|)
  * total shuffle, no driver data movement beyond the scalar N. The node
  * list and the edge list are localCheckpoint'd BEFORE the loop: each is
  * materialized once and every iteration reads the cached blocks instead
  * of re-scanning parquet K times (a 1000-executor run would use reliable
  * checkpoint(dir) and additionally checkpoint `ranks` every few rounds
  * to truncate lineage — same shape).
  */
object GraphOps {

  /** Rank scale: 1e12 fixed-point. */
  private val Scale = 1000000000000L
  private val Iters = 5

  /** PageRank (damping 0.85, K=5 fixed iterations) over the derived
    * 3-regular graph; top-20 nodes. `rank_scaled` is the 1e12-scaled
    * fixed-point rank. */
  private val pagerankTopk = QueryDef(
    "pagerank_topk",
    (s, dir) => {
      // node list materialized once (localCheckpoint) — the per-iteration
      // left join reads cached blocks, not a parquet scan per round
      val docs = Tables.documents(s, dir).select(col("doc_id").cast("long").as("id"))
        .localCheckpoint()
      val n = docs.count() // one scalar to the driver (metadata-scale)
      val base = Scale / n
      // quadratic maps: affine maps with p coprime to N are bijections
      // (uniform in-degree → uniform PageRank, a degenerate fixture);
      // id²+c mod N hits quadratic residues ~twice and misses the rest,
      // giving a genuinely skewed in-degree distribution
      val edges = Seq(1L, 8L, 15L)
        .map { q =>
          docs.select(col("id").as("src"), ((col("id") * col("id") + q) % n).as("dst"))
        }
        .reduce(_.unionAll(_))
        .localCheckpoint() // materialized once, read by all K iterations
      // Size the LOOP's shuffles from the edge count and truncate the plan
      // per round (the same treatment as TextOps.connectedComponents): a
      // lazy K-round plan re-optimizes the whole accumulated join tree at
      // the final action and pays one AQE materialization job per exchange
      // per round — measured 0.76 s driver-side of a 1.24 s query with
      // ~0.03 s jobs. Per-round localCheckpoint pins planning cost
      // constant (what an at-scale PageRank does anyway to truncate
      // lineage), the shuffle width derives from 3·N edge rows, and the
      // tiny regime (edges fit one partition) also drops AQE — nothing to
      // adapt at width 1. The loop runs in an isolated CHILD session
      // (LoopSession scaladoc) so the caller's session conf is never
      // mutated; the rank fixpoint is exact integer arithmetic,
      // partitioning-independent.
      val loopS = LoopSession.forRows(s, 3L * n)
      val docsL = LoopSession.adopt(docs, loopS)
      val edgesL = LoopSession.adopt(edges, loopS)
      var ranks = docsL.select(col("id"), lit(base).as("rank"))
      for (_ <- 1 to Iters) {
        val incoming = edgesL.as("e")
          .join(ranks.as("r"), col("e.src") === col("r.id"))
          .selectExpr("e.dst AS dst", "r.rank div 3 AS c")
          .groupBy("dst")
          .agg(sum("c").as("s"))
        ranks = docsL.as("d")
          .join(incoming.as("a"), col("d.id") === col("a.dst"), "left")
          .selectExpr("d.id AS id", s"(${15L * base}L + 85L * coalesce(a.s, 0L)) div 100 AS rank")
          .localCheckpoint()
      }
      // ranks is localCheckpoint'd (materialized) — re-rooting back into
      // the caller's session is free and keeps the consumer single-session
      LoopSession.adopt(ranks, s)
        .orderBy(desc("rank"), asc("id"))
        .limit(20)
        .select(col("id").as("doc_id"), col("rank").as("rank_scaled"))
    },
    Some("""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(1000000000000 // count(*) AS BIGINT) AS base FROM documents),
            d AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
            e AS (SELECT id AS src, (id*id+1) % nn.n AS dst FROM d, nn
                  UNION ALL SELECT id, (id*id+8) % nn.n FROM d, nn
                  UNION ALL SELECT id, (id*id+15) % nn.n FROM d, nn),
            r0 AS (SELECT id, base AS rank FROM d, nn),
            a1 AS (SELECT e.dst AS id, CAST(sum(r.rank // 3) AS BIGINT) AS s FROM e JOIN r0 r ON e.src = r.id GROUP BY 1),
            r1 AS (SELECT d.id, CAST((15*nn.base + 85*coalesce(a.s, 0)) // 100 AS BIGINT) AS rank
                   FROM d CROSS JOIN nn LEFT JOIN a1 a ON d.id = a.id),
            a2 AS (SELECT e.dst AS id, CAST(sum(r.rank // 3) AS BIGINT) AS s FROM e JOIN r1 r ON e.src = r.id GROUP BY 1),
            r2 AS (SELECT d.id, CAST((15*nn.base + 85*coalesce(a.s, 0)) // 100 AS BIGINT) AS rank
                   FROM d CROSS JOIN nn LEFT JOIN a2 a ON d.id = a.id),
            a3 AS (SELECT e.dst AS id, CAST(sum(r.rank // 3) AS BIGINT) AS s FROM e JOIN r2 r ON e.src = r.id GROUP BY 1),
            r3 AS (SELECT d.id, CAST((15*nn.base + 85*coalesce(a.s, 0)) // 100 AS BIGINT) AS rank
                   FROM d CROSS JOIN nn LEFT JOIN a3 a ON d.id = a.id),
            a4 AS (SELECT e.dst AS id, CAST(sum(r.rank // 3) AS BIGINT) AS s FROM e JOIN r3 r ON e.src = r.id GROUP BY 1),
            r4 AS (SELECT d.id, CAST((15*nn.base + 85*coalesce(a.s, 0)) // 100 AS BIGINT) AS rank
                   FROM d CROSS JOIN nn LEFT JOIN a4 a ON d.id = a.id),
            a5 AS (SELECT e.dst AS id, CAST(sum(r.rank // 3) AS BIGINT) AS s FROM e JOIN r4 r ON e.src = r.id GROUP BY 1),
            r5 AS (SELECT d.id, CAST((15*nn.base + 85*coalesce(a.s, 0)) // 100 AS BIGINT) AS rank
                   FROM d CROSS JOIN nn LEFT JOIN a5 a ON d.id = a.id)
            SELECT id AS doc_id, rank AS rank_scaled FROM r5
            ORDER BY rank_scaled DESC, doc_id LIMIT 20"""),
  )

  /** The degree-ordered triangle/wedge core over an arbitrary directed
    * edge list (any (src, dst) frame; self-loops and duplicates are
    * normalized away): the "forward" algorithm (Schank & Wagner 2005) —
    * every edge points from its lower-(degree, id) endpoint to the higher
    * one, wedges are pairs of out-neighbors of a common source, and a
    * wedge closes iff its two tips are themselves an oriented edge.
    * Orientation caps out-degree at O(√E), so the wedge join is O(E^1.5)
    * worst-case instead of Σdeg² — the standard scalable formulation
    * (equi-join + aggregate all the way: edges shuffle on node ids, wedges
    * on tip pairs, nothing touches the driver).
    *
    * Everything is integer (counts, degree tuples, `div`-scaled closure
    * ratio), so DuckDB recomputes the identical single stats row —
    * struct/row-value comparison gives the same lexicographic (deg, id)
    * order in both engines. Public so ClusteringSpec can differentially
    * test it against a naive all-triples count on random graphs — stars,
    * isolated nodes, multi-edges — that the fixture graph never
    * produces. */
  def triangleStats(re: DataFrame): DataFrame = {
    // ue / dg / oe are each read 2-3 times downstream (the wedge join
    // aliases oe THREE ways; the stats row re-reads ue and dg). Left lazy,
    // the whole normalize+degree+orient subtree is INLINED per reference —
    // a 3×-duplicated tree the optimizer re-derives per alias (measured:
    // 0.86 s of driver planning before the first real job at sf0.1) and
    // that can execute per alias wherever exchange reuse doesn't apply.
    // localCheckpoint materializes each ONCE and truncates the plan; these
    // are exactly the intermediates any at-scale triangle count
    // materializes (the oriented edge list IS the algorithm's working set,
    // O(E) like its input).
    val ue = re.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint()
    val dg = ue.select(col("a").as("id")).unionAll(ue.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val oe = ue
      .join(dg.as("da"), col("a") === col("da.id"))
      .join(dg.as("db"), col("b") === col("db.id"))
      .select(
        when(struct(col("da.deg"), col("a")) < struct(col("db.deg"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("da.deg"), col("a")) < struct(col("db.deg"), col("b")),
          col("b")).otherwise(col("a")).as("v"),
        when(struct(col("da.deg"), col("a")) < struct(col("db.deg"), col("b")),
          col("db.deg")).otherwise(col("da.deg")).as("dv"))
      .localCheckpoint()
    val tri = oe.as("e1")
      .join(oe.as("e2"), col("e1.u") === col("e2.u") &&
        struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
      .join(oe.as("e3"), col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = ue.agg(count(lit(1)).as("n_edges"))
      .crossJoin(dg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges")))
    stats.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        // wedge-free graphs (disjoint edges) have nothing to close: 0, not
        // a div-0 abort under ANSI — and the oracle must agree (CASE, not
        // nullif, so both engines say 0)
        when(col("n_wedges") > 0,
          expr("3 * n_triangles * 1000000 div n_wedges")).otherwise(lit(0L))
          .as("closure_scaled"))
  }

  /** X48 triangle counting + global clustering coefficient over the same
    * derived link graph as PageRank (undirected simple view of the three
    * quadratic maps), via [[triangleStats]]. */
  private val triangleCount = QueryDef(
    "triangle_count",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id").cast("long").as("id"))
      val n = docs.count() // one scalar (metadata-scale)
      val re = Seq(1L, 8L, 15L)
        .map { q =>
          docs.select(col("id").as("src"), ((col("id") * col("id") + q) % n).as("dst"))
        }
        .reduce(_.unionAll(_))
      triangleStats(re)
    },
    Some("""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            d0 AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
            re AS (SELECT id AS src, (id*id+1) % nn.n AS dst FROM d0, nn
                   UNION ALL SELECT id, (id*id+8) % nn.n FROM d0, nn
                   UNION ALL SELECT id, (id*id+15) % nn.n FROM d0, nn),
            ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                   FROM re WHERE src <> dst),
            dg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg
                   FROM (SELECT a AS id FROM ue UNION ALL SELECT b FROM ue) GROUP BY id),
            oe AS (SELECT CASE WHEN (da.deg, ue.a) < (db.deg, ue.b) THEN ue.a ELSE ue.b END AS u,
                          CASE WHEN (da.deg, ue.a) < (db.deg, ue.b) THEN ue.b ELSE ue.a END AS v,
                          CASE WHEN (da.deg, ue.a) < (db.deg, ue.b) THEN db.deg ELSE da.deg END AS dv
                   FROM ue JOIN dg da ON da.id = ue.a JOIN dg db ON db.id = ue.b),
            tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
                    FROM oe e1 JOIN oe e2 ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
                         JOIN oe e3 ON e3.u = e1.v AND e3.v = e2.v),
            st AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM ue),
            nd AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                          CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM dg)
            SELECT n_nodes, n_edges, n_wedges, n_triangles,
                   CAST(CASE WHEN n_wedges > 0
                        THEN 3 * n_triangles * 1000000 // n_wedges
                        ELSE 0 END AS BIGINT) AS closure_scaled
            FROM st, nd, tri"""),
  )

  val defs: Seq[QueryDef] = Seq(pagerankTopk, triangleCount)
}
