package graft.operators

import graft.{QueryDef, Tables}
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
  * total shuffle, no driver data movement beyond the scalar N. At 100 TB
  * you would persist `edges` (it is re-derived per iteration here, a
  * narrow 1-column scan), checkpoint `ranks` every few rounds to truncate
  * lineage, and keep K fixed — the shape does not change.
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
      val docs = Tables.documents(s, dir).select(col("doc_id").cast("long").as("id"))
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
      var ranks = docs.select(col("id"), lit(base).as("rank"))
      for (_ <- 1 to Iters) {
        val incoming = edges.as("e")
          .join(ranks.as("r"), col("e.src") === col("r.id"))
          .selectExpr("e.dst AS dst", "r.rank div 3 AS c")
          .groupBy("dst")
          .agg(sum("c").as("s"))
        ranks = docs.as("d")
          .join(incoming.as("a"), col("d.id") === col("a.dst"), "left")
          .selectExpr("d.id AS id", s"(${15L * base}L + 85L * coalesce(a.s, 0L)) div 100 AS rank")
      }
      ranks
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

  val defs: Seq[QueryDef] = Seq(pagerankTopk)
}
