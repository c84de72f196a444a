package graft.operators

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Star-schema joins (SURVEY.md §2.3). The reference has no standalone join
  * query (its only join is inside MERGE, README.md:963–967) — these are the
  * labeled J2 extensions over the driver's TPC-H-ish testdata.
  *
  * Scale design: fact tables (`lineitem`, `orders`) are the big sides and
  * are NEVER broadcast; dimensions (`customer`, `nation`, `region`) are
  * broadcast explicitly so the fact table is joined without any shuffle.
  * At 100 TB, each plan is one scan of the fact + map-side hash joins +
  * one shuffle for the final aggregate — the minimum possible.
  */
object Joins {

  /** Five-way star join: revenue per region × nation.
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region. `orders` is fact-sized
    * so lineitem⋈orders is a shuffle join (AQE picks the strategy); the
    * three dimension joins are broadcast. */
  private val joinRevenueByNation = QueryDef(
    "join_revenue_by_nation",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = broadcast(Tables.customer(s, dir))
      val n  = broadcast(Tables.nation(s, dir))
      val r  = broadcast(Tables.region(s, dir))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("n_items"),
          Exact.dsumR(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 4)
            .as("revenue"))
        .orderBy("r_name", "n_name")
    },
    Some(s"""SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_items,
             ${Exact.sqlSum("round(l_extendedprice * (1 - l_discount), 4)", 4)} AS revenue
             FROM lineitem
             JOIN orders   ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation   ON c_nationkey = n_nationkey
             JOIN region   ON n_regionkey = r_regionkey
             GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
  )

  /** Top-10 customers by lifetime spend: fact⋈dim with broadcast dim, then
    * top-k (TakeOrderedAndProject — no global sort). Revenue is an exact
    * decimal sum, so the DESC ordering can't be flipped by float noise. */
  private val joinTopCustomers = QueryDef(
    "join_top_customers",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = broadcast(Tables.customer(s, dir))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
          Exact.dsumR(col("o_totalprice")).as("total_spent"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spent").desc, col("c_custkey"))
        .limit(10)
    },
    Some(s"""SELECT c_custkey, c_name, ${Exact.sqlSum("o_totalprice")} AS total_spent,
             CAST(count(*) AS BIGINT) AS n_orders
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY c_custkey, c_name
             ORDER BY total_spent DESC, c_custkey LIMIT 10"""),
  )

  /** Anti join: orders with no lineitems (NOT EXISTS). Spark plans a
    * broadcast/shuffled hash anti-join — no NOT IN materialization. */
  private val joinOrdersNoLineitem = QueryDef(
    "join_orders_no_lineitem",
    (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT CAST(count(*) AS BIGINT) AS cnt FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)"""),
  )

  /** Semi join: customers that placed at least one high-value order. */
  private val joinSemiBigSpenders = QueryDef(
    "join_semi_big_spenders",
    (s, dir) =>
      Tables.customer(s, dir)
        .join(
          Tables.orders(s, dir).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
            ORDER BY c_custkey"""),
  )

  /** Two-dim rollup: market segment × order priority (customer⋈orders). */
  private val joinSegmentPriority = QueryDef(
    "join_segment_priority",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = broadcast(Tables.customer(s, dir))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), Exact.dsumR(col("o_totalprice")).as("total"))
        .orderBy("c_mktsegment", "o_orderpriority")
    },
    Some(s"""SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
             ${Exact.sqlSum("o_totalprice")} AS total
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY 1, 2 ORDER BY c_mktsegment, o_orderpriority"""),
  )

  /** TPC-H Q1-shaped pricing summary on lineitem — the canonical columnar
    * scan+agg benchmark (the reference's "complex aggregation" pedagogy,
    * README.md:798–818, at fact-table scale). */
  private val pricingSummary = QueryDef(
    "pricing_summary",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate").cast("date") <= lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Exact.dsumR(col("l_quantity")).as("sum_qty"),
          Exact.dsumR(col("l_extendedprice")).as("sum_base_price"),
          Exact.dsumR(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 4)
            .as("sum_disc_price"),
          Exact.davgR(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
             ${Exact.sqlSum("l_quantity")} AS sum_qty,
             ${Exact.sqlSum("l_extendedprice")} AS sum_base_price,
             ${Exact.sqlSum("round(l_extendedprice * (1 - l_discount), 4)", 4)} AS sum_disc_price,
             ${Exact.sqlAvg("l_quantity")} AS avg_qty,
             CAST(count(*) AS BIGINT) AS count_order
             FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
             GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
  )

  /** Set operations (SURVEY.md §2.7 — the reference uses none; labeled
    * extension): customers-with-orders vs high-balance customers, the
    * UNION / INTERSECT / EXCEPT counts derived in ONE pass from a
    * full-outer join of the two distinct key sets (null-side membership
    * tags) instead of three separate shuffle-dedup scans — each input is
    * scanned and deduplicated exactly once regardless of how many set-op
    * results are read off the join. */
  private val setOps = QueryDef(
    "set_ops",
    (s, dir) => {
      val active = Tables.orders(s, dir).select(col("o_custkey").as("k")).distinct()
        .withColumn("a", lit(1))
      val wealthy = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k")).distinct()
        .withColumn("w", lit(1))
      active.join(wealthy, Seq("k"), "full_outer")
        .agg(
          count(lit(1)).as("u"),
          count(when(col("a").isNotNull && col("w").isNotNull, 1)).as("i"),
          count(when(col("a").isNotNull && col("w").isNull, 1)).as("e"))
        .select(expr("stack(3, 'union', u, 'intersect', i, 'except', e) AS (op, cnt)"))
        .orderBy("op")
    },
    Some("""WITH active AS (SELECT DISTINCT o_custkey AS k FROM orders),
            wealthy AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
            SELECT 'except' AS op, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT k FROM active EXCEPT SELECT k FROM wealthy)
            UNION ALL
            SELECT 'intersect', count(*)
              FROM (SELECT k FROM active INTERSECT SELECT k FROM wealthy)
            UNION ALL
            SELECT 'union', count(*)
              FROM (SELECT k FROM active UNION SELECT k FROM wealthy)
            ORDER BY op"""),
  )

  /** X54 entity resolution (record linkage) — fuzzy-match a "dirty" feed
    * of perturbed customer names back to the master table, the
    * Fellegi–Sunter blocking+compare shape every ingestion pipeline needs:
    * BLOCK on a stable key fragment — chars 6–8 of the name's digit run,
    * POSITION-ANCHORED FROM THE FRONT of the run so the key survives the
    * whole noise family (suffix loss shortens the run from the right,
    * appended chars and punctuation swaps never enter the run, and the
    * surrounding text layout is irrelevant because the run is extracted
    * by regex, not by a fixed name offset — the classic "block on what
    * the noise spares" assumption), then score ONLY within-block pairs
    * with `levenshtein` (both engines implement unit-cost edit distance)
    * and keep each dirty record's best match (min distance, then min key).
    *
    * Scale shape: the candidate join is a hash equi-join on the block key
    * — Σ per-block products, never the N×M cross product (same family as
    * the MinHash band join). Per-dirty-record best-of is an ASSOCIATIVE
    * struct-min aggregate — map-side partial, one surviving candidate per
    * dirty key per partition, no all-candidates window shuffle. The
    * deterministic perturbation (drop last char / append / '#'→'-' by key
    * mod 3) lets DuckDB rebuild the identical dirty feed, so the whole
    * linkage — blocks, scores, tie-breaks — hash-matches. */
  private val entityResolution = QueryDef(
    "entity_resolution",
    (s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
      val dirty = c.select(
        col("c_custkey").as("d_key"),
        when(col("c_custkey") % 3 === 0,
          expr("substring(c_name, 1, length(c_name) - 1)"))
          .when(col("c_custkey") % 3 === 1, concat(col("c_name"), lit("x")))
          .otherwise(regexp_replace(col("c_name"), "#", "-")).as("d_name"))
        .withColumn("blk", expr("substring(regexp_replace(d_name, '[^0-9]', ''), 6, 3)"))
      val master = c.withColumn("blk",
        expr("substring(regexp_replace(c_name, '[^0-9]', ''), 6, 3)"))
      val scored = dirty.join(master, "blk")
        .select(col("d_key"), col("d_name"), col("c_custkey"),
          levenshtein(col("d_name"), col("c_name")).cast("long").as("dist"))
      // best match = min of (dist, custkey) as an ASSOCIATIVE struct-min
      // aggregate: partial-aggregates map-side (one candidate per dirty
      // key per partition crosses the wire), where a row_number window
      // would shuffle EVERY within-block candidate pair to the reducers.
      // Selection is identical to ORDER BY dist, c_custkey LIMIT 1 — the
      // oracle keeps the window formulation and hash-matches.
      scored.groupBy("d_key")
        .agg(min(struct(col("dist"), col("c_custkey"))).as("m"))
        .select(col("d_key"), col("m.c_custkey").as("matched_key"),
          col("m.dist").as("dist"),
          (col("d_key") === col("m.c_custkey")).cast("long").as("is_self"))
        .orderBy("d_key")
    },
    Some("""WITH c AS (SELECT c_custkey, c_name FROM customer),
            dirty AS (SELECT c_custkey AS d_key,
                   CASE WHEN c_custkey % 3 = 0 THEN substring(c_name, 1, length(c_name) - 1)
                        WHEN c_custkey % 3 = 1 THEN c_name || 'x'
                        ELSE replace(c_name, '#', '-') END AS d_name
                 FROM c),
            db AS (SELECT d_key, d_name,
                   substring(regexp_replace(d_name, '[^0-9]', '', 'g'), 6, 3) AS blk FROM dirty),
            mb AS (SELECT c_custkey, c_name,
                   substring(regexp_replace(c_name, '[^0-9]', '', 'g'), 6, 3) AS blk FROM c),
            scored AS (SELECT db.d_key, db.d_name, mb.c_custkey,
                   CAST(levenshtein(db.d_name, mb.c_name) AS BIGINT) AS dist
                 FROM db JOIN mb ON mb.blk = db.blk),
            best AS (SELECT * FROM (
                   SELECT *, row_number() OVER (PARTITION BY d_key
                          ORDER BY dist, c_custkey) AS rn
                   FROM scored) WHERE rn = 1)
            SELECT d_key, c_custkey AS matched_key, dist,
                   CAST(CASE WHEN d_key = c_custkey THEN 1 ELSE 0 END AS BIGINT) AS is_self
            FROM best ORDER BY d_key"""),
  )

  val defs: Seq[QueryDef] = Seq(
    joinRevenueByNation, joinTopCustomers, joinOrdersNoLineitem,
    joinSemiBigSpenders, joinSegmentPriority, pricingSummary, setOps,
    entityResolution,
  )
}
