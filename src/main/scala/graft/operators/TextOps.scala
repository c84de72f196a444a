package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data text operators over `documents` (SURVEY.md §2.12 —
  * driver-mandated extensions, not reference-derived).
  *
  * Scale design: every per-document op is a narrow map (no shuffle);
  * dedup-style ops shuffle once on the dedup key. The only quadratic
  * candidate-pair generation (jaccard_pairs) is bounded to a fixed-size
  * probe set — the unbounded-scale path is MinHash/LSH (minhash_dedup),
  * which is linear in corpus size with banding controlling recall.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  /** X1 exact dedup: canonical doc per distinct text = min(doc_id), with
    * multiplicity. One hash shuffle on the text key. At 100 TB you'd key on
    * xxhash64(text) instead of the full text to shrink shuffle width —
    * semantics identical (collision odds ~0); here the text IS the key so
    * the oracle can express it. */
  private val dedupExact = QueryDef(
    "dedup_exact",
    (s, dir) =>
      docs(s, dir)
        .groupBy("text")
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "text", "n_copies")
        .orderBy("doc_id"),
    Some("""SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text,
            CAST(count(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY text ORDER BY doc_id"""),
  )

  /** X4 corpus stats per language: volume + mean length. */
  private val textStats = QueryDef(
    "text_stats",
    (s, dir) =>
      docs(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 2).as("avg_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang"),
    Some("""SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
            round(CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*), 2) AS avg_chars,
            CAST(max(n_chars) AS BIGINT) AS max_chars
            FROM documents GROUP BY lang ORDER BY lang"""),
  )

  /** Token counting (whitespace tokenizer): total + distinct tokens per doc.
    * Narrow map over the corpus — embarrassingly parallel. */
  private val tokenCounts = QueryDef(
    "token_counts",
    (s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_uniq"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
            FROM documents ORDER BY doc_id"""),
  )

  /** Quality scoring: uniq-token ratio + mean token length + a quality tier —
    * the usual cheap pre-training filters. Integer-derived doubles, so the
    * ratios are bit-identical in both engines. */
  private val docQuality = QueryDef(
    "doc_quality",
    (s, dir) => {
      val toks  = split(col("text"), " ")
      val nTok  = size(toks).cast("long")
      val nUniq = size(array_distinct(toks)).cast("long")
      val ratio = nUniq.cast("double") / nTok.cast("double")
      docs(s, dir)
        .select(
          col("doc_id"),
          nTok.as("n_tokens"),
          round(ratio, 4).as("uniq_ratio"),
          round((col("n_chars") - (nTok - 1)).cast("double") / nTok.cast("double"), 4)
            .as("avg_token_len"),
          when(ratio < 0.5, "low").when(ratio < 0.8, "mid").otherwise("high")
            .as("quality"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
              SELECT doc_id, n_chars,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                     CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
              FROM documents)
            SELECT doc_id, n_tokens,
                   round(CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS uniq_ratio,
                   round(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS avg_token_len,
                   CASE WHEN CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE) < 0.5 THEN 'low'
                        WHEN CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE) < 0.8 THEN 'mid'
                        ELSE 'high' END AS quality
            FROM t ORDER BY doc_id"""),
  )

  /** Language-ID heuristic: stopword-marker voting (the classic n-gram/
    * stopword approach, collapsed to a deterministic rule both engines can
    * evaluate). The fixture vocabulary is synthetic, so this demonstrates
    * the operator shape — marker hits → argmax — not linguistic accuracy. */
  private val langIdHeuristic = QueryDef(
    "lang_id_heuristic",
    (s, dir) => {
      val toks = array_distinct(split(col("text"), " "))
      val hitEn = array_contains(toks, "the").cast("int") + array_contains(toks, "and").cast("int")
      val hitFn = array_contains(toks, "scan").cast("int") + array_contains(toks, "merge").cast("int")
      docs(s, dir)
        .select(
          col("doc_id"), col("lang"),
          when(hitEn > hitFn, "en").when(hitFn > hitEn, "fn").otherwise("und")
            .as("lang_guess"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
              SELECT doc_id, lang,
                     CAST(list_contains(list_distinct(string_split(text, ' ')), 'the') AS INT)
                   + CAST(list_contains(list_distinct(string_split(text, ' ')), 'and') AS INT) AS hit_en,
                     CAST(list_contains(list_distinct(string_split(text, ' ')), 'scan') AS INT)
                   + CAST(list_contains(list_distinct(string_split(text, ' ')), 'merge') AS INT) AS hit_fn
              FROM documents)
            SELECT doc_id, lang,
                   CASE WHEN hit_en > hit_fn THEN 'en'
                        WHEN hit_fn > hit_en THEN 'fn' ELSE 'und' END AS lang_guess
            FROM t ORDER BY doc_id"""),
  )

  /** Rolling-hash document fingerprint (polynomial hash over characters,
    * mod 2^61-1 avoided in favor of plain 64-bit wrap so both engines agree).
    * Exact-duplicate detection on a fixed-width key — this is the shuffle
    * key you'd dedup on at 100 TB instead of the full text. */
  private val docFingerprint = QueryDef(
    "doc_fingerprint",
    (s, dir) => {
      // fold(codepoints, h = 0; h = (h*31 + cp) % 1e15) — one codegen'd
      // JVM loop per row (functions.RollingFingerprint); the composable
      // aggregate(transform(split(...))) formulation allocates per
      // character through interpreted HOF lambdas. The modulus keeps every
      // intermediate < 2^63 (DuckDB errors on BIGINT overflow).
      graft.functions.RollingFingerprint.register(s)
      docs(s, dir)
        .select(col("doc_id"),
          graft.functions.RollingFingerprint.rollingFingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split_regex(text, ''), ch -> CAST(ascii(ch) AS BIGINT))),
                        (h, c) -> (h * 31 + c) % 1000000000000000) AS fingerprint
            FROM documents ORDER BY doc_id"""),
  )

  /** X2 n-gram Jaccard near-dup pairs: distinct-token Jaccard ≥ 0.7 among a
    * bounded probe set (doc_id < 300). Exact quadratic verification is the
    * oracle-able baseline; minhash_dedup below is the linear-scale path. */
  /** Near-dup candidate edges: distinct-token Jaccard ≥ 0.7 among the
    * bounded probe set (doc_id < 300). Shared by `jaccard_pairs` (the pair
    * listing) and `dedup_components` (the transitive closure). */
  private def jaccardEdgesPlan(s: SparkSession, dir: String): DataFrame = {
    // fan the split/explode kernel off the single-split documents scan
    // (Tables.fanOutSmall: no-op on any multi-split production input) —
    // the token explode + self-join screen otherwise runs in ONE task
    val sub = graft.Tables.fanOutSmall(
      docs(s, dir).filter(col("doc_id") < 300).select("doc_id", "text"),
      s, dir, "documents", col("doc_id"))
    val tok = sub.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("token"))
    val sz  = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = tok.as("a")
      .join(tok.as("b"), col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("i"))
    val j = col("i").cast("double") /
      (col("sa.n") + col("sb.n") - col("i")).cast("double")
    inter
      .join(sz.as("sa"), col("id1") === col("sa.doc_id"))
      .join(sz.as("sb"), col("id2") === col("sb.doc_id"))
      .filter(j >= 0.7)
      .select(col("id1"), col("id2"), round(j, 4).as("jaccard"))
  }

  /** The verified edge list, materialized ONCE per (session, sf-dir) and
    * read by every consumer — `jaccard_pairs` (the listing), the duplicate
    * closure, and `split_leakage_guard`'s audit. A production curation DAG
    * writes the pair list after the quadratic verification and fans out
    * from the materialization; re-deriving it per consumer would triple
    * the most expensive join in the family. Cleared by
    * [[resetSessionMemo]] so bench passes stay honest. */
  private val edgesMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def jaccardEdges(s: SparkSession, dir: String): DataFrame =
    edgesMemo.computeIfAbsent((s, dir),
      kv => jaccardEdgesPlan(kv._1, kv._2).localCheckpoint())

  /** Distributed connected components by min-label propagation WITH
    * pointer jumping, over an undirected edge list (id1, id2) → (id, comp)
    * where comp is the smallest node id in the component. Each round is
    * (1) propagate: comp(v) ← min(comp(v), min over neighbors' comp) —
    * one shuffle join + min-aggregation — then (2) jump: comp(v) ←
    * comp(comp(v)) — a self-join of the label table, sound because every
    * label is itself a node id in the same component. Propagation alone
    * needs diameter rounds; the jump halves remaining chain depth each
    * round, so convergence is O(log diameter) — a 200-node path closes in
    * ~9 rounds (DedupSpec) and the 25-round cap covers diameters beyond
    * 2^25. Labels are monotone non-increasing, so the monotone label sum
    * detects the fixpoint without an extra change-join, and
    * non-convergence is an ERROR, never a silently partial merge. */
  private[graft] def connectedComponents(pairs0: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // cache the pair source BEFORE mirroring it, or the union evaluates the
    // (possibly expensive) candidate-pair plan twice
    val pairs = pairs0.persist(lvl)
    // localCheckpoint (not persist) each iteration: iterative plans grow a
    // level of join lineage per round, and while caching shortcuts
    // EXECUTION, every action still re-analyzes the full logical tree — the
    // per-round driver cost compounds until it dwarfs the actual work.
    // Checkpointing truncates the plan to the materialized result, pinning
    // per-round cost constant. (A fault-tolerant 1000-executor run would
    // use reliable checkpoint(dir) every few rounds instead; same shape.)
    val e = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .unionAll(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .localCheckpoint()
    pairs.unpersist()
    // Size the LOOP's shuffles from the edge count, not the session conf:
    // each round shuffles O(edges + labels) narrow rows, and an iterative
    // loop multiplies any per-exchange overhead by (rounds × exchanges).
    // At the session's default width (cores), a probe-bounded edge list
    // pays 32-96 near-empty tasks plus one AQE re-optimization job PER
    // EXCHANGE PER ROUND — measured at ~2.5 s of the dedup closure's
    // ~3.3 s, with milliseconds of real work. ~500k edge rows per
    // partition keeps partitions in the guide's 100 MB-ish band for these
    // ~16-byte rows; a 100 TB closure (billions of edges) therefore keeps
    // thousands of partitions and keeps AQE, while the tiny regime (fits
    // ONE partition comfortably) also drops AQE — with a single shuffle
    // partition there is nothing left to adapt, and each round collapses
    // to its two real jobs. The loop runs in an isolated CHILD session
    // (LoopSession scaladoc) so the caller's session conf is never
    // mutated; the fixpoint is partitioning-independent (exact integer
    // min-labels).
    val spark = pairs0.sparkSession
    val edgeCount = e.count()
    val loopS = LoopSession.forRows(spark, edgeCount)
    val el = LoopSession.adopt(e, loopS)
    val obs0 = org.apache.spark.sql.Observation(
      s"cc0-${java.util.UUID.randomUUID()}")
    var labels = el.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .observe(obs0, sum("comp").as("s"))
      .localCheckpoint()
    var prevSum = observedLong(obs0, "s").getOrElse(
      Option(labels.agg(sum("comp")).head.get(0)).map(_.toString.toLong).getOrElse(0L))
    var converged = false
    var iter = 0
    while (!converged && iter < 25) {
      // propagate: comp(v) ← min(comp(v), min over neighbors' comp). The
      // node's own label rides the aggregation as one more union row, so
      // one join + one min-groupBy replaces the join + groupBy + left-join
      // + coalesce shape (and its extra checkpoint) — half the per-round
      // jobs for the same fixpoint.
      val propagated = el.join(labels, el("a") === labels("id"))
        .select(col("b").as("id"), col("comp"))
        .unionAll(labels)
        .groupBy("id").agg(min("comp").as("comp"))
        .persist(lvl) // read twice by the self-join below; persist, don't recompute
      // pointer jump: comp(v) ← comp(comp(v)). comp(c) ≤ c for every node
      // c (labels start at the id and only decrease), so the jump is
      // monotone too; inner join is total because every label value is a
      // node id present in the label table.
      val jump = propagated.select(col("id").as("jid"), col("comp").as("jcomp"))
      // convergence sum rides the checkpoint materialization as an
      // Observation — one fewer scheduled job per round than a separate
      // agg().head action; the agg stays as the fallback if the metric
      // doesn't materialize
      val obs = org.apache.spark.sql.Observation(
        s"cc-${java.util.UUID.randomUUID()}")
      val next = propagated.join(jump, propagated("comp") === jump("jid"))
        .select(propagated("id"), col("jcomp").as("comp"))
        .observe(obs, sum("comp").as("s"))
        .localCheckpoint() // eager: materialized here, before the unpersist
      propagated.unpersist(false)
      val s2 = observedLong(obs, "s").getOrElse(
        Option(next.agg(sum("comp")).head.get(0)).map(_.toString.toLong).getOrElse(0L))
      labels = next
      converged = s2 == prevSum // monotone: equal sum ⇔ no label moved
      prevSum = s2
      iter += 1
    }
    require(converged,
      s"connectedComponents: no fixpoint after $iter rounds — component " +
        "diameter exceeds 2^25 or the edge list mutated mid-run; results " +
        "would be partially-merged labels, refusing to return them")
    // labels is localCheckpoint'd (materialized) — re-rooting it back into
    // the caller's session is free and keeps consumers single-session
    LoopSession.adopt(labels, spark)
  }

  /** Long metric from a completed query Observation; None when it didn't
    * materialize (callers keep the explicit aggregate as the fallback —
    * never silently zero). The observed action has already run when this
    * is called, so the wait only covers listener-bus delivery — but that
    * delivery is not guaranteed (a dropped event under listener-queue
    * overflow, or an action path that skips the QueryExecutionListener,
    * never completes the promise), and `get`/`getAsJava` block with an
    * INFINITE timeout. Bound the wait so the callers' explicit-aggregate
    * fallback is actually reachable (ADVICE r19): 5 s is orders of
    * magnitude above observed bus latency, and the fallback recomputes the
    * exact same sum, so a spurious timeout costs one extra job, never
    * correctness. */
  private def observedLong(obs: org.apache.spark.sql.Observation,
      key: String): Option[Long] =
    try {
      val row = scala.concurrent.Await.result(
        obs.future, scala.concurrent.duration.Duration(5, "s"))
      Option(row.getAs[Any](key)).map(_.toString.toLong)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The duplicate closure, computed ONCE per (session, sf-dir) and read
    * by both `dedup_components` (the listing) and `dedup_resolve` (the
    * keep/drop decision) — mirroring a production curation DAG, where the
    * resolve step consumes the closure output rather than re-deriving it.
    * The memoized value is a localCheckpoint'd label table (materialized
    * in the session's block manager), so the second reader costs one scan
    * of the labels, not a second iterative closure. */
  private val componentsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[graft] def dupComponents(s: SparkSession, dir: String): DataFrame =
    componentsMemo.computeIfAbsent((s, dir),
      kv => connectedComponents(jaccardEdges(kv._1, kv._2).select("id1", "id2")))

  /** Bench hook: drop the memoized closure so each timing pass pays the
    * closure's real cost exactly once — min-of-passes would otherwise
    * report the memoized read for BOTH queries and erase the closure from
    * the bench entirely (the honest number for the pair is one closure
    * + one cheap agg, not ε + ε). */
  private[graft] def resetSessionMemo(): Unit = {
    componentsMemo.clear()
    edgesMemo.clear()
    bpeMemo.clear()
  }

  private val jaccardPairs = QueryDef(
    "jaccard_pairs",
    (s, dir) => jaccardEdges(s, dir).orderBy("id1", "id2"),
    Some("""WITH tok AS (
              SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
              FROM documents WHERE doc_id < 300),
            sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS BIGINT) AS i
              FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id1, id2,
                   round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 4) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = id1
            JOIN sz sb ON sb.doc_id = id2
            WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
            ORDER BY id1, id2"""),
  )

  /** X2 duplicate-CLUSTER resolution: near-dup candidate pairs only say
    * "A~B"; a curation run needs the transitive closure (A~B, B~C ⇒ one
    * cluster) to keep exactly one canonical doc per group. Connected
    * components via distributed min-label propagation: each round is one
    * shuffle join + aggregation, labels only ever decrease, and the round
    * count is the cluster diameter — near-dup clusters are shallow (dup
    * chains, not long paths), so this converges in a handful of rounds at
    * any corpus size. Convergence is detected by the monotone sum of
    * labels (no extra join); adversarially deep graphs would switch to
    * the large-star/small-star variant (O(log n) rounds), same per-round
    * plan shape. Oracle: DuckDB recursive CTE over the same edge set. */
  private val dedupComponents = QueryDef(
    "dedup_components",
    (s, dir) =>
      dupComponents(s, dir)
        .select(col("id").cast("long").as("doc_id"),
          col("comp").cast("long").as("component"))
        .orderBy("doc_id"),
    Some("""WITH RECURSIVE tok AS (
              SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
              FROM documents WHERE doc_id < 300),
            sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS BIGINT) AS i
              FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id1, id2 FROM inter
              JOIN sz sa ON sa.doc_id = id1
              JOIN sz sb ON sb.doc_id = id2
              WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7),
            e AS (SELECT id1 AS a, id2 AS b FROM pairs
                  UNION ALL SELECT id2, id1 FROM pairs),
            reach AS (
              SELECT a AS node, a AS r FROM e
              UNION
              SELECT reach.node, e.b FROM reach JOIN e ON e.a = reach.r)
            SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS component
            FROM reach GROUP BY node ORDER BY doc_id"""),
  )

  /** Duplicate-cluster RESOLUTION — the step after [[dedupComponents]]:
    * per cluster, keep the canonical member (the min doc_id, which IS the
    * component label) and count the dropped ones. The keep/drop decision a
    * curation run actually applies; one aggregation over the component
    * labels, so the cost is the closure itself. */
  private val dedupResolve = QueryDef(
    "dedup_resolve",
    (s, dir) =>
      dupComponents(s, dir)
        .groupBy(col("comp").cast("long").as("keep_doc"))
        .agg(count(lit(1)).as("n_members"))
        .withColumn("n_dropped", col("n_members") - 1L)
        .orderBy("keep_doc"),
    Some("""WITH RECURSIVE tok AS (
              SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
              FROM documents WHERE doc_id < 300),
            sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS BIGINT) AS i
              FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id1, id2 FROM inter
              JOIN sz sa ON sa.doc_id = id1
              JOIN sz sb ON sb.doc_id = id2
              WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7),
            e AS (SELECT id1 AS a, id2 AS b FROM pairs
                  UNION ALL SELECT id2, id1 FROM pairs),
            reach AS (
              SELECT a AS node, a AS r FROM e
              UNION
              SELECT reach.node, e.b FROM reach JOIN e ON e.a = reach.r),
            comp AS (SELECT node, min(r) AS c FROM reach GROUP BY node)
            SELECT CAST(c AS BIGINT) AS keep_doc,
                   CAST(count(*) AS BIGINT) AS n_members,
                   CAST(count(*) - 1 AS BIGINT) AS n_dropped
            FROM comp GROUP BY c ORDER BY keep_doc"""),
  )

  /** X92 duplicate-cluster size distribution — the dedup REPORT every
    * curation run publishes next to the keep/drop decision: how many
    * clusters of each size exist, and how many documents they hold. The
    * histogram is what tells you whether duplication is a long tail of
    * pairs (cheap to drop) or a few giant boilerplate clusters (worth a
    * source-level investigation) — the two corpora need different
    * responses, and `dedup_resolve`'s per-cluster listing doesn't
    * aggregate to that answer. Singleton docs (no near-dup edge) are
    * included as size-1 clusters so the histogram partitions the probe
    * set: Σ n_docs = |probe|.
    *
    * Scale shape: reads the SAME memoized closure `dedup_components` /
    * `dedup_resolve` consume (one closure per curation DAG, fanned out);
    * on top of it, two tiny aggregations (per-component size, then the
    * size histogram — both component-count-sized) and one left join of
    * the probe ids against the label table. Nothing corpus-sized moves
    * beyond the closure itself. */
  private val dedupClusterStats = QueryDef(
    "dedup_cluster_stats",
    (s, dir) => {
      val comps = dupComponents(s, dir)
        .select(col("id").cast("long").as("doc_id"), col("comp").cast("long").as("comp"))
      docs(s, dir).filter(col("doc_id") < 300)
        .select(col("doc_id").cast("long").as("doc_id"))
        .join(comps, Seq("doc_id"), "left")
        // edge-less docs are their own singleton component
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
        .groupBy("comp").agg(count(lit(1)).as("csize"))
        .groupBy(col("csize").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"), sum("csize").as("n_docs"))
        .orderBy("cluster_size")
    },
    Some("""WITH RECURSIVE tok AS (
              SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
              FROM documents WHERE doc_id < 300),
            sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS BIGINT) AS i
              FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id1, id2 FROM inter
              JOIN sz sa ON sa.doc_id = id1
              JOIN sz sb ON sb.doc_id = id2
              WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7),
            e AS (SELECT id1 AS a, id2 AS b FROM pairs
                  UNION ALL SELECT id2, id1 FROM pairs),
            reach AS (
              SELECT a AS node, a AS r FROM e
              UNION
              SELECT reach.node, e.b FROM reach JOIN e ON e.a = reach.r),
            comp AS (SELECT node, min(r) AS c FROM reach GROUP BY node),
            alldocs AS (SELECT d.doc_id, coalesce(comp.c, d.doc_id) AS c
                        FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
                        LEFT JOIN comp ON comp.node = d.doc_id),
            cs AS (SELECT c, CAST(count(*) AS BIGINT) AS csize
                   FROM alldocs GROUP BY c)
            SELECT csize AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
                   CAST(sum(csize) AS BIGINT) AS n_docs
            FROM cs GROUP BY csize ORDER BY cluster_size"""),
  )

  /** Deterministic corpus sampling: md5-bucket the doc id and keep ~1/16
    * of documents — the reproducible, engine-portable alternative to
    * `TABLESAMPLE`/`rand()` for carving train/eval splits. A narrow filter
    * (no shuffle, no state); the same doc always lands in the same split
    * on any cluster size, and DuckDB computes the identical assignment. */
  private val deterministicSample = QueryDef(
    "deterministic_sample",
    (s, dir) =>
      docs(s, dir)
        .filter(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 1) === "0")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, lang, n_chars FROM documents
            WHERE substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
            ORDER BY doc_id"""),
  )

  /** The composed training-data pipeline, end-to-end in ONE declarative
    * plan: quality-gate (unique-token ratio ≥ 0.5) → exact dedup (min
    * doc_id per distinct text) → per-language token budget. The shape a
    * 100 TB curation run has: narrow quality scoring, one dedup shuffle on
    * the text key, one aggregation shuffle on language — Catalyst pipelines
    * the gate into the dedup scan, so the corpus is read once. */
  private val curationPipeline = QueryDef(
    "curation_pipeline",
    (s, dir) => {
      val toks = split(col("text"), " ")
      val ratio = size(array_distinct(toks)).cast("double") / size(toks).cast("double")
      docs(s, dir)
        .withColumn("n_tokens", size(toks).cast("long"))
        .filter(ratio >= 0.5)
        .groupBy("text")
        // min (not first): duplicate texts could carry different langs, and
        // first() is partition-order-dependent — not oracle-deterministic
        .agg(min(col("doc_id")).as("doc_id"), min(col("lang")).as("lang"),
          min(col("n_tokens")).as("n_tokens"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("docs_kept"),
          sum(col("n_tokens")).as("token_budget"))
        .orderBy("lang")
    },
    Some("""WITH gated AS (
              SELECT doc_id, text, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents
              WHERE CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / len(string_split(text, ' ')) >= 0.5),
            deduped AS (
              SELECT min(doc_id) AS doc_id, text,
                     min(lang) AS lang, min(n_tokens) AS n_tokens
              FROM gated GROUP BY text)
            SELECT lang, CAST(count(*) AS BIGINT) AS docs_kept,
                   CAST(sum(n_tokens) AS BIGINT) AS token_budget
            FROM deduped GROUP BY lang ORDER BY lang"""),
  )

  /** X2 MinHash+LSH near-dup detection — the linear-scale fuzzy dedup:
    * 3-token shingles → k=8 md5 min-hashes → 4 bands of 2 → band-bucket
    * self-join yields candidates → exact shingle-Jaccard verifies ≥ 0.5.
    *
    * Every stage is md5-derived (the one hash Spark and DuckDB compute
    * identically), so the FULL pipeline — signatures, banding, candidate
    * pairs, verified Jaccard — is recomputable in SQL and hash-matched by
    * the oracle, not just spec-trusted. min(md5) of a cryptographic hash is
    * a uniform random min-permutation, so these are valid minhash values.
    *
    * Scale: candidates come from equality self-join on (band, bucket) —
    * one shuffle keyed on the bucket; no quadratic blow-up unless buckets
    * collide, which banding parameters control. */
  private val minhashDedup = QueryDef(
    "minhash_dedup",
    (s, dir) => minhashPairs(docs(s, dir), bands = 4, rowsPerBand = 2, threshold = 0.5),
    Some("""WITH ts AS (
              SELECT doc_id, text,
                     list_filter(string_split(text, ' '), t -> len(t) > 0) AS ts
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN len(ts) >= 3
                          THEN ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' ' || ts[CAST(i AS INT) + 2]
                          ELSE text END AS sh
              FROM ts, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 1))) AS i) g),
            sig AS (
              SELECT doc_id,
                     min(md5('1:' || sh)) AS h1, min(md5('2:' || sh)) AS h2,
                     min(md5('3:' || sh)) AS h3, min(md5('4:' || sh)) AS h4,
                     min(md5('5:' || sh)) AS h5, min(md5('6:' || sh)) AS h6,
                     min(md5('7:' || sh)) AS h7, min(md5('8:' || sh)) AS h8
              FROM sh GROUP BY doc_id),
            cand AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2
              FROM sig a JOIN sig b ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id
              FROM sig a JOIN sig b ON a.h3 = b.h3 AND a.h4 = b.h4 AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id
              FROM sig a JOIN sig b ON a.h5 = b.h5 AND a.h6 = b.h6 AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id
              FROM sig a JOIN sig b ON a.h7 = b.h7 AND a.h8 = b.h8 AND a.doc_id < b.doc_id),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT c.id1, c.id2, count(*) AS i
              FROM cand c
              JOIN sh s1 ON s1.doc_id = c.id1
              JOIN sh s2 ON s2.doc_id = c.id2 AND s2.sh = s1.sh
              GROUP BY 1, 2)
            SELECT inter.id1, inter.id2,
                   round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 4) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = inter.id1
            JOIN sz sb ON sb.doc_id = inter.id2
            WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
            ORDER BY id1, id2"""),
  )

  /** X2 oracle-checkable MinHash signature over CHARACTER shingles: the
    * same min-over-md5 construction as the LSH pipeline but on 5-char
    * shingles — the second granularity a fuzzy-dedup pass runs at (word
    * shingles catch re-orderings, char shingles catch in-word edits).
    * min(hex) of a cryptographic hash is a uniform random min-permutation,
    * so these ARE valid minhash values. The engine side runs the whole
    * signature in ONE narrow mapPartitions kernel — per doc, a running
    * min over the shingle hashes, no per-shingle row explosion and no
    * aggregation shuffle (the old explode + groupBy moved ~55 hashes per
    * doc through an exchange; this moves one 4-column row). JVM MD5 hex
    * equals Spark/DuckDB md5 on the same bytes, so the SQL oracle is
    * unchanged. */
  private val minhashSignature = QueryDef(
    "minhash_signature",
    (s, dir) => {
      import s.implicits._
      val base = docs(s, dir).select("doc_id", "text")
      // a single-file fixture arrives as ONE partition and would run the
      // kernel serially; spread it only when the source has fewer splits
      // than cores. A 100 TB corpus always has ≥ cores splits — no
      // shuffle on the scale path.
      val np = s.sparkContext.defaultParallelism
      val spread =
        if (base.rdd.getNumPartitions < np) base.repartition(np, col("doc_id"))
        else base
      spread.as[(Long, String)]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          // same allocation discipline as minhashPairs: digest reusable
          // prefix + window bytes, track minima as raw digests (unsigned
          // byte order == lowercase-hex order), hexify only the winners
          val prefixes = Array.tabulate(4)(k =>
            s"${k + 1}:".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          def less(a: Array[Byte], b: Array[Byte]): Boolean = {
            var i = 0
            while (i < 16) {
              val x = a(i) & 0xff; val y = b(i) & 0xff
              if (x != y) return x < y
              i += 1
            }
            false
          }
          def hex(b: Array[Byte]): String = {
            val sb = new java.lang.StringBuilder(32)
            b.foreach(x => sb.append(Integer.toHexString((x & 0xff) | 0x100).substring(1)))
            sb.toString
          }
          it.map { case (id, text) =>
            // same shingle rule as the SQL: 5-char windows, 1 window of
            // the whole text when it is shorter than 5 chars
            val n = math.max(text.length - 4, 1)
            val mins = new Array[Array[Byte]](4)
            var i = 0
            while (i < n) {
              val shBytes = text.substring(i, math.min(i + 5, text.length))
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              var k = 0
              while (k < 4) {
                md.update(prefixes(k))
                md.update(shBytes)
                val h = md.digest()
                if (mins(k) == null || less(h, mins(k))) mins(k) = h
                k += 1
              }
              i += 1
            }
            (id, hex(mins(0)), hex(mins(1)), hex(mins(2)), hex(mins(3)))
          }
        }.toDF("doc_id", "h1", "h2", "h3", "h4").orderBy("doc_id")
    },
    Some("""WITH sh AS (
              SELECT doc_id, substring(text, CAST(i AS INT), 5) AS sh
              FROM documents,
              LATERAL (SELECT unnest(generate_series(1, greatest(length(text)-4, 1))) AS i) t
            )
            SELECT doc_id,
                   min(md5('1:' || sh)) AS h1, min(md5('2:' || sh)) AS h2,
                   min(md5('3:' || sh)) AS h3, min(md5('4:' || sh)) AS h4
            FROM sh GROUP BY doc_id ORDER BY doc_id"""),
  )

  /** Lowercase md5 hex — byte-identical to Spark's `md5()` and DuckDB's
    * `md5()`, which is what makes the LSH pipelines oracle-recomputable.
    * Callers reuse one MessageDigest per partition. */
  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    val bytes = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(java.lang.Integer.toHexString((bytes(i) & 0xff) | 0x100).substring(1))
      i += 1
    }
    sb.toString
  }

  /** Shared MinHash pipeline (also used by DedupSpec).
    *
    * Shaped for scale: ONE narrow mapPartitions kernel computes
    * shingles → k minhashes → band buckets per document in primitive JVM
    * loops (a Catalyst higher-order-function formulation of the same
    * pipeline allocated per-element and showed 5–35s GC-bound variance at
    * sf0.1; the kernel is stable at ~1s). The candidate self-join shuffles
    * only (doc_id, band, bucket) — never shingle arrays; shingles are
    * joined back to verify exact Jaccard only for the deduped candidate
    * pairs. At 100 TB: one scan, one bucket-keyed shuffle whose width is
    * set by banding, verification proportional to candidates.
    *
    * Hashing is min(md5("seed:" ++ shingle)) — k digests per shingle buys
    * a pipeline every stage of which a second engine can recompute (the
    * oracle hash-matches the pair output). A throughput-only deployment
    * would swap in a seeded 64-bit mixer here; the plan shape is identical. */
  def minhashPairs(d: DataFrame, bands: Int, rowsPerBand: Int, threshold: Double): DataFrame =
    minhashPairsFromSig(minhashSignatures(d, bands, rowsPerBand), threshold)

  /** [[minhashPairs]] from an ALREADY-computed signature frame — callers
    * that also consume the signatures directly (`dedup_recall_report`
    * builds its shingle ground truth from the same frame) pass it in once
    * instead of running the k·shingles md5 kernel a second time. */
  def minhashPairsFromSig(withSig: DataFrame, threshold: Double): DataFrame = {
    val buckets = withSig.select(col("doc_id"),
      posexplode(col("buckets")).as(Seq("band", "bucket")))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .dropDuplicates("id1", "id2")
    val sh = withSig.select(col("doc_id"), col("shingles"))
    cand
      .join(sh.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sh.as("s2"), col("id2") === col("s2.doc_id"))
      .withColumn("jaccard",
        round(
          size(array_intersect(col("s1.shingles"), col("s2.shingles"))).cast("double") /
            size(array_union(col("s1.shingles"), col("s2.shingles"))).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
      .orderBy("id1", "id2")
  }

  /** Signature stage of the MinHash pipeline, shared by [[minhashPairs]]
    * (self-join dedup) and `minhash_decontaminate` (train-vs-eval probe):
    * per document, distinct word 3-shingles, k = bands·rowsPerBand md5
    * minhashes, and the band bucket keys. One narrow kernel pass; result is
    * localCheckpoint'd because every caller has ≥ 2 consumers (bucket
    * explode + shingle verify) and the k·shingles md5 work must run once. */
  def minhashSignatures(d: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    val src = d.select(col("doc_id").cast("long"), col("text"))
    // single-file fixtures arrive as one partition and would run the md5
    // kernel serially; spread only when the source has fewer splits than
    // cores (a real corpus always has ≥ cores splits — no shuffle then)
    val np = spark.sparkContext.defaultParallelism
    val spread =
      if (src.rdd.getNumPartitions < np) src.repartition(np, col("doc_id")) else src
    spread
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        // seed prefixes as reusable byte arrays: the hot loop does k
        // digest-updates per shingle with ZERO per-call string building
        // (the naive s"$seed:$shingle" + hex-per-digest formulation
        // allocates ~3 strings per md5 — 100M+ temporaries at sf1, and the
        // GC pressure turns a linear kernel superlinear). Digests are
        // compared as unsigned bytes, which orders exactly like the
        // lowercase-hex strings the oracle compares; only the k winning
        // minima get hexified.
        val prefixes = Array.tabulate(k)(s =>
          s"${s + 1}:".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        def less(a: Array[Byte], b: Array[Byte]): Boolean = {
          var i = 0
          while (i < 16) {
            val x = a(i) & 0xff; val y = b(i) & 0xff
            if (x != y) return x < y
            i += 1
          }
          false
        }
        it.map { case (id, text) =>
          val toks = text.split(' ').filter(_.nonEmpty)
          val shingles =
            if (toks.length >= 3)
              Array.tabulate(toks.length - 2)(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").distinct
            else Array(text)
          val mins = new Array[Array[Byte]](k)
          var i = 0
          while (i < shingles.length) {
            val shBytes = shingles(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var s = 0
            while (s < k) {
              md.update(prefixes(s))
              md.update(shBytes)
              val h = md.digest() // returns and resets
              if (mins(s) == null || less(h, mins(s))) mins(s) = h
              s += 1
            }
            i += 1
          }
          val sig = mins.map { bytes =>
            val sb = new java.lang.StringBuilder(32)
            var j = 0
            while (j < 16) {
              sb.append(java.lang.Integer.toHexString((bytes(j) & 0xff) | 0x100).substring(1))
              j += 1
            }
            sb.toString
          }
          // band bucket = concatenated minhashes of the band's rows; at
          // 100 TB you'd hash this 64*rows-char string to a fixed 8-byte
          // shuffle key — equality semantics are unchanged
          val buckets = Array.tabulate(bands) { b =>
            val sb = new java.lang.StringBuilder(32 * rowsPerBand)
            var r = 0
            while (r < rowsPerBand) { sb.append(sig(b * rowsPerBand + r)); r += 1 }
            sb.toString
          }
          (id, shingles, buckets)
        }
      }
      .toDF("doc_id", "shingles", "buckets")
      // multiple consumers (bucket explode + both verify sides): pin the
      // signature pass so the k·shingles md5 kernel runs ONCE, not per
      // consumer subtree (at 100 TB this is the difference between one
      // corpus scan and three)
      .localCheckpoint()
  }

  /** Fuzzy-surface benchmark decontamination — the third channel of the
    * decontamination trio (exact n-grams: `decontaminate_ngrams`; semantic:
    * `embed_decontaminate`). Eval leakage that was lightly edited or
    * reordered defeats exact n-gram overlap but still collides in MinHash
    * banding; this probes the train split against the eval split
    * (`source = 'src0'`) with the same banded-LSH construction as
    * `minhash_dedup`, then verifies exact shingle-Jaccard ≥ 0.5.
    *
    * Scale shape (asymmetric by design): eval sets are MBs, not TBs, so the
    * eval side's band buckets AND shingle sets are BROADCAST — the 100 TB
    * train side computes signatures in the shared narrow kernel and probes
    * the broadcast buckets without ever shuffling; exact verification
    * touches only the banding candidates. The per-source rollup keeps the
    * audit output stable (zeros included) whatever the hit count. */
  /** Verified train-vs-eval MinHash contamination pairs (tid, eid) —
    * the core of [[minhashDecontaminate]], shared with the cross-channel
    * `decontaminate_agreement` report in [[PipelineOps]]. */
  private[operators] def minhashContaminationPairs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val sigs = minhashSignatures(d.select("doc_id", "text"), bands = 4, rowsPerBand = 2)
    val evalIds = d.filter(col("source") === "src0").select("doc_id")
    val evalSigs = sigs.join(broadcast(evalIds), "doc_id")
    // train shingles ride the bucket stream so verification never
    // re-joins the full signature table — the only shuffle of
    // train-derived data is the candidate-pair dedup, which is
    // collision-proportional, not corpus-proportional
    val trainBuckets = sigs.join(broadcast(evalIds), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("tid"), col("shingles").as("tsh"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
    val evalBuckets = evalSigs
      .select(col("doc_id").as("eid"), posexplode(col("buckets")).as(Seq("band", "bucket")))
    // first() here is deterministic ONLY because tsh is functionally
    // dependent on tid (one shingle set per doc, band-invariant) — if a
    // later edit makes tsh band-dependent, switch to an order-insensitive
    // pick or the Jaccard verdicts below become nondeterministic
    val cand = trainBuckets.join(broadcast(evalBuckets), Seq("band", "bucket"))
      .groupBy("tid", "eid").agg(first(col("tsh")).as("tsh"))
    cand
      .join(broadcast(evalSigs.select(col("doc_id").as("eid"), col("shingles").as("esh"))), "eid")
      .filter(
        size(array_intersect(col("tsh"), col("esh"))).cast("double") /
          size(array_union(col("tsh"), col("esh"))).cast("double") >= 0.5)
      .select("tid", "eid")
  }

  private val minhashDecontaminate = QueryDef(
    "minhash_decontaminate",
    (s, dir) => {
      val d = docs(s, dir)
      val verified = minhashContaminationPairs(s, dir)
      val perDoc = verified.groupBy("tid").agg(count(lit(1)).as("np"))
      // no broadcast hint on perDoc: flagged-doc cardinality is NOT bounded
      // by construction (a heavily contaminated corpus flags many train
      // docs) — let AQE pick broadcast when the audit is small
      d.filter(col("source") =!= "src0")
        .select("source", "doc_id")
        .join(perDoc, col("doc_id") === col("tid"), "left")
        .groupBy("source")
        .agg(
          count(col("tid")).as("n_flagged_docs"),
          coalesce(sum(col("np")), lit(0L)).as("n_pairs"))
        .orderBy("source")
    },
    Some("""WITH ts AS MATERIALIZED (
              SELECT doc_id, text,
                     list_filter(string_split(text, ' '), t -> len(t) > 0) AS ts
              FROM documents),
            sh AS MATERIALIZED (
              SELECT DISTINCT doc_id,
                     CASE WHEN len(ts) >= 3
                          THEN ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' ' || ts[CAST(i AS INT) + 2]
                          ELSE text END AS sh
              FROM ts, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 1))) AS i) g),
            sig AS MATERIALIZED (
              SELECT doc_id,
                     min(md5('1:' || sh)) AS h1, min(md5('2:' || sh)) AS h2,
                     min(md5('3:' || sh)) AS h3, min(md5('4:' || sh)) AS h4,
                     min(md5('5:' || sh)) AS h5, min(md5('6:' || sh)) AS h6,
                     min(md5('7:' || sh)) AS h7, min(md5('8:' || sh)) AS h8
              FROM sh GROUP BY doc_id),
            ev AS (SELECT s.* FROM sig s JOIN documents d ON d.doc_id = s.doc_id
                   WHERE d.source = 'src0'),
            tr AS (SELECT s.* FROM sig s JOIN documents d ON d.doc_id = s.doc_id
                   WHERE d.source <> 'src0'),
            cand AS MATERIALIZED (
              SELECT tr.doc_id AS tid, ev.doc_id AS eid
              FROM tr JOIN ev ON tr.h1 = ev.h1 AND tr.h2 = ev.h2
              UNION
              SELECT tr.doc_id, ev.doc_id
              FROM tr JOIN ev ON tr.h3 = ev.h3 AND tr.h4 = ev.h4
              UNION
              SELECT tr.doc_id, ev.doc_id
              FROM tr JOIN ev ON tr.h5 = ev.h5 AND tr.h6 = ev.h6
              UNION
              SELECT tr.doc_id, ev.doc_id
              FROM tr JOIN ev ON tr.h7 = ev.h7 AND tr.h8 = ev.h8),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT c.tid, c.eid, count(*) AS i
              FROM cand c
              JOIN sh s1 ON s1.doc_id = c.tid
              JOIN sh s2 ON s2.doc_id = c.eid AND s2.sh = s1.sh
              GROUP BY 1, 2),
            ver AS (
              SELECT inter.tid, inter.eid FROM inter
              JOIN sz sa ON sa.doc_id = inter.tid
              JOIN sz sb ON sb.doc_id = inter.eid
              WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5),
            per AS (SELECT tid, count(*) AS np FROM ver GROUP BY tid)
            SELECT d.source, CAST(count(per.tid) AS BIGINT) AS n_flagged_docs,
                   CAST(coalesce(sum(per.np), 0) AS BIGINT) AS n_pairs
            FROM documents d LEFT JOIN per ON per.tid = d.doc_id
            WHERE d.source <> 'src0'
            GROUP BY 1 ORDER BY 1"""),
  )

  /** BPE-ish regex tokenizer: alnum runs as tokens (vs the whitespace
    * tokenizer in token_counts) + alpha-char mass — the usual token-budget
    * accounting pass. */
  private val tokenizeRegex = QueryDef(
    "tokenize_regex",
    (s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          size(filter(split(col("text"), "[^a-zA-Z0-9]+"), t => length(t) > 0))
            .cast("long").as("n_tokens_regex"),
          length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long")
            .as("n_alpha_chars"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
            CAST(len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'),
                                 t -> len(t) > 0)) AS BIGINT) AS n_tokens_regex,
            CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha_chars
            FROM documents ORDER BY doc_id"""),
  )

  /** X2 SimHash near-dup: 63-bit signature (per-bit majority vote over
    * md5-derived token bits, computed in a mapPartitions kernel — the SAME
    * construction as `simhash_signature`, so the two stay mutually
    * consistent), candidates from 16/16/16/15-bit band buckets (any pair
    * within hamming distance 3 shares at least one band by pigeonhole),
    * verified by bit_count(xor) ≤ 3. The width matches production simhash
    * (Manku et al., WWW'07 use 64-bit fingerprints with ~16-bit band
    * tables); 63 rather than 64 keeps the signature sum below the BIGINT
    * sign bit so DuckDB's HUGEINT sum and Spark's long sum agree exactly.
    * md5 is engine-portable, so the whole pair output is
    * oracle-recomputable; SimHashSpec additionally plants near-identical
    * docs. */
  private val simhashDedup = QueryDef(
    "simhash_dedup",
    (s, dir) => simhashPairs(docs(s, dir), maxHamming = 3),
    Some("""WITH tok AS (
              SELECT doc_id, md5(t) AS h
              FROM documents,
              LATERAL (SELECT unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS t) u
            ), bits AS (
              SELECT doc_id, b,
                     strpos('0123456789abcdef', substring(h, (b // 4) + 1, 1)) - 1 AS d
              FROM tok,
              LATERAL (SELECT unnest(generate_series(0, 62)) AS b) bb
            ), votes AS (
              SELECT doc_id, b,
                     SUM(CASE WHEN (d >> (b % 4)) % 2 = 1 THEN 1 ELSE -1 END) AS v
              FROM bits GROUP BY doc_id, b
            ), sig AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
              FROM votes GROUP BY doc_id
            ), cand AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, a.sig AS s1, b.sig AS s2
              FROM sig a JOIN sig b ON (a.sig & 65535) = (b.sig & 65535) AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id, a.sig, b.sig
              FROM sig a JOIN sig b ON ((a.sig >> 16) & 65535) = ((b.sig >> 16) & 65535) AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id, a.sig, b.sig
              FROM sig a JOIN sig b ON ((a.sig >> 32) & 65535) = ((b.sig >> 32) & 65535) AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id, a.sig, b.sig
              FROM sig a JOIN sig b ON ((a.sig >> 48) & 32767) = ((b.sig >> 48) & 32767) AND a.doc_id < b.doc_id)
            SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
            FROM cand
            WHERE bit_count(xor(s1, s2)) <= 3
            ORDER BY id1, id2"""),
  )

  /** X2 oracle-checkable SimHash signature: the same per-bit majority-vote
    * md5 construction [[simhashPairs]] uses in its JVM kernel, expressed
    * declaratively — the per-document signature table a dedup run would
    * materialize. The explode-per-bit formulation is the SQL-shaped
    * anchor; the scale path is the kernel (no per-token-per-bit row
    * explosion). */
  private val simhashSignature = QueryDef(
    "simhash_signature",
    (s, dir) => {
      val tok = docs(s, dir).select(col("doc_id"),
        explode(expr("filter(split(text, ' '), t -> length(t) > 0)")).as("tok"))
      val bits = tok
        .select(col("doc_id"), md5(col("tok")).as("h"),
          explode(expr("sequence(0, 62)")).as("b"))
        .withColumn("d",
          expr("instr('0123456789abcdef', substring(h, (b div 4) + 1, 1)) - 1"))
        .withColumn("bit", expr("shiftright(d, b % 4) % 2"))
      bits.groupBy("doc_id", "b")
        .agg(sum(when(col("bit") === 1, 1).otherwise(-1)).as("v"))
        .groupBy("doc_id")
        .agg(sum(when(col("v") > 0,
          expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(lit(0L))).as("sig"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
              SELECT doc_id, md5(t) AS h
              FROM documents,
              LATERAL (SELECT unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS t) u
            ), bits AS (
              SELECT doc_id, b,
                     strpos('0123456789abcdef', substring(h, (b // 4) + 1, 1)) - 1 AS d
              FROM tok,
              LATERAL (SELECT unnest(generate_series(0, 62)) AS b) bb
            ), votes AS (
              SELECT doc_id, b,
                     SUM(CASE WHEN (d >> (b % 4)) % 2 = 1 THEN 1 ELSE -1 END) AS v
              FROM bits GROUP BY doc_id, b
            )
            SELECT doc_id,
                   CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
            FROM votes GROUP BY doc_id ORDER BY doc_id"""),
  )

  /** Shared SimHash pipeline (also used by SimHashSpec). Signature bits come
    * from md5 hex digits — bit b of a token is bit (b%4) of hex digit b/4 of
    * md5(token) — exactly the `simhash_signature` construction, so DuckDB
    * recomputes identical signatures and the oracle hash-matches the pairs. */
  def simhashPairs(d: DataFrame, maxHamming: Int): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val sigs = d.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val votes = new Array[Int](63)
          text.split(' ').foreach { tok =>
            if (tok.nonEmpty) {
              val h = md5Hex(md, tok)
              var b = 0
              while (b < 63) {
                val d0 = Character.digit(h.charAt(b >> 2), 16)
                if (((d0 >> (b & 3)) & 1) == 1) votes(b) += 1 else votes(b) -= 1
                b += 1
              }
            }
          }
          var sig = 0L
          var b = 0
          while (b < 63) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
          (id, sig)
        }
      }.toDF("doc_id", "sig")
      // self-joined below: pin so the bit-vote kernel runs once
      .localCheckpoint()
    // 16/16/16/15-bit bands: bucket cardinality 65536 (32768 for the top
    // band), so bucket occupancy — and the candidate join's quadratic
    // term — is O(N/2^16) per band instead of the O(N/256) an 8-bit
    // banding degrades to (measured 4.8× at a 10× corpus before this)
    val bands = sigs.select(
      col("doc_id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * 16)
            .bitwiseAND(if (b == 3) 0x7fffL else 0xffffL).as("bucket"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("hamming"))
      // filter BEFORE the dedup shuffle: the hamming gate is a narrow map
      // that kills the vast majority of bucket-collision pairs, so the
      // distinct only shuffles survivors (a band-duplicate pair has the
      // same hamming both times — dedup-then-filter is equivalent)
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id1", "id2")
      .orderBy("id1", "id2")
  }

  /** PII redaction: scrub email addresses and phone-shaped numbers from
    * document text before it reaches a training set. The corpus is
    * synthetic words with no PII, so the query injects a deterministic
    * email + phone per doc first — the operator under test is the scrub
    * (ordered regexp_replace chain) and the audit columns (match counts,
    * redacted length, content hash). Narrow per-row maps, no shuffle;
    * Java and RE2 agree on this regex subset (character classes +
    * bounded repetition, no lookaround), which is what keeps the scrub
    * oracle-checkable.
    */
  private val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  private val phoneRe = "[0-9]{3}-[0-9]+"
  private val piiRedact = QueryDef(
    "pii_redact",
    (s, dir) => {
      val withPii = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-"), col("doc_id")).as("t"))
      val red = regexp_replace(
        regexp_replace(col("t"), emailRe, "[EMAIL]"), phoneRe, "[PHONE]")
      withPii.select(
        col("doc_id"),
        (size(split(col("t"), emailRe)) - 1).cast("long").as("n_emails"),
        (size(split(col("t"), phoneRe)) - 1).cast("long").as("n_phones"),
        length(red).cast("long").as("red_len"),
        md5(red).as("red_md5"))
        .orderBy("doc_id")
    },
    Some("""WITH pii AS (
              SELECT doc_id,
                     concat(text, ' contact user', doc_id, '@example.com or 555-', doc_id) AS t
              FROM documents)
            SELECT doc_id,
                   CAST(len(string_split_regex(t, '[a-z0-9]+@[a-z]+\.[a-z]+')) - 1 AS BIGINT) AS n_emails,
                   CAST(len(string_split_regex(t, '[0-9]{3}-[0-9]+')) - 1 AS BIGINT) AS n_phones,
                   CAST(length(regexp_replace(regexp_replace(t, '[a-z0-9]+@[a-z]+\.[a-z]+', '[EMAIL]', 'g'), '[0-9]{3}-[0-9]+', '[PHONE]', 'g')) AS BIGINT) AS red_len,
                   md5(regexp_replace(regexp_replace(t, '[a-z0-9]+@[a-z]+\.[a-z]+', '[EMAIL]', 'g'), '[0-9]{3}-[0-9]+', '[PHONE]', 'g')) AS red_md5
            FROM pii ORDER BY doc_id"""),
  )

  /** Top-3 word bigrams per language — the n-gram frequency profile used
    * for corpus analysis / contamination checks. Pairs are formed with a
    * narrow per-row map (no self-join), counted with one hash shuffle on
    * (lang, bigram) — partial map-side aggregation absorbs the heavy
    * duplication — and ranked with a window over the (small) per-language
    * count table. Deterministic tie-break on the bigram itself.
    */
  private val ngramTopk = QueryDef(
    "ngram_topk",
    (s, dir) => {
      val tok = docs(s, dir).select(col("lang"),
        expr("filter(split(text, ' '), t -> length(t) > 0)").as("ts"))
      // arrays_zip over shifted slices, not transform(sequence…): the
      // lambda form runs interpreted, AND Spark's sequence(1, 0) on a
      // 1-token doc yields [1, 0] (descending) where DuckDB's
      // generate_series yields empty — the zip form is empty on both
      val big = tok.select(col("lang"),
        explode(arrays_zip(
          slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
          slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))))).as("p"))
        .select(col("lang"),
          concat(col("p").getField("0"), lit(" "), col("p").getField("1")).as("bg"))
      val counted = big.groupBy("lang", "bg").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("cnt").desc, col("bg"))
      counted
        .select(col("lang"), col("bg"), col("cnt"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("lang", "rn")
    },
    Some("""WITH tok AS (
              SELECT lang, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ts
              FROM documents),
            big AS (
              SELECT lang, ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] AS bg
              FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
            c AS (SELECT lang, bg, count(*) AS cnt FROM big GROUP BY 1, 2)
            SELECT lang, bg, CAST(cnt AS BIGINT) AS cnt, rn FROM (
              SELECT lang, bg, cnt,
                     CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bg) AS BIGINT) AS rn
              FROM c)
            WHERE rn <= 3 ORDER BY lang, rn"""),
  )

  /** Stratified deterministic sampling: per-language sample rates from the
    * same md5-bucket split as `deterministic_sample` (first hex digit in
    * 0–2 ≈ 3/16), reported per stratum in ONE scan (conditional count, no
    * join against a totals table). The property that matters at 100 TB:
    * membership is a pure function of the key, so the sample is stable
    * across partitionings, retries, and engines — no RNG state to
    * coordinate, and train/eval splits never leak rows when the corpus is
    * re-sharded.
    */
  private val stratifiedSample = QueryDef(
    "stratified_sample",
    (s, dir) => {
      val bucket = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 1)
      docs(s, dir)
        .withColumn("in_sample", bucket.isin("0", "1", "2"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"))
        .select(col("lang"), col("n_total"), col("n_sampled"),
          round(col("n_sampled").cast("double") / col("n_total").cast("double"), 4)
            .as("rate"))
        .orderBy("lang")
    },
    Some("""WITH flagged AS (
              SELECT lang,
                     substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2') AS in_sample
              FROM documents)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
                   CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
                   round(CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS DOUBLE) /
                         CAST(count(*) AS DOUBLE), 4) AS rate
            FROM flagged GROUP BY lang ORDER BY lang"""),
  )

  /** X4 TF-IDF top-3 terms per document. Rational idf: instead of
    * `ln(N/df)` (a transcendental whose last ulp can differ across libm
    * builds) the weight is the scaled integer `(N * 1e6) div df` — same
    * ordering for fixed N, and exact in both engines, so the whole
    * pipeline hash-matches.
    *
    * Scale shape: tokens shuffle once into (doc, term) counts; document
    * frequency is a second partial-agg over terms (vocab-sized, far
    * smaller than the corpus); the tf⋈df join is keyed on term; top-k per
    * doc is a row_number window partitioned by doc_id — at 100 TB each
    * reducer holds one document's vocabulary, never the corpus. N arrives
    * via a broadcast 1-row cross join, keeping the query a single lazy
    * plan. */
  /** TF-IDF core shared with TfidfSpec's hand-computed fixture. */
  def tfidfTop3(d: DataFrame): DataFrame = {
    val tok = d.select(
      col("doc_id").cast("long").as("doc_id"),
      explode(expr("filter(split(text, ' '), x -> x <> '')")).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = d.select(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "term").crossJoin(n)
      .selectExpr("doc_id", "term", "tf * ((n * 1000000L) div df) AS score_scaled")
    val w = Window.partitionBy("doc_id").orderBy(desc("score_scaled"), asc("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("doc_id", "term", "score_scaled")
      .orderBy(asc("doc_id"), desc("score_scaled"), asc("term"))
  }

  private val tfidfTopk = QueryDef(
    "tfidf_topk",
    (s, dir) => tfidfTop3(docs(s, dir)),
    Some("""WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, t.term
                         FROM documents, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t(term)),
            tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
            dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            sc AS (SELECT doc_id, tf.term AS term,
                          CAST(tf * ((n * 1000000) // df) AS BIGINT) AS score_scaled
                   FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN nn),
            rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_scaled DESC, term) AS rn FROM sc)
            SELECT doc_id, term, score_scaled FROM rk WHERE rn <= 3
            ORDER BY doc_id, score_scaled DESC, term"""),
  )

  /** X1 incremental (cross-batch) dedup — the shape a rolling crawl
    * pipeline runs daily: dedup the NEW batch against the fingerprint
    * index of everything already ingested, never against the corpus text.
    * The "index" is docs with doc_id%10<8; the batch is the rest plus a
    * deterministic re-crawl slice (doc_id%25==0) that the anti-join must
    * drop.
    *
    * Scale shape: only 32-hex fingerprints shuffle — the 100 TB of
    * already-ingested text is represented by its hash index (16 bytes a
    * doc), the batch drops its text column before the join (column
    * pruning), and the anti-join + in-batch groupBy hash-partition on the
    * fingerprint. */
  private val dedupIncremental = QueryDef(
    "dedup_incremental",
    (s, dir) => {
      val fps = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), md5(col("text")).as("fp"))
      val existing = fps.filter(col("doc_id") % 10 < 8).select("fp").distinct()
      val batch = fps.filter(col("doc_id") % 10 >= 8)
        .unionAll(fps.filter(col("doc_id") % 25 === 0)) // re-crawled slice
      batch.join(existing, Seq("fp"), "left_anti")
        .groupBy("fp")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "fp", "n_copies")
        .orderBy("doc_id")
    },
    Some("""WITH fps AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS fp FROM documents),
            existing AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 < 8),
            batch AS (SELECT * FROM fps WHERE doc_id % 10 >= 8
                      UNION ALL SELECT * FROM fps WHERE doc_id % 25 = 0)
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, fp, CAST(count(*) AS BIGINT) AS n_copies
            FROM batch WHERE fp NOT IN (SELECT fp FROM existing)
            GROUP BY fp ORDER BY doc_id"""),
  )

  /** X89 incremental NEAR-dup dedup — the fuzzy complement of
    * `dedup_incremental`: screen the new crawl slice (doc_id%10 ≥ 8)
    * against the STANDING corpus (doc_id%10 < 8) with the same banded
    * MinHash construction as `minhash_dedup`, then verify candidates by
    * exact shingle-Jaccard ≥ 0.5. Output: one row per slice doc that is a
    * verified near-dup of something already ingested — its partner count,
    * first (min-id) corpus partner, and best Jaccard — the drop/audit list
    * a nightly run feeds back into the funnel.
    *
    * Scale shape: in production the corpus side joins from its STORED
    * signature index (recomputed here for self-containedness, exactly as
    * `curation_incremental` recomputes its fingerprint index). Candidates
    * come from an equi-join on (band, bucket) — the nightly slice is the
    * small side and broadcasts; the corpus side never self-joins, so the
    * cost is O(slice × occupancy), not O(corpus²). Verification joins
    * shingle arrays back for the DEDUPED candidate pairs only. */
  private val minhashIncremental = QueryDef(
    "minhash_incremental",
    (s, dir) => {
      val d = docs(s, dir)
      val sigS = minhashSignatures(d.filter(col("doc_id") % 10 >= 8), bands = 4, rowsPerBand = 2)
      val sigC = minhashSignatures(d.filter(col("doc_id") % 10 < 8), bands = 4, rowsPerBand = 2)
      val bS = sigS.select(col("doc_id").as("slice_id"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
      val bC = sigC.select(col("doc_id").as("corpus_id"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
      val cand = bS.join(bC, Seq("band", "bucket"))
        .select("slice_id", "corpus_id").dropDuplicates("slice_id", "corpus_id")
      val shS = sigS.select(col("doc_id").as("slice_id"), col("shingles").as("sh1"))
      val shC = sigC.select(col("doc_id").as("corpus_id"), col("shingles").as("sh2"))
      cand
        .join(shS, Seq("slice_id"))
        .join(shC, Seq("corpus_id"))
        .withColumn("jaccard",
          round(
            size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
              size(array_union(col("sh1"), col("sh2"))).cast("double"), 4))
        .filter(col("jaccard") >= 0.5)
        .groupBy("slice_id")
        .agg(
          count(lit(1)).as("n_dups"),
          min(col("corpus_id")).as("first_dup"),
          max(col("jaccard")).as("max_jaccard"))
        .orderBy("slice_id")
    },
    Some("""WITH ts AS (
              SELECT doc_id, text,
                     list_filter(string_split(text, ' '), t -> len(t) > 0) AS ts
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN len(ts) >= 3
                          THEN ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' ' || ts[CAST(i AS INT) + 2]
                          ELSE text END AS sh
              FROM ts, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 1))) AS i) g),
            sig AS (
              SELECT doc_id,
                     min(md5('1:' || sh)) AS h1, min(md5('2:' || sh)) AS h2,
                     min(md5('3:' || sh)) AS h3, min(md5('4:' || sh)) AS h4,
                     min(md5('5:' || sh)) AS h5, min(md5('6:' || sh)) AS h6,
                     min(md5('7:' || sh)) AS h7, min(md5('8:' || sh)) AS h8
              FROM sh GROUP BY doc_id),
            s AS (SELECT * FROM sig WHERE doc_id % 10 >= 8),
            c AS (SELECT * FROM sig WHERE doc_id % 10 < 8),
            cand AS (
              SELECT s.doc_id AS slice_id, c.doc_id AS corpus_id
              FROM s JOIN c ON s.h1 = c.h1 AND s.h2 = c.h2
              UNION
              SELECT s.doc_id, c.doc_id FROM s JOIN c ON s.h3 = c.h3 AND s.h4 = c.h4
              UNION
              SELECT s.doc_id, c.doc_id FROM s JOIN c ON s.h5 = c.h5 AND s.h6 = c.h6
              UNION
              SELECT s.doc_id, c.doc_id FROM s JOIN c ON s.h7 = c.h7 AND s.h8 = c.h8),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT cand.slice_id, cand.corpus_id, count(*) AS i
              FROM cand
              JOIN sh s1 ON s1.doc_id = cand.slice_id
              JOIN sh s2 ON s2.doc_id = cand.corpus_id AND s2.sh = s1.sh
              GROUP BY 1, 2),
            ver AS (
              SELECT inter.slice_id, inter.corpus_id,
                     round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 4) AS jaccard
              FROM inter
              JOIN sz sa ON sa.doc_id = inter.slice_id
              JOIN sz sb ON sb.doc_id = inter.corpus_id
              WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5)
            SELECT CAST(slice_id AS BIGINT) AS slice_id,
                   CAST(count(*) AS BIGINT) AS n_dups,
                   CAST(min(corpus_id) AS BIGINT) AS first_dup,
                   max(jaccard) AS max_jaccard
            FROM ver GROUP BY slice_id ORDER BY slice_id"""),
  )

  /** X41 inverted index — term → capped posting list, the retrieval-side
    * data structure a corpus search/decontamination service builds from
    * the same token stream as TF-IDF.
    *
    * Scale shape: the corpus-sized (term, doc) stream crosses the network
    * ONCE (the distinct + df + capped-postings aggregations all hash on
    * `term`); the posting list is capped to the first 16 doc_ids per term
    * by a window row_number, so a stopword-grade hot term holds O(cap)
    * reducer state instead of O(corpus) — the full-posting variant would
    * be a straight `collect_list` with the same plan. df is still exact
    * over the uncapped stream. */
  private val invertedIndex = QueryDef(
    "inverted_index",
    (s, dir) => {
      val tok = docs(s, dir).select(
          col("doc_id").cast("long").as("doc_id"),
          explode(expr("filter(split(text, ' '), x -> x <> '')")).as("term"))
        .distinct()
      val w = Window.partitionBy("term").orderBy("doc_id")
      tok.withColumn("rn", row_number().over(w))
        .groupBy("term")
        .agg(
          count(lit(1)).as("df"),
          expr("array_join(transform(array_sort(collect_list(CASE WHEN rn <= 16 THEN doc_id END)), x -> cast(x AS STRING)), ',')")
            .as("postings"))
        .orderBy("term")
    },
    Some("""WITH tok AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, t.term
                         FROM documents, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t(term)),
            rk AS (SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM tok)
            SELECT term, CAST(count(*) AS BIGINT) AS df,
                   string_agg(CASE WHEN rn <= 16 THEN CAST(doc_id AS VARCHAR) END, ',' ORDER BY doc_id) AS postings
            FROM rk GROUP BY term ORDER BY term"""),
  )

  /** X42 BM25 ranking (rational-arithmetic variant) — top-15 documents for
    * the query {spark, join, vector} with k1 = 1.2, b = 0.75. The float
    * idf `ln(N/df)` is replaced by the rational Robertson idf
    * (2N−2df+1)/(2df+1) — the same monotone ordering for a fixed corpus —
    * and every term of the classic formula is cleared of denominators:
    *
    *   score ∝ (2N−2df+1)·88·tf·T  /  (2df+1)·(40·tf·T + 12·T + 36·dl·N)
    *
    * (T = total tokens, dl = doc length; 88/40/12/36 absorb k1 and b), so
    * the whole computation is BIGINT multiply/divide — bit-identical in
    * any engine and any aggregation order. The ×10000 display scale NEVER
    * multiplies the full numerator: the scaled quotient is computed by
    * exact base-100 long division — q·10000 + q₁·100 + q₂ with
    * q = P div D, q₁ = (P mod D)·100 div D, q₂ = ((P mod D)·100 mod D)·100
    * div D — identical value to (P·10000) div D, so the widest products
    * are P itself (~2·10^14 at sf1) and (P mod D)·100 < D·100: ~400×
    * int64 headroom where the naive P·10000 had only ~4×. Under Spark 4
    * ANSI (and DuckDB) a corpus large enough to exhaust even that errors
    * loudly rather than corrupting — the cliff is explicit and 100× farther.
    *
    * Scale shape: the query-term filter lands BEFORE the tf groupBy, so
    * only matching (doc, term) pairs shuffle — O(docs·|query|), not
    * O(tokens) — and the doc length rides the tf aggregation (max of a
    * per-doc constant) instead of joining a second docs-sized table back
    * on doc_id; df and the corpus totals are broadcast-sized; final top-k
    * is TakeOrdered, no global sort. */
  private val bm25Topk = QueryDef(
    "bm25_topk",
    (s, dir) => {
      val d = docs(s, dir)
      val qt = Seq("spark", "join", "vector")
      val base = d.select(
        col("doc_id").cast("long").as("doc_id"),
        expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
        .select(col("doc_id"), expr("cast(size(toks) AS BIGINT)").as("dl"),
          expr(s"filter(toks, x -> x IN (${qt.map("'" + _ + "'").mkString(", ")}))").as("qtoks"))
      val totals = base.agg(count(lit(1)).as("n"), sum("dl").as("t"))
      val tf = base.select(col("doc_id"), col("dl"), explode(col("qtoks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"), max("dl").as("dl"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(totals))
        .selectExpr("doc_id",
          "(2*n - 2*df + 1) * 88 * tf * t AS p",
          "(2*df + 1) * (40*tf*t + 12*t + 36*dl*n) AS d")
        // (p*10000) div d without p*10000 ever materializing: exact
        // base-100 long division (p, d > 0 so % is a true remainder)
        .selectExpr("doc_id",
          "(p div d) * 10000 + (((p % d) * 100) div d) * 100 + ((((p % d) * 100) % d) * 100) div d AS s")
        .groupBy("doc_id").agg(sum("s").as("score_scaled"))
        .orderBy(desc("score_scaled"), asc("doc_id"))
        .limit(15)
    },
    Some("""WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, t.term
                         FROM documents, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t(term)),
            dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl),
            tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
                   WHERE term IN ('spark', 'join', 'vector') GROUP BY 1, 2),
            dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
            pd AS (SELECT tf.doc_id AS doc_id,
                          (2*n - 2*df + 1) * 88 * tf * t AS p,
                          (2*df + 1) * (40*tf*t + 12*t + 36*dl*n) AS d
                   FROM tf JOIN dfreq ON tf.term = dfreq.term JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN tot)
            SELECT doc_id,
                   CAST(sum((p // d) * 10000 + (((p % d) * 100) // d) * 100 + ((((p % d) * 100) % d) * 100) // d) AS BIGINT) AS score_scaled
            FROM pd
            GROUP BY 1 ORDER BY score_scaled DESC, doc_id LIMIT 15"""),
  )

  /** X43 quality classifier — a fasttext-shaped linear model over cheap
    * integer text features (stopword rate, mean word length), scoring and
    * thresholding every document in one narrow pass. Weights are fixed
    * integers and every feature is a scaled-integer ratio (`div`), so the
    * decision boundary is bit-identical on any engine — the shape of a
    * learned quality filter with the learned weights frozen in.
    *
    * Scale: zero shuffle — pure per-row projection; at 100 TB this is the
    * classic first-pass corpus filter that runs fused into the scan. */
  private val qualityClassifier = QueryDef(
    "quality_classifier",
    (s, dir) =>
      docs(s, dir)
        .selectExpr(
          "cast(doc_id AS BIGINT) AS doc_id",
          "cast(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT) AS nw",
          "cast(size(filter(split(text, ' '), x -> x = 'a' OR x = 'the')) AS BIGINT) AS stop",
          "cast(length(replace(text, ' ', '')) AS BIGINT) AS letters")
        // empty/all-space docs (nw = 0) are routine in a first-pass corpus
        // filter: ratios degrade to 0 instead of an ANSI div-0 abort, which
        // drives the score to -500 → keep = false (rejected, as it should be)
        .selectExpr("doc_id",
          "CASE WHEN nw > 0 THEN (stop * 1000) div nw ELSE 0 END AS stop_rate_scaled",
          "CASE WHEN nw > 0 THEN (letters * 1000) div nw ELSE 0 END AS wlen_scaled")
        .selectExpr("doc_id", "stop_rate_scaled",
          "500 + 2 * stop_rate_scaled - abs(wlen_scaled - 4000) div 4 AS score_scaled")
        .withColumn("keep", col("score_scaled") >= 400L)
        .orderBy("doc_id"),
    Some("""WITH f AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS nw,
                   CAST(len(list_filter(string_split(text, ' '), x -> x = 'a' OR x = 'the')) AS BIGINT) AS stop,
                   CAST(length(replace(text, ' ', '')) AS BIGINT) AS letters
            FROM documents),
            r AS (SELECT doc_id,
                   CASE WHEN nw > 0 THEN (stop * 1000) // nw ELSE 0 END AS stop_rate_scaled,
                   CASE WHEN nw > 0 THEN (letters * 1000) // nw ELSE 0 END AS wlen_scaled
            FROM f)
            SELECT doc_id, stop_rate_scaled,
                   500 + 2 * stop_rate_scaled - abs(wlen_scaled - 4000) // 4 AS score_scaled,
                   500 + 2 * stop_rate_scaled - abs(wlen_scaled - 4000) // 4 >= 400 AS keep
            FROM r ORDER BY doc_id"""),
  )

  /** X49 text normalization — the fix-text pass every curation pipeline
    * runs BEFORE fingerprinting/shingling (visually-identical strings with
    * different codepoint sequences must dedup identically): Unicode NFC
    * (native codegen'd [[graft.functions.NfcNormalize]] — the JDK and
    * DuckDB's utf8proc implement the same UAX #15 algorithm), control-char
    * strip, whitespace collapse, trim. The fixture text is ASCII (already
    * NFC), so each doc is wrapped in a deterministic denormalized frame —
    * a combining-acute `Cafe´` prefix, a TAB, trailing double spaces —
    * and the md5 of the cleaned result proves BYTE-IDENTICAL normalization
    * across engines (composition e+U+0301→é actually exercised, visible in
    * n_composed = chars removed by NFC). Zero shuffle: one narrow
    * codegen'd map, ordered by key. */
  private val textNormalize = QueryDef(
    "text_normalize",
    (s, dir) => {
      graft.functions.NfcNormalize.register(s)
      val dirty = concat(lit("Café\t"), col("text"), lit("  fin  "))
      val nfc = graft.functions.NfcNormalize.nfcNormalize(dirty)
      val clean = trim(regexp_replace(
        regexp_replace(nfc, "[\\x00-\\x1f]", ""), " +", " "))
      docs(s, dir)
        .select(col("doc_id"),
          (length(dirty) - length(nfc)).cast("long").as("n_composed"),
          length(clean).cast("long").as("clean_len"),
          md5(clean).as("clean_md5"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
                   'Cafe' || chr(769) || chr(9) || text || '  fin  ' AS dirty
                 FROM documents),
            n AS (SELECT doc_id, dirty, nfc_normalize(dirty) AS nfc FROM d),
            c AS (SELECT doc_id, dirty, nfc,
                   trim(regexp_replace(regexp_replace(nfc, '[\x00-\x1f]', '', 'g'),
                        ' +', ' ', 'g')) AS clean
                 FROM n)
            SELECT doc_id,
                   CAST(length(dirty) - length(nfc) AS BIGINT) AS n_composed,
                   CAST(length(clean) AS BIGINT) AS clean_len,
                   md5(clean) AS clean_md5
            FROM c ORDER BY doc_id"""),
  )

  /** X51 BPE merge learning — the actual tokenizer-training loop (Sennrich
    * et al. 2016), not just a tokenizer: tokenize the corpus ONCE into a
    * word-frequency table, then iterate on that vocab-sized state — count
    * adjacent symbol pairs weighted by word frequency, merge the most
    * frequent pair everywhere (tie → lexicographically smallest), repeat.
    * Five chained merge rounds, each fully integer + binary-string-ordered,
    * hash-match a chained-CTE DuckDB oracle (the `pagerank_topk` anchor
    * trick applied to an iterative string algorithm).
    *
    * Words are spaced-symbol strings (` c o l u m n `); a merge is 3
    * passes of space-delimited `replace` (merged tokens lose their inner
    * space so they can't re-match). The replace rule equals classic
    * leftmost non-overlapping merging EXCEPT on a run of ≥5 identical
    * symbols forming a self-pair, where the scan consumes the separator
    * and picks a different (still deterministic, cross-engine-identical —
    * the oracle runs the same passes) pairing. BpeSpec asserts the
    * fixture vocabulary contains no such run and pins the result to the
    * classic Sennrich trainer on it.
    *
    * Scale shape: the 100 TB corpus is read once (word freq groupBy —
    * the only corpus-sized shuffle); every iteration then touches only the
    * vocab table (~millions of rows at web scale), checkpointed once, with
    * a pair-count shuffle of vocab size and a single-row argmax to the
    * driver. That is exactly how production BPE trainers scale. */
  /** The shared BPE learning loop: returns the 5 learned merges and the
    * final vocab table (word, f, s) with `s` the merged spaced-symbol
    * form. `bpe_merges` reports the former; `bpe_encode` applies the
    * latter back to the corpus. */
  /** The learned tokenizer, trained ONCE per (session, sf-dir, rounds) and
    * read by all three consumers — `bpe_merges` (the merge list),
    * `bpe_encode` (per-language compression) and `tokenizer_fertility`
    * (per-source audit). A production pipeline trains the tokenizer once
    * and every downstream audit loads the trained artifact; re-running the
    * 5-round train loop (a corpus scan + 5 × (pair-count shuffle + argmax
    * round trip)) per consumer tripled the family's cost for byte-identical
    * results. Memoized value: the merges plus the localCheckpoint'd final
    * vocab (the train loop checkpoints it anyway). Cleared per bench pass
    * by [[resetSessionMemo]] — same honesty contract as the dedup closure:
    * the first consumer in each pass pays the real training cost. */
  private val bpeMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), (Seq[(Long, String, String, Long)], DataFrame)]()
  private[graft] def learnBpeMemo(s: SparkSession, dir: String, rounds: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) =
    bpeMemo.computeIfAbsent((s, dir, rounds),
      kv => { val r = learnBpe(docs(kv._1, kv._2), kv._3); (r._1, r._2.localCheckpoint()) })

  private[graft] def learnBpe(d: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    val s = d.sparkSession
    import s.implicits._
    val wf = d
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("f"))
    // vocab-sized; checkpoint cuts the corpus scan out of the iteration.
    // The vocab row count rides the materialization as an Observation —
    // it sizes the LOOP's shuffles below without a separate count job.
    val obs0 = org.apache.spark.sql.Observation(
      s"bpe0-${java.util.UUID.randomUUID()}")
    var cur = wf.select(col("word"), col("f"),
      concat(lit(" "), array_join(split(col("word"), ""), " "), lit(" ")).as("s"))
      .observe(obs0, count(lit(1)).as("n"))
      .localCheckpoint()
    val vocabRows = observedLong(obs0, "n").getOrElse(cur.count())
    // Size the loop's shuffles from the vocab (the per-round pair-count
    // shuffle is ~avg-word-length rows per vocab row, narrow strings),
    // and drop AQE in the tiny one-partition regime — the same treatment
    // as connectedComponents: per-exchange AQE jobs and 32-wide
    // near-empty shuffles are the round's dominant cost at bench scale,
    // while a web-scale vocab (millions of rows) keeps many partitions
    // and keeps AQE. The corpus-sized word-frequency shuffle above ran
    // BEFORE this scope at full session width; the loop itself runs in an
    // isolated CHILD session (LoopSession scaladoc), so the caller's conf
    // is never mutated. Results are partitioning-independent (exact
    // integer counts, lexicographic tie-break).
    val pairRows = vocabRows * 8L
    val loopS = LoopSession.forRows(s, pairRows)
    cur = LoopSession.adopt(cur, loopS)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (r <- 1 to rounds) {
      val tk = cur.select(col("f"), split(trim(col("s")), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
      val top = tk.select(col("f"), explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS a, toks[i] AS b))"))
          .as("p"))
        .select(col("f"), col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(sum("f").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).as[(String, String, Long)].head()
      val (a, b, cnt) = top
      merges += ((r.toLong, a, b, cnt))
      val pat = s" $a $b "
      val rep = s" $a$b "
      def r1(c: org.apache.spark.sql.Column) = replace(c, lit(pat), lit(rep))
      // per-round checkpoint: round r's pair count otherwise replays
      // r−1 chained replaces and replans an ever-deeper tree (vocab-
      // sized materialization, constant per-round planning instead)
      cur = cur.withColumn("s", r1(r1(r1(col("s"))))).localCheckpoint()
    }
    // cur is localCheckpoint'd — re-rooting back into the caller's session
    // is free and keeps bpe_encode/tokenizer_fertility single-session
    (merges.toSeq, LoopSession.adopt(cur, s))
  }

  private val bpeMerges = QueryDef(
    "bpe_merges",
    (s, dir) => {
      import s.implicits._
      val merges = learnBpeMemo(s, dir, 5)._1
      s.createDataset(merges).toDF("rank", "lhs", "rhs", "pair_count")
        .orderBy("rank")
    },
    Some {
      def iter(i: Int): String = {
        val prev = s"w${i - 1}"
        s"""t$i AS (SELECT f, string_split(trim(s), ' ') AS toks FROM $prev
                    WHERE len(string_split(trim(s), ' ')) >= 2),
            p$i AS (SELECT f, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p FROM t$i),
            m$i AS (SELECT p[1] AS a, p[2] AS b, CAST(sum(f) AS BIGINT) AS cnt
                    FROM p$i GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1),
            w$i AS (SELECT f, replace(replace(replace(s,
                      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
                      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
                      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS s
                    FROM $prev, m$i),"""
      }
      s"""WITH wf AS (SELECT word, CAST(count(*) AS BIGINT) AS f
             FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             WHERE word <> '' GROUP BY word),
          w0 AS (SELECT f, ' ' || array_to_string(string_split_regex(word, ''), ' ') || ' ' AS s
             FROM wf),
          ${iter(1)}
          ${iter(2)}
          ${iter(3)}
          ${iter(4)}
          ${iter(5)}
          fin AS (SELECT 1 AS rank, a AS lhs, b AS rhs, cnt FROM m1
                  UNION ALL SELECT 2, a, b, cnt FROM m2
                  UNION ALL SELECT 3, a, b, cnt FROM m3
                  UNION ALL SELECT 4, a, b, cnt FROM m4
                  UNION ALL SELECT 5, a, b, cnt FROM m5)
          SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, cnt AS pair_count
          FROM fin ORDER BY rank"""
    },
  )

  /** X56 BPE ENCODING with the learned vocab — the apply side of
    * [[learnBpe]]: tokenize the corpus under the 5-merge tokenizer and
    * report per-language compression (chars per BPE token ×100, floor).
    * Application is a VOCAB JOIN, not a re-merge: every corpus word's
    * final symbol split was already computed during training, so encoding
    * is `per-(lang, word) counts ⋈ vocab` — the corpus partial-aggregates
    * straight to (lang, word) multiplicities (vocabulary-bounded — the
    * per-doc granularity an earlier draft shuffled adds nothing the final
    * per-lang sums need), the vocab (already merged, web-scale ~millions
    * of rows) joins by word, and token totals aggregate out. OOV words
    * would replay the merge list (none exist here: the vocab was trained
    * on this corpus). That lookup-shaped apply is exactly how production
    * tokenizers run at scale. */
  private val bpeEncode = QueryDef(
    "bpe_encode",
    (s, dir) => {
      val vocab = learnBpeMemo(s, dir, 5)._2
        .select(col("word"),
          size(split(trim(col("s")), " ")).cast("long").as("n_sub"))
      val perLangWord = docs(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("lang", "word").agg(count(lit(1)).as("n"))
      perLangWord.join(vocab, "word")
        .groupBy("lang")
        .agg(sum(col("n")).as("n_words"),
          sum(col("n") * col("n_sub")).as("n_bpe_tokens"),
          sum(col("n") * length(col("word")).cast("long")).as("n_chars"))
        .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
          expr("n_chars * 100 div n_bpe_tokens").as("chars_per_token_x100"))
        .orderBy("lang")
    },
    Some {
      def iter(i: Int): String = {
        val prev = s"v${i - 1}"
        s"""t$i AS (SELECT f, string_split(trim(s), ' ') AS toks FROM $prev
                    WHERE len(string_split(trim(s), ' ')) >= 2),
            p$i AS (SELECT f, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p FROM t$i),
            m$i AS (SELECT p[1] AS a, p[2] AS b FROM p$i GROUP BY 1, 2
                    ORDER BY CAST(sum(f) AS BIGINT) DESC, a, b LIMIT 1),
            v$i AS (SELECT word, f, replace(replace(replace(s,
                      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
                      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
                      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS s
                    FROM $prev, m$i),"""
      }
      s"""WITH wf AS (SELECT word, CAST(count(*) AS BIGINT) AS f
             FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             WHERE word <> '' GROUP BY word),
          v0 AS (SELECT word, f, ' ' || array_to_string(string_split_regex(word, ''), ' ') || ' ' AS s
             FROM wf),
          ${iter(1)}
          ${iter(2)}
          ${iter(3)}
          ${iter(4)}
          ${iter(5)}
          vocab AS (SELECT word, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_sub FROM v5),
          pdw AS (SELECT doc_id, lang, word, CAST(count(*) AS BIGINT) AS n
                  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents)
                  WHERE word <> '' GROUP BY 1, 2, 3)
          SELECT lang,
                 CAST(sum(n) AS BIGINT) AS n_words,
                 CAST(sum(n * n_sub) AS BIGINT) AS n_bpe_tokens,
                 CAST(sum(n * length(word)) * 100 // sum(n * n_sub) AS BIGINT) AS chars_per_token_x100
          FROM pdw JOIN vocab USING (word)
          GROUP BY lang ORDER BY lang"""
    },
  )

  /** X93 tokenizer fertility audit — the per-SOURCE tokenizer-health
    * diagnostic (Rust et al. 2021): fertility (BPE tokens emitted per
    * whitespace word, ×100 floor) and continuation rate (fraction of word
    * occurrences the tokenizer splits into >1 subword, ×10000 floor). A
    * source whose fertility runs hot relative to the corpus is one the
    * tokenizer models poorly — it pays more sequence length per word —
    * and that's a MIXING input, which is why the audit is per source
    * while `bpe_encode` reports per-language compression. Both metrics
    * are exact integer floors, so the cross-engine hashes are bit-stable.
    *
    * Scale shape: identical to `bpe_encode`'s lookup-shaped apply — the
    * corpus partial-aggregates straight to (source, word) multiplicities
    * (vocabulary-bounded per source), joins the already-merged vocab by
    * word, and aggregates out; the only corpus-sized pass is the word
    * count scan that training itself already makes. */
  private val tokenizerFertility = QueryDef(
    "tokenizer_fertility",
    (s, dir) => {
      val vocab = learnBpeMemo(s, dir, 5)._2
        .select(col("word"),
          size(split(trim(col("s")), " ")).cast("long").as("n_sub"))
      val perSrcWord = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("source", "word").agg(count(lit(1)).as("n"))
      perSrcWord.join(vocab, "word")
        .groupBy("source")
        .agg(sum(col("n")).as("n_words"),
          sum(col("n") * col("n_sub")).as("n_bpe_tokens"),
          sum(when(col("n_sub") > 1L, col("n")).otherwise(0L)).as("n_split"))
        .select(col("source"), col("n_words"), col("n_bpe_tokens"),
          expr("n_bpe_tokens * 100 div n_words").as("fertility_x100"),
          expr("n_split * 10000 div n_words").as("split_rate_x10000"))
        .orderBy("source")
    },
    Some {
      def iter(i: Int): String = {
        val prev = s"v${i - 1}"
        s"""t$i AS (SELECT f, string_split(trim(s), ' ') AS toks FROM $prev
                    WHERE len(string_split(trim(s), ' ')) >= 2),
            p$i AS (SELECT f, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p FROM t$i),
            m$i AS (SELECT p[1] AS a, p[2] AS b FROM p$i GROUP BY 1, 2
                    ORDER BY CAST(sum(f) AS BIGINT) DESC, a, b LIMIT 1),
            v$i AS (SELECT word, f, replace(replace(replace(s,
                      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
                      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
                      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS s
                    FROM $prev, m$i),"""
      }
      s"""WITH wf AS (SELECT word, CAST(count(*) AS BIGINT) AS f
             FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             WHERE word <> '' GROUP BY word),
          v0 AS (SELECT word, f, ' ' || array_to_string(string_split_regex(word, ''), ' ') || ' ' AS s
             FROM wf),
          ${iter(1)}
          ${iter(2)}
          ${iter(3)}
          ${iter(4)}
          ${iter(5)}
          vocab AS (SELECT word, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_sub FROM v5),
          psw AS (SELECT source, word, CAST(count(*) AS BIGINT) AS n
                  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
                  WHERE word <> '' GROUP BY 1, 2)
          SELECT source,
                 CAST(sum(n) AS BIGINT) AS n_words,
                 CAST(sum(n * n_sub) AS BIGINT) AS n_bpe_tokens,
                 CAST(sum(n * n_sub) * 100 // sum(n) AS BIGINT) AS fertility_x100,
                 CAST(sum(CASE WHEN n_sub > 1 THEN n ELSE 0 END) * 10000 // sum(n) AS BIGINT)
                   AS split_rate_x10000
          FROM psw JOIN vocab USING (word)
          GROUP BY source ORDER BY source"""
    },
  )

  /** X52 URL parsing + domain blocklist — the C4/Gopher-style provenance
    * filter: every crawl pipeline drops documents by registrable domain
    * before any content-level work (cheapest filter first). Deterministic
    * URLs are synthesized from doc metadata (`https://www.<source>.example
    * .com/<lang>/<doc_id>?ref=<doc_id mod 7>`), parsed back with one
    * regexp per field (host, registrable domain = host minus the `www.`
    * label, path depth, query flag), filtered by a BROADCAST blocklist
    * anti-join (the 100 TB corpus side never shuffles — PlanSpec-style
    * shape shared with decontaminate_ngrams), then aggregated per domain.
    * Regexes are RE2-safe (no lookaround), so DuckDB recomputes every
    * field byte-identically. */
  private val urlHostStats = QueryDef(
    "url_host_stats",
    (s, dir) => {
      val blocked = s.createDataFrame(Seq(Tuple1("src3"), Tuple1("src7"), Tuple1("src11")))
        .toDF("blocked_src")
      val withUrl = docs(s, dir).withColumn("url",
        concat(lit("https://www."), col("source"), lit(".example.com/"),
          col("lang"), lit("/"), col("doc_id").cast("string"),
          lit("?ref="), (col("doc_id") % 7).cast("string")))
      withUrl
        .withColumn("host", regexp_extract(col("url"), "://([^/]+)/", 1))
        .withColumn("domain", regexp_replace(col("host"), "^www\\.", ""))
        .withColumn("src_label", regexp_extract(col("domain"), "^([^.]+)\\.", 1))
        .join(broadcast(blocked), col("src_label") === col("blocked_src"), "left_anti")
        .withColumn("path_depth",
          (size(split(regexp_extract(col("url"), "://[^/]+(/[^?]*)", 1), "/")) - 1).cast("long"))
        .withColumn("has_query", (instr(col("url"), "?") > 0).cast("long"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
          max("path_depth").as("max_depth"), sum("has_query").as("n_query"))
        .orderBy("domain")
    },
    Some("""WITH u AS (SELECT doc_id, n_chars,
                   'https://www.' || source || '.example.com/' || lang || '/' ||
                   CAST(doc_id AS VARCHAR) || '?ref=' || CAST(doc_id % 7 AS VARCHAR) AS url
                 FROM documents),
            p AS (SELECT doc_id, n_chars, url,
                   regexp_extract(url, '://([^/]+)/', 1) AS host
                 FROM u),
            d AS (SELECT doc_id, n_chars, url,
                   regexp_replace(host, '^www\.', '') AS domain
                 FROM p),
            f AS (SELECT * FROM d
                  WHERE regexp_extract(domain, '^([^.]+)\.', 1)
                        NOT IN ('src3', 'src7', 'src11'))
            SELECT domain,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(max(len(string_split(regexp_extract(url, '://[^/]+(/[^?]*)', 1), '/')) - 1) AS BIGINT) AS max_depth,
                   CAST(sum(CASE WHEN instr(url, '?') > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_query
            FROM f GROUP BY domain ORDER BY domain"""),
  )

  /** X68 temperature-based mixture weights — the domain-mixing decision
    * every multi-source training run makes: per-source sampling weight
    * ∝ mass^α with temperature α = 1/2 (UNIMAX/mT5-style up-weighting of
    * small domains), on character mass (the token-count proxy available
    * without tokenizing). weight = isqrt(n_chars·10^4) ≈ √n_chars·100,
    * computed EXACTLY in integers: the float `sqrt` seed is corrected to
    * the true integer floor with two CASE steps (the double seed is
    * within ±1 of the floor for any argument < 2^53, and n_chars·10^4
    * stays inside int64 up to ~9·10^14 chars per source — beyond that the
    * scale constant drops, not the algorithm). Both engines apply the
    * same correction, so weights and the ppm shares they induce are
    * bit-identical — no float sqrt crosses the hash.
    *
    * Scale: one partial-aggregated groupBy over the corpus (|sources|
    * rows out), then a broadcast of the 1-row total — the 100 TB side is
    * scanned once and shuffles only per-source partials. */
  private val mixtureWeights = QueryDef(
    "mixture_weights",
    (s, dir) => {
      val m = docs(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("n_chars"))
        .withColumn("s0", expr("cast(floor(sqrt(cast(n_chars * 10000 AS DOUBLE))) AS BIGINT)"))
        .withColumn("weight_scaled", expr(
          """CASE WHEN (s0+1)*(s0+1) <= n_chars*10000 THEN s0+1
                  WHEN s0*s0 > n_chars*10000 THEN s0-1
                  ELSE s0 END"""))
        .drop("s0")
      val tot = m.agg(sum("weight_scaled").as("tot"))
      m.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_chars"), col("weight_scaled"),
          expr("weight_scaled * 1000000 div tot").as("share_ppm"))
        .orderBy("source")
    },
    Some("""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars
            FROM documents GROUP BY 1),
            w AS (SELECT *, CAST(floor(sqrt(CAST(n_chars * 10000 AS DOUBLE))) AS BIGINT) AS s0 FROM s),
            w2 AS (SELECT source, n_docs, n_chars,
                   CASE WHEN (s0+1)*(s0+1) <= n_chars*10000 THEN s0+1
                        WHEN s0*s0 > n_chars*10000 THEN s0-1
                        ELSE s0 END AS weight_scaled FROM w),
            t AS (SELECT CAST(sum(weight_scaled) AS BIGINT) AS tot FROM w2)
            SELECT source, n_docs, n_chars, weight_scaled,
                   CAST(weight_scaled * 1000000 // tot AS BIGINT) AS share_ppm
            FROM w2, t ORDER BY source"""),
  )

  /** X72 quality-weighted sampling — importance sampling by model score
    * (the DCLM-style selection step): each document's keep probability is
    * its `quality_classifier` score clamped to [0, 1000]‰, and the keep
    * DECISION is exact and reshard-stable — keep iff the first 8 md5 hex
    * digits of the doc id (a uniform 32-bit draw both engines compute
    * identically) compare below the score mapped to the same hex width
    * (u < p ⟺ hex(u) <LEX hex(p·⌊2³²/1000⌋), equal-length hex strings
    * order like the integers they encode — no float RNG anywhere). A
    * p = 1000 doc is kept up to the ⌊2³²/1000⌋ rounding sliver (~7·10⁻⁸),
    * documented rather than special-cased. Emits per-source kept counts
    * next to the exact expected mass Σp, so sampling bias is auditable.
    *
    * Scale: one narrow scan (score + hash are per-row projections) into a
    * per-source partial aggregate — the decision needs no global state,
    * so resharding, retries, or incremental reruns keep identical docs. */
  private val qualityWeightedSample = QueryDef(
    "quality_weighted_sample",
    (s, dir) =>
      docs(s, dir)
        .selectExpr("cast(doc_id AS BIGINT) AS doc_id", "source",
          "cast(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT) AS nw",
          "cast(size(filter(split(text, ' '), x -> x = 'a' OR x = 'the')) AS BIGINT) AS stop",
          "cast(length(replace(text, ' ', '')) AS BIGINT) AS letters")
        .selectExpr("doc_id", "source",
          "CASE WHEN nw > 0 THEN (stop * 1000) div nw ELSE 0 END AS srs",
          "CASE WHEN nw > 0 THEN (letters * 1000) div nw ELSE 0 END AS wls")
        .selectExpr("doc_id", "source",
          "greatest(0L, least(1000L, 500 + 2 * srs - abs(wls - 4000) div 4)) AS p_scaled")
        .selectExpr("doc_id", "source", "p_scaled",
          """CASE WHEN substring(md5(cast(doc_id AS STRING)), 1, 8)
                       < lower(lpad(hex(p_scaled * 4294967), 8, '0'))
                  THEN 1L ELSE 0L END AS keep""")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_kept"),
          sum("p_scaled").as("expected_scaled"))
        .orderBy("source"),
    Some("""WITH f AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                   CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS nw,
                   CAST(len(list_filter(string_split(text, ' '), x -> x = 'a' OR x = 'the')) AS BIGINT) AS stop,
                   CAST(length(replace(text, ' ', '')) AS BIGINT) AS letters
            FROM documents),
            r AS (SELECT doc_id, source,
                   CASE WHEN nw > 0 THEN (stop * 1000) // nw ELSE 0 END AS srs,
                   CASE WHEN nw > 0 THEN (letters * 1000) // nw ELSE 0 END AS wls FROM f),
            sc AS (SELECT doc_id, source,
                   greatest(0, least(1000, 500 + 2 * srs - abs(wls - 4000) // 4)) AS p_scaled FROM r),
            k AS (SELECT doc_id, source, p_scaled,
                   CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             < lower(printf('%08x', CAST(p_scaled * 4294967 AS BIGINT)))
                        THEN 1 ELSE 0 END AS keep FROM sc)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(keep) AS BIGINT) AS n_kept,
                   CAST(sum(p_scaled) AS BIGINT) AS expected_scaled
            FROM k GROUP BY 1 ORDER BY 1"""),
  )

  /** Gopher-style multi-rule quality filter (Rae et al. 2021, §A.1.1 —
    * public paper; thresholds adapted to the synthetic fixture): word-count
    * bounds, mean-word-length bounds, minimum stopword evidence, and a
    * max-single-token-repetition cap, each surfaced as its own flag so a
    * curation run can audit WHICH rule rejected a doc. All rules are
    * integer comparisons (mean length as `3·nw ≤ letters ≤ 10·nw`, the
    * repetition cap as `max_tok·5 ≤ nw`) — engine-exact, no float drift.
    *
    * Scale shape: one narrow codegen'd map, zero shuffle. The max
    * token multiplicity comes from a run-length scan over the doc's SORTED
    * token array (`aggregate` HOF) — per-doc work, never an exploded
    * (doc, token) shuffle; the oracle recomputes it the exploded way,
    * which is fine at oracle scale. */
  private val gopherQualityRules = QueryDef(
    "gopher_quality_rules",
    (s, dir) =>
      docs(s, dir)
        .selectExpr(
          "CAST(doc_id AS BIGINT) AS doc_id",
          "filter(split(text, ' '), x -> x <> '') AS toks",
          "CAST(length(replace(text, ' ', '')) AS BIGINT) AS letters")
        .selectExpr(
          "doc_id",
          "CAST(size(toks) AS BIGINT) AS nw",
          "letters",
          """aggregate(
               array_sort(toks),
               named_struct('prev', CAST('' AS STRING), 'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)),
               (a, x) -> named_struct(
                 'prev', x,
                 'run', IF(x = a.prev, a.run + CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
                 'best', GREATEST(a.best, IF(x = a.prev, a.run + CAST(1 AS BIGINT), CAST(1 AS BIGINT)))),
               a -> a.best) AS max_tok""",
          "CAST(size(filter(toks, x -> x = 'the' OR x = 'a')) AS BIGINT) AS stops")
        .selectExpr(
          "doc_id", "nw",
          "nw >= 10 AND nw <= 1000 AS r_word_count",
          "letters >= 3 * nw AND letters <= 10 * nw AS r_mean_word_len",
          "stops >= 2 AS r_stopwords",
          "max_tok * 5 <= nw AS r_repetition")
        .withColumn("keep",
          col("r_word_count") && col("r_mean_word_len") && col("r_stopwords") && col("r_repetition"))
        .orderBy("doc_id"),
    Some("""WITH f AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS ts,
                     CAST(length(replace(text, ' ', '')) AS BIGINT) AS letters
              FROM documents),
            tok AS (SELECT doc_id, unnest(ts) AS t FROM f),
            mt AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS max_tok
                   FROM (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2)
                   GROUP BY doc_id),
            r AS (SELECT f.doc_id,
                         CAST(len(f.ts) AS BIGINT) AS nw,
                         f.letters,
                         COALESCE(mt.max_tok, 0) AS max_tok,
                         CAST(len(list_filter(f.ts, x -> x = 'the' OR x = 'a')) AS BIGINT) AS stops
                  FROM f LEFT JOIN mt ON mt.doc_id = f.doc_id)
            SELECT doc_id, nw,
                   nw >= 10 AND nw <= 1000 AS r_word_count,
                   letters >= 3 * nw AND letters <= 10 * nw AS r_mean_word_len,
                   stops >= 2 AS r_stopwords,
                   max_tok * 5 <= nw AS r_repetition,
                   (nw >= 10 AND nw <= 1000) AND (letters >= 3 * nw AND letters <= 10 * nw)
                     AND stops >= 2 AND max_tok * 5 <= nw AS keep
            FROM r ORDER BY doc_id"""),
  )

  /** Language-model-proxy quality signal without floats: the fraction of a
    * doc's word bigrams that fall OUTSIDE the corpus's top-200 most common
    * bigrams (ties broken by bigram text, so the cut is deterministic in
    * both engines). High rare-bigram rate ≈ high n-gram LM perplexity —
    * the classic CCNet/KenLM quality gate re-expressed with exact integer
    * arithmetic an oracle can replicate bit-for-bit.
    *
    * Scale shape: bigrams are built with codegen'd `arrays_zip`/`slice`/
    * `explode` — NOT a `transform` lambda, which runs interpreted and
    * measured 4× slower end-to-end at sf0.1. The global count
    * partial-aggregates map-side and shuffles only distinct bigrams
    * (vocabulary-bounded, Zipf-light); the top-200 is a
    * TakeOrderedAndProject (O(K) driver state); membership is a BROADCAST
    * hash join against the K-row common set (O(1) probe per bigram); and
    * the per-doc rollup shuffles one partial-agg row of three longs per
    * (doc, partition). */
  private val rareBigramRate = QueryDef(
    "rare_bigram_rate",
    (s, dir) => {
      val d = docs(s, dir).selectExpr(
        "CAST(doc_id AS BIGINT) AS doc_id",
        "filter(split(text, ' '), x -> x <> '') AS toks")
      val bg = d
        .selectExpr("doc_id",
          """arrays_zip(slice(toks, 1, greatest(size(toks) - 1, 0)),
                        slice(toks, 2, greatest(size(toks) - 1, 0))) AS z""")
        .select(col("doc_id"), explode(col("z")).as("p"))
        .select(col("doc_id"),
          concat(col("p").getField("0"), lit(" "), col("p").getField("1")).as("bg"))
      val top = bg.groupBy("bg").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), asc("bg")).limit(200).select("bg")
      val perDoc = bg.join(broadcast(top.withColumn("is_common", lit(1))), Seq("bg"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("is_common").isNull, 1L).otherwise(0L)).as("n_rare"))
      d.select("doc_id")
        .join(perDoc, Seq("doc_id"), "left")
        .selectExpr("doc_id",
          "COALESCE(n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams",
          "COALESCE(n_rare, CAST(0 AS BIGINT)) AS n_rare",
          "CASE WHEN COALESCE(n_bigrams, CAST(0 AS BIGINT)) > 0 THEN (n_rare * 1000) div n_bigrams ELSE CAST(0 AS BIGINT) END AS rare_permille")
        .orderBy("doc_id")
    },
    Some("""WITH ts AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS ts
              FROM documents),
            bgr AS (
              SELECT doc_id, ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] AS bg
              FROM ts, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g
              WHERE len(ts) >= 2),
            top AS (SELECT bg FROM (
                      SELECT bg, count(*) AS c FROM bgr GROUP BY 1
                      ORDER BY c DESC, bg LIMIT 200)),
            cnt AS (SELECT doc_id,
                           CAST(count(*) AS BIGINT) AS n_bigrams,
                           CAST(count(*) FILTER (WHERE bg NOT IN (SELECT bg FROM top)) AS BIGINT) AS n_rare
                    FROM bgr GROUP BY 1)
            SELECT t.doc_id,
                   COALESCE(c.n_bigrams, 0) AS n_bigrams,
                   COALESCE(c.n_rare, 0) AS n_rare,
                   CASE WHEN COALESCE(c.n_bigrams, 0) > 0
                        THEN (c.n_rare * 1000) // c.n_bigrams ELSE 0 END AS rare_permille
            FROM ts t LEFT JOIN cnt c ON c.doc_id = t.doc_id
            ORDER BY t.doc_id"""),
  )

  /** Edit-distance verification of LSH candidates — the second verifier a
    * fuzzy-dedup pass runs when token-set Jaccard is too loose (reordered
    * docs share a token set but are NOT byte-near-dups): MinHash banding
    * proposes pairs, `levenshtein` confirms within 25% of the longer doc
    * (`dist·4 ≤ max_len`, integer-exact in both engines).
    *
    * Scale shape: identical banding front-end to [[minhashPairs]] (linear
    * signature pass, bucket-keyed candidate join, never all-pairs); the
    * text fetch is a keyed join pruned to candidate ids. The O(n·m)
    * levenshtein DP runs only on candidates that survive two cheap exact
    * prefilters: byte equality (exact copies — the dominant candidate
    * class in a duplicated corpus — cost O(n) memcmp, and commons-style
    * levenshtein has no equality shortcut of its own) and the
    * length-gap lower bound (|len₁−len₂| ≤ dist, so a pair whose length
    * gap already exceeds the 25% budget can never pass). Both filters are
    * semantics-preserving; the 10× spot-bench dropped 15.7s → ~2s. */
  /** Scored candidate pairs (id1, id2, dist, max_len) for
    * [[editDistancePairs]], PRE-checkpoint — exposed so PlanSpec can
    * assert the real candidate-generation plan (the query itself
    * localCheckpoints, which reduces its executedPlan to a Scan
    * ExistingRDD and would make any assertion on it vacuous).
    *
    * The DP stage is compute-bound, not size-bound, and the planner
    * works against it twice: AQE's size-based coalescing packs the
    * (few-KB but ms-per-row) surviving pairs into ONE partition, and
    * Project/Filter collapse re-inlines the levenshtein CASE into every
    * consumer conjunct (~3 DP evaluations per pair — cross-operator
    * subexpression elimination does not exist). Computing `dist` HERE,
    * above the explicit candidate-keyed repartition, and materializing
    * the result behind the caller's checkpoint fixes both: the DP runs
    * exactly once per candidate, spread across the repartitioned stage,
    * and the post-checkpoint filter reads the materialized column.
    * Candidate-proportional materialization, same justification as
    * [[minhashSignatures]]. Measured 10.9s → 0.7s at the 10×
    * spot-bench. */
  private[graft] def editDistanceScored(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val sigs = minhashSignatures(d.select("doc_id", "text"), bands = 4, rowsPerBand = 2)
    val buckets = sigs.select(col("doc_id"), posexplode(col("buckets")).as(Seq("band", "bucket")))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .dropDuplicates("id1", "id2")
    val txt = d.select(col("doc_id").cast("long").as("doc_id"), col("text"))
    cand
      .join(txt.as("t1"), col("id1") === col("t1.doc_id"))
      .join(txt.as("t2"), col("id2") === col("t2.doc_id"))
      .withColumn("l1", length(col("t1.text")).cast("long"))
      .withColumn("l2", length(col("t2.text")).cast("long"))
      .withColumn("max_len", greatest(col("l1"), col("l2")))
      .filter(abs(col("l1") - col("l2")) * 4 <= col("max_len"))
      .select(col("id1"), col("id2"),
        col("t1.text").as("x"), col("t2.text").as("y"), col("max_len"))
      .repartition(s.sparkContext.defaultParallelism, col("id1"), col("id2"))
      .withColumn("dist",
        when(col("x") === col("y"), 0L)
          // banded DP: the threshold form is O(k·n) not O(n·m), and
          // returns -1 past the budget — dist ≤ ⌊max_len/4⌋ is exactly
          // the dist·4 ≤ max_len acceptance below, so no pair changes
          .otherwise(expr("levenshtein(x, y, CAST(max_len div 4 AS INT))").cast("long")))
      .select("id1", "id2", "dist", "max_len")
  }

  private val editDistancePairs = QueryDef(
    "edit_distance_pairs",
    (s, dir) => {
      editDistanceScored(s, dir)
        .localCheckpoint()
        .filter(col("dist") >= 0L && col("dist") * 4 <= col("max_len"))
        .orderBy("id1", "id2")
    },
    Some("""WITH ts AS (
              SELECT doc_id, text,
                     list_filter(string_split(text, ' '), t -> len(t) > 0) AS ts
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN len(ts) >= 3
                          THEN ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' ' || ts[CAST(i AS INT) + 2]
                          ELSE text END AS sh
              FROM ts, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 1))) AS i) g),
            sig AS (
              SELECT doc_id,
                     min(md5('1:' || sh)) AS h1, min(md5('2:' || sh)) AS h2,
                     min(md5('3:' || sh)) AS h3, min(md5('4:' || sh)) AS h4,
                     min(md5('5:' || sh)) AS h5, min(md5('6:' || sh)) AS h6,
                     min(md5('7:' || sh)) AS h7, min(md5('8:' || sh)) AS h8
              FROM sh GROUP BY doc_id),
            cand AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2
              FROM sig a JOIN sig b ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id
              FROM sig a JOIN sig b ON a.h3 = b.h3 AND a.h4 = b.h4 AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id
              FROM sig a JOIN sig b ON a.h5 = b.h5 AND a.h6 = b.h6 AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id
              FROM sig a JOIN sig b ON a.h7 = b.h7 AND a.h8 = b.h8 AND a.doc_id < b.doc_id)
            SELECT CAST(c.id1 AS BIGINT) AS id1, CAST(c.id2 AS BIGINT) AS id2,
                   CAST(levenshtein(d1.text, d2.text) AS BIGINT) AS dist,
                   CAST(greatest(length(d1.text), length(d2.text)) AS BIGINT) AS max_len
            FROM cand c
            JOIN documents d1 ON d1.doc_id = c.id1
            JOIN documents d2 ON d2.doc_id = c.id2
            WHERE levenshtein(d1.text, d2.text) * 4 <= greatest(length(d1.text), length(d2.text))
            ORDER BY id1, id2"""),
  )

  /** X84 leakage-safe train/val SPLIT assignment — the step a curation run
    * takes AFTER near-dup discovery and BEFORE carving eval data: a naive
    * per-doc hash split (the `deterministic_sample` rule) can put two
    * near-duplicate documents on opposite sides of the train/val boundary,
    * silently inflating every evaluation run on the val slice. The guard
    * assigns the split at the duplicate-COMPONENT level: every member of a
    * near-dup cluster follows its component label (the min doc_id), so a
    * cluster can never straddle the boundary. Output is the audit a
    * pipeline ships beside the split: per method (naive vs guarded), the
    * train/val doc counts and the number of near-dup PAIRS crossing the
    * boundary — 0 for the guarded method BY CONSTRUCTION (both endpoints
    * of an edge share a component, hence a split), and that zero is
    * recomputed here as a checked value, not assumed.
    *
    * Scale: reuses the memoized duplicate closure ([[dupComponents]] —
    * pointer-jumped min-label propagation, O(log diameter) rounds); the
    * assignment itself is a narrow md5 map over the label table, and the
    * audit joins the (edge-proportional) near-dup pair list against two
    * broadcast-size label projections. Nothing here rescans text. The
    * probe set (doc_id < 300) matches the closure's; singleton docs take
    * their own id as the component label. */
  private val splitLeakageGuard = QueryDef(
    "split_leakage_guard",
    (s, dir) => {
      val base = docs(s, dir).filter(col("doc_id") < 300).select("doc_id")
      val comps = dupComponents(s, dir)
        .select(col("id").cast("long").as("doc_id"), col("comp").cast("long").as("comp"))
      val lab = base.join(comps, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
      def splitOf(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(substring(md5(concat(lit("split:"), key.cast("string"))), 1, 1) === "0",
          lit("val")).otherwise(lit("train"))
      // materialize the label table once: the naive and guarded reports
      // each reference it twice (counts + cross-pair audit) inside one
      // union plan. The edge list comes pre-materialized from the session
      // memo (shared with `jaccard_pairs` and the closure). Both are tiny.
      val assigned = lab
        .withColumn("naive", splitOf(col("doc_id")))
        .withColumn("guarded", splitOf(col("comp")))
        .localCheckpoint()
      val edges = jaccardEdges(s, dir).select("id1", "id2")
      def report(splitCol: String, method: String): DataFrame = {
        val a = assigned.select(col("doc_id"), col(splitCol).as("split"))
        val counts = a.agg(
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
        val cross = edges
          .join(a.select(col("doc_id").as("id1"), col("split").as("s1")), "id1")
          .join(a.select(col("doc_id").as("id2"), col("split").as("s2")), "id2")
          .agg(sum(when(col("s1") =!= col("s2"), 1L).otherwise(0L)).as("n_cross_pairs"))
        counts.crossJoin(cross)
          .select(lit(method).as("method"), col("n_train"), col("n_val"),
            coalesce(col("n_cross_pairs"), lit(0L)).as("n_cross_pairs"))
      }
      report("naive", "naive").unionAll(report("guarded", "guarded")).orderBy("method")
    },
    Some("""WITH RECURSIVE tok AS (
              SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
              FROM documents WHERE doc_id < 300),
            sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS BIGINT) AS i
              FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id1, id2 FROM inter
              JOIN sz sa ON sa.doc_id = id1
              JOIN sz sb ON sb.doc_id = id2
              WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7),
            e AS (SELECT id1 AS a, id2 AS b FROM pairs
                  UNION ALL SELECT id2, id1 FROM pairs),
            reach AS (
              SELECT a AS node, a AS r FROM e
              UNION
              SELECT reach.node, e.b FROM reach JOIN e ON e.a = reach.r),
            comp AS (SELECT node, min(r) AS c FROM reach GROUP BY node),
            lab AS (
              SELECT d.doc_id, coalesce(comp.c, d.doc_id) AS comp
              FROM documents d LEFT JOIN comp ON comp.node = d.doc_id
              WHERE d.doc_id < 300),
            a AS (
              SELECT doc_id,
                CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
                     THEN 'val' ELSE 'train' END AS naive,
                CASE WHEN substring(md5('split:' || CAST(comp AS VARCHAR)), 1, 1) = '0'
                     THEN 'val' ELSE 'train' END AS guarded
              FROM lab)
            SELECT 'naive' AS method,
                   (SELECT CAST(count(*) FILTER (WHERE naive = 'train') AS BIGINT) FROM a) AS n_train,
                   (SELECT CAST(count(*) FILTER (WHERE naive = 'val') AS BIGINT) FROM a) AS n_val,
                   (SELECT CAST(count(*) AS BIGINT) FROM pairs p
                    JOIN a x ON x.doc_id = p.id1 JOIN a y ON y.doc_id = p.id2
                    WHERE x.naive <> y.naive) AS n_cross_pairs
            UNION ALL
            SELECT 'guarded',
                   (SELECT CAST(count(*) FILTER (WHERE guarded = 'train') AS BIGINT) FROM a),
                   (SELECT CAST(count(*) FILTER (WHERE guarded = 'val') AS BIGINT) FROM a),
                   (SELECT CAST(count(*) AS BIGINT) FROM pairs p
                    JOIN a x ON x.doc_id = p.id1 JOIN a y ON y.doc_id = p.id2
                    WHERE x.guarded <> y.guarded)
            ORDER BY method"""),
  )

  /** X85 corpus NOVELTY curve — the dataset-diversity audit run before
    * mixing decisions: per document (in doc_id = ingestion order), the
    * fraction of its distinct word 3-grams never seen in any earlier
    * document. A corpus whose novelty collapses toward 0 early is
    * saturated (more data, no new content — the scaling-law regime where
    * dedup/mixing matter most); a flat curve means sources keep adding
    * genuinely new text. "First seen" is min(doc_id) over the corpus for
    * the gram, so the curve is exact, order-deterministic, and
    * reshard-stable.
    *
    * Scale: grams are a narrow arrays_zip map (codegen'd — no interpreted
    * HOF lambdas, same rationale as `ngram_topk`); the first-seen flag is
    * ONE hash shuffle keyed on the gram (a window partitioned by gram —
    * per-gram groups are duplication-bounded, no skew reducer), then one
    * partial-aggregated groupBy back on doc_id. The corpus is read once;
    * nothing quadratic, nothing driver-side. */
  private val ngramNovelty = QueryDef(
    "ngram_novelty",
    (s, dir) => {
      val ts = split(col("text"), " ")
      val cnt = greatest(size(ts) - 2, lit(0))
      val grams = docs(s, dir)
        .select(col("doc_id"),
          explode(arrays_zip(
            slice(ts, lit(1), cnt), slice(ts, lit(2), cnt), slice(ts, lit(3), cnt))).as("p"))
        .select(col("doc_id"),
          concat_ws(" ", col("p").getField("0"), col("p").getField("1"),
            col("p").getField("2")).as("g"))
        .distinct()
      val w = Window.partitionBy("g")
      grams
        .withColumn("dmin", min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_grams"),
          sum(when(col("dmin") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          expr("n_novel * 100 div n_grams").as("novelty_x100"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            gr AS (SELECT DISTINCT doc_id,
                          array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS g
                   FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
                   WHERE len(w) >= 3),
            m AS (SELECT g, min(doc_id) AS dmin FROM gr GROUP BY g)
            SELECT gr.doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(count(*) FILTER (WHERE m.dmin = gr.doc_id) AS BIGINT) AS n_novel,
                   CAST(count(*) FILTER (WHERE m.dmin = gr.doc_id) * 100
                        // count(*) AS BIGINT) AS novelty_x100
            FROM gr JOIN m USING (g)
            GROUP BY gr.doc_id ORDER BY gr.doc_id"""),
  )

  /** X97 dedup recall report — the evaluation artifact shipped beside a
    * near-dup index, the text sibling of `ann_recall_report`: recall and
    * precision of the banded MinHash and SimHash screens against exact
    * shingle-Jaccard ≥ 0.5 ground truth, on the same bounded probe set the
    * Jaccard baseline uses (doc_id < 300 — fixed size at every sf, so the
    * all-pairs truth stays O(1) while the methods under audit are the
    * linear-scale paths). Per method: truth/found/hit/miss/extra pair
    * counts plus recall and precision in exact ppm. MinHash verifies exact
    * Jaccard after banding, so its extras are 0 by construction and its
    * misses are precisely the banding's false negatives; SimHash is scored
    * against Jaccard truth it never computes — its extras/misses expose
    * the hamming↔jaccard measure gap, which is the number a curation run
    * needs before trusting one screen to stand in for the other.
    *
    * Scale: the probe set is fixed-size by construction; both method
    * pipelines reuse their production constructions (banded, never
    * all-pairs) on the subset, and every aggregate after pair generation
    * is report-sized. The oracle recomputes truth and both methods from
    * the proven `minhash_dedup`/`simhash_dedup` SQL restricted to the
    * probe — banding collisions between two probe docs depend only on
    * their own signatures, so the subset restriction is exact. */
  private val dedupRecallReport = QueryDef(
    "dedup_recall_report",
    (s, dir) => {
      val probe = docs(s, dir).filter(col("doc_id") < 300)
      val sig = minhashSignatures(probe, bands = 4, rowsPerBand = 2)
      val shl = sig.select(col("doc_id").as("sid"), explode(col("shingles")).as("shg"))
      val sz = shl.groupBy("sid").agg(count(lit(1)).as("n"))
      val inter = shl.as("a")
        .join(shl.as("b"), col("a.shg") === col("b.shg") && col("a.sid") < col("b.sid"))
        .groupBy(col("a.sid").as("id1"), col("b.sid").as("id2"))
        .agg(count(lit(1)).as("i"))
      val truth = inter
        .join(sz.as("sa"), col("id1") === col("sa.sid"))
        .join(sz.as("sb"), col("id2") === col("sb.sid"))
        // raw-ratio compare, NOT rounded: the oracle's truth CTE compares
        // the unrounded ratio, and the two engines must share one
        // threshold convention (a pair at Jaccard ∈ [0.49995, 0.5) must
        // fall on the same side in both)
        .filter(col("i").cast("double") /
          (col("sa.n") + col("sb.n") - col("i")).cast("double") >= 0.5)
        .select(col("id1"), col("id2"))
        // three consumers (two method joins + the count): pin the bounded
        // all-pairs truth so it is computed once
        .localCheckpoint()
      // from the SAME signature frame the truth reads — one md5 kernel
      // pass for the whole report, not one per consumer
      val mh = minhashPairsFromSig(sig, threshold = 0.5)
        .select("id1", "id2")
      val sh2 = simhashPairs(probe, maxHamming = 3).select("id1", "id2")
      val tFlag = truth.withColumn("tr", lit(1L))
      def ev(name: String, f: DataFrame): DataFrame =
        f.join(tFlag, Seq("id1", "id2"), "left")
          .agg(count(lit(1)).as("found_pairs"),
            coalesce(sum("tr"), lit(0L)).as("hits"))
          .withColumn("method", lit(name))
      val tc = truth.agg(count(lit(1)).as("truth_pairs"))
      ev("minhash", mh).unionByName(ev("simhash", sh2))
        .crossJoin(broadcast(tc))
        .select(col("method"), col("truth_pairs"), col("found_pairs"), col("hits"),
          (col("truth_pairs") - col("hits")).as("misses"),
          (col("found_pairs") - col("hits")).as("extras"),
          expr("cast(CASE WHEN truth_pairs > 0 THEN (hits * 1000000) div truth_pairs END AS BIGINT)")
            .as("recall_ppm"),
          expr("cast(CASE WHEN found_pairs > 0 THEN (hits * 1000000) div found_pairs END AS BIGINT)")
            .as("precision_ppm"))
        .orderBy("method")
    },
    Some("""WITH p AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
            ts AS (
              SELECT doc_id, text,
                     list_filter(string_split(text, ' '), t -> len(t) > 0) AS ts
              FROM p),
            sh AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN len(ts) >= 3
                          THEN ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' ' || ts[CAST(i AS INT) + 2]
                          ELSE text END AS sh
              FROM ts, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 1))) AS i) g),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            pin AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS BIGINT) AS i
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            truth AS (
              SELECT id1, id2 FROM pin
              JOIN sz sa ON sa.doc_id = id1
              JOIN sz sb ON sb.doc_id = id2
              WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5),
            sig AS (
              SELECT doc_id,
                     min(md5('1:' || sh)) AS h1, min(md5('2:' || sh)) AS h2,
                     min(md5('3:' || sh)) AS h3, min(md5('4:' || sh)) AS h4,
                     min(md5('5:' || sh)) AS h5, min(md5('6:' || sh)) AS h6,
                     min(md5('7:' || sh)) AS h7, min(md5('8:' || sh)) AS h8
              FROM sh GROUP BY doc_id),
            cand AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2
              FROM sig a JOIN sig b ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id
              FROM sig a JOIN sig b ON a.h3 = b.h3 AND a.h4 = b.h4 AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id
              FROM sig a JOIN sig b ON a.h5 = b.h5 AND a.h6 = b.h6 AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id
              FROM sig a JOIN sig b ON a.h7 = b.h7 AND a.h8 = b.h8 AND a.doc_id < b.doc_id),
            minter AS (
              SELECT c.id1, c.id2, count(*) AS i
              FROM cand c
              JOIN sh s1 ON s1.doc_id = c.id1
              JOIN sh s2 ON s2.doc_id = c.id2 AND s2.sh = s1.sh
              GROUP BY 1, 2),
            mh AS (
              SELECT minter.id1, minter.id2 FROM minter
              JOIN sz sa ON sa.doc_id = minter.id1
              JOIN sz sb ON sb.doc_id = minter.id2
              WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5),
            stok AS (
              SELECT doc_id, md5(t) AS h
              FROM p,
              LATERAL (SELECT unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS t) u),
            sbits AS (
              SELECT doc_id, b,
                     strpos('0123456789abcdef', substring(h, (b // 4) + 1, 1)) - 1 AS d
              FROM stok,
              LATERAL (SELECT unnest(generate_series(0, 62)) AS b) bb),
            svotes AS (
              SELECT doc_id, b,
                     SUM(CASE WHEN (d >> (b % 4)) % 2 = 1 THEN 1 ELSE -1 END) AS v
              FROM sbits GROUP BY doc_id, b),
            ssig AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
              FROM svotes GROUP BY doc_id),
            scand AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, a.sig AS s1, b.sig AS s2
              FROM ssig a JOIN ssig b ON (a.sig & 65535) = (b.sig & 65535) AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id, a.sig, b.sig
              FROM ssig a JOIN ssig b ON ((a.sig >> 16) & 65535) = ((b.sig >> 16) & 65535) AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id, a.sig, b.sig
              FROM ssig a JOIN ssig b ON ((a.sig >> 32) & 65535) = ((b.sig >> 32) & 65535) AND a.doc_id < b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id, a.sig, b.sig
              FROM ssig a JOIN ssig b ON ((a.sig >> 48) & 32767) = ((b.sig >> 48) & 32767) AND a.doc_id < b.doc_id),
            shp AS (
              SELECT id1, id2 FROM scand WHERE bit_count(xor(s1, s2)) <= 3),
            tcount AS (SELECT CAST(count(*) AS BIGINT) AS truth_pairs FROM truth),
            ev AS (
              SELECT 'minhash' AS method,
                     CAST(count(*) AS BIGINT) AS found_pairs,
                     CAST(coalesce(sum(CASE WHEN t.id1 IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits
              FROM mh LEFT JOIN truth t ON t.id1 = mh.id1 AND t.id2 = mh.id2
              UNION ALL
              SELECT 'simhash',
                     CAST(count(*) AS BIGINT),
                     CAST(coalesce(sum(CASE WHEN t.id1 IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
              FROM shp LEFT JOIN truth t ON t.id1 = shp.id1 AND t.id2 = shp.id2)
            SELECT method, truth_pairs, found_pairs, hits,
                   truth_pairs - hits AS misses,
                   found_pairs - hits AS extras,
                   CAST(CASE WHEN truth_pairs > 0 THEN (hits * 1000000) // truth_pairs END AS BIGINT) AS recall_ppm,
                   CAST(CASE WHEN found_pairs > 0 THEN (hits * 1000000) // found_pairs END AS BIGINT) AS precision_ppm
            FROM ev, tcount ORDER BY method"""),
  )

  val defs: Seq[QueryDef] = Seq(
    gopherQualityRules, rareBigramRate, editDistancePairs,
    dedupExact, textStats, tokenCounts, docQuality, langIdHeuristic,
    docFingerprint, jaccardPairs, minhashDedup, minhashSignature,
    tokenizeRegex, simhashDedup, simhashSignature, deterministicSample, curationPipeline,
    dedupComponents, dedupResolve, dedupClusterStats, piiRedact, ngramTopk,
    stratifiedSample,
    tfidfTopk, dedupIncremental, invertedIndex, bm25Topk, qualityClassifier,
    textNormalize, bpeMerges, bpeEncode, tokenizerFertility, urlHostStats, mixtureWeights,
    qualityWeightedSample, minhashDecontaminate, splitLeakageGuard, ngramNovelty,
    minhashIncremental, dedupRecallReport,
  )
}
