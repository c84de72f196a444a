package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.12 X3 —
  * driver-mandated extension; `embedding` is ArrayType(FloatType), 64-dim).
  *
  * Float dot products are order-sensitive, so for oracle parity every
  * element-product is rounded to a scaled BIGINT before summation — integer
  * addition is associative, making scores bit-identical across engines,
  * partition counts, and cluster sizes, and making top-k ranking stable.
  *
  * Scale design: queries are broadcast, the corpus is scanned once (never
  * the reverse). Brute force is O(|Q|·N) per scan — fine for small |Q| even
  * at 100 TB. The IVF variant prunes the corpus scan to the probed cells:
  * assignment is one narrow map + the search is a broadcast join on cell id.
  */
object VectorOps {

  /** Scaled-integer dot product of two float vectors: round(x*y*1e4) per
    * element (deterministic double ops), then exact Long sum. Backed by the
    * native codegen'd [[graft.functions.DotScaled]] expression — a tight
    * generated loop instead of interpreted per-element lambdas. Callers
    * must have run `DotScaled.register(spark)` (all entry points here do). */
  private def dotScaled(a: Column, b: Column): Column =
    graft.functions.DotScaled.dotScaled(a, b)

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  /** Per-key top-k with a map-side partial: each partition keeps at most k
    * candidates per key in a bounded heap, then the exact window ranks the
    * reduced set. A window alone shuffles EVERY score to |keys| reducers —
    * with 10 probe keys that is a 10-task bottleneck no matter how many
    * executors exist; the partial cuts the shuffle to ≤ partitions·k rows
    * per key and the selection is lossless (any global top-k row is a
    * partition top-k row). Input columns: (qid, neighbor_id, score);
    * ordering: score desc, neighbor_id asc. */
  private def topKPerKey(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val partial = scored.select("qid", "neighbor_id", "score").as[(Long, Long, Long)]
      .mapPartitions { it =>
        // head of the queue = worst kept candidate (lowest score, then
        // highest neighbor_id), so one compare decides admission
        val worstFirst: Ordering[(Long, Long)] = Ordering.by(t => (-t._1, t._2))
        val heaps = scala.collection.mutable.Map[Long, scala.collection.mutable.PriorityQueue[(Long, Long)]]()
        it.foreach { case (qid, nid, score) =>
          val h = heaps.getOrElseUpdate(qid,
            scala.collection.mutable.PriorityQueue.empty[(Long, Long)](worstFirst))
          if (h.size < k) h.enqueue((score, nid))
          else {
            val (ws, wn) = h.head
            if (score > ws || (score == ws && nid < wn)) { h.dequeue(); h.enqueue((score, nid)) }
          }
        }
        heaps.iterator.flatMap { case (qid, h) => h.iterator.map(t => (qid, t._2, t._1)) }
      }.toDF("qid", "neighbor_id", "score")
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("neighbor_id"))
    partial
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** X3 brute-force cosine/dot top-k: for each probe vector (vec_id < 10),
    * the 5 nearest corpus vectors by scaled dot product. (Fixture vectors
    * are ~unit-norm, so dot ≈ cosine; the scaled-int trick keeps ranking
    * deterministic.) */
  /** Exact brute-force top-k (query side broadcast, corpus scanned once) —
    * the baseline and the ANN variants' ground truth. */
  def bruteTopk(e: DataFrame, probeFilter: Column, k: Int): DataFrame = {
    graft.functions.DotScaled.register(e.sparkSession)
    val q = broadcast(
      e.filter(probeFilter).select(col("vec_id").as("qid"), col("embedding").as("qe")))
    val scored = e.crossJoin(q)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"),
        dotScaled(col("qe"), col("embedding")).as("score"))
    topKPerKey(scored, k)
  }

  private val cosineTopk = QueryDef(
    "cosine_topk",
    (s, dir) => bruteTopk(emb(s, dir), col("vec_id") < 10, 5).orderBy("qid", "rn"),
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < 10),
            s AS (SELECT qid, e.vec_id AS neighbor_id,
                         CAST(list_sum(list_transform(list_zip(qe, e.embedding),
                              p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000)))
                              AS BIGINT) AS score
                  FROM embeddings e, q WHERE e.vec_id <> qid)
            SELECT qid, neighbor_id, score, rn FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY qid
                             ORDER BY score DESC, neighbor_id) AS BIGINT) AS rn
              FROM s) WHERE rn <= 5 ORDER BY qid, rn"""),
  )

  /** Per-vector norm (scaled-int sum of squares) + per-label counts — the
    * sanity stats a vector pipeline materializes before indexing. */
  private val embedNorms = QueryDef(
    "embed_norms",
    (s, dir) => {
      graft.functions.DotScaled.register(s)
      emb(s, dir)
        .select(
          col("vec_id"),
          col("label").cast("long").as("label"),
          dotScaled(col("embedding"), col("embedding")).as("norm_sq_scaled"))
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id, CAST(label AS BIGINT) AS label,
            CAST(list_sum(list_transform(embedding,
                 x -> round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 10000))) AS BIGINT)
              AS norm_sq_scaled
            FROM embeddings ORDER BY vec_id"""),
  )

  /** Scaled-int dot product on primitive arrays — the JVM-kernel twin of
    * [[dotScaled]] for hot inner loops (no per-element Catalyst overhead). */
  private def dotScaledJvm(a: Array[Float], b: Array[Float]): Long = {
    var i = 0; var acc = 0L
    while (i < a.length) { acc += Math.round(a(i).toDouble * b(i).toDouble * 10000d); i += 1 }
    acc
  }

  /** Fixed-size-k deterministic codebook: the k corpus vectors that sort
    * first by (md5(vec_id), vec_id). md5 of the id is a uniform permutation
    * of the corpus, so this IS a uniform random sample — but deterministic,
    * engine-independent (Spark/JVM/DuckDB md5 agree on the same string),
    * and recomputable in SQL. Crucially the driver cost is O(k) regardless
    * of corpus size: `orderBy(..).limit(k)` plans as TakeOrderedAndProject —
    * each partition keeps its local top-k and the driver merges partition
    * winners, never the corpus. (The previous `vec_id % 200 == 0` rule made
    * the codebook — and the driver collect — grow linearly with the corpus:
    * a scale-killer at 100 TB. Fixed k is how a real IVF index behaves.) */
  def md5Codebook(e: DataFrame, k: Int): Array[(Long, Array[Float])] = {
    val s = e.sparkSession
    import s.implicits._
    e.select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .as[(Long, Array[Float])].collect()
  }

  /** X3 scale path: IVF-style ANN. A fixed-size-k deterministic codebook
    * ([[md5Codebook]]) is collected and BROADCAST — cell assignment is one
    * narrow mapPartitions over the corpus with a primitive-float kernel (the
    * genuinely imperative inner loop: k·dim mult-adds per vector, no
    * shuffle, no crossJoin). Probe cells are resolved on the driver (the
    * probe set is tiny), and the search is a broadcast join against only the
    * probed cells — at 100 TB the corpus is scanned once to build the index
    * and each query touches nprobe/k of the data, while the codebook stays
    * O(k) on the driver independent of corpus size. Every step — md5-ordered
    * codebook, scaled-int argmax assignment, exact rerank — is recomputable
    * in SQL, so the whole search path is DuckDB-oracled. Shared by the
    * QueryDef and AnnSpec's planted-cluster recall fixtures. */
  def ivfTopk(e: DataFrame, probeFilter: Column, k: Int, nprobe: Int,
      codebookK: Int): DataFrame = {
    val s = e.sparkSession
    graft.functions.DotScaled.register(s)
    import s.implicits._
    val cents: Array[(Long, Array[Float])] = md5Codebook(e, codebookK)
    val bc = s.sparkContext.broadcast(cents)
    def topCells(v: Array[Float], n: Int): Seq[Long] =
      bc.value.map { case (cid, c) => (cid, dotScaledJvm(c, v)) }
        .sortBy { case (cid, sc) => (-sc, cid) }.take(n).map(_._1).toSeq
    val assigned = e.select("vec_id", "embedding").as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, topCells(v, 1).head, v) })
      .toDF("neighbor_id", "cell", "emb")
    val probes = e.filter(probeFilter)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .flatMap { case (qid, qv) => topCells(qv, nprobe).map(c => (qid, c, qv)) }
    val probeDf = broadcast(s.createDataset(probes.toSeq).toDF("qid", "cell", "qe"))
    val scored = assigned.join(probeDf, "cell")
      .filter(col("neighbor_id") =!= col("qid"))
      .select(col("qid"), col("neighbor_id"), dotScaled(col("qe"), col("emb")).as("score"))
    topKPerKey(scored, k)
  }

  /** X3 IVF ANN, ORACLE-ANCHORED end to end: DuckDB recomputes the
    * md5-ordered codebook, the scaled-int argmax cell assignment, the
    * probed-cell candidate set, and the exact rerank — the IVF search path
    * itself is hash-matched, not just spec-trusted (same anchor trick as
    * `ann_lsh_md5_topk`). Knobs: 16-cell codebook, nprobe=6 (per-probe scan
    * ≈ 3/8 of the corpus here; at real scale k grows with the corpus'
    * cluster count, not its row count). */
  private val annIvfTopk = QueryDef(
    "ann_ivf_topk",
    (s, dir) => ivfTopk(emb(s, dir), col("vec_id") < 10, k = 3, nprobe = 6,
      codebookK = 16).orderBy("qid", "rn"),
    Some("""WITH cb AS (
              SELECT vec_id AS cid, embedding AS ce
              FROM (SELECT vec_id, embedding,
                           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
                    FROM embeddings) WHERE rk <= 16),
            asg AS (
              SELECT e.vec_id, cb.cid,
                     CAST(list_sum(list_transform(list_zip(e.embedding, cb.ce),
                          p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000))) AS BIGINT) AS s
              FROM embeddings e CROSS JOIN cb),
            rk AS (SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
                   FROM asg),
            cell AS (SELECT vec_id, cid AS cell FROM rk WHERE rn = 1),
            pcell AS (SELECT vec_id AS qid, cid AS cell FROM rk WHERE vec_id < 10 AND rn <= 6),
            cand AS (SELECT p.qid, c.vec_id AS neighbor_id
                     FROM pcell p JOIN cell c ON c.cell = p.cell AND c.vec_id <> p.qid),
            s2 AS (SELECT cand.qid, cand.neighbor_id,
                          CAST(list_sum(list_transform(list_zip(qe.embedding, ce.embedding),
                               p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000))) AS BIGINT) AS score
                   FROM cand JOIN embeddings qe ON qe.vec_id = cand.qid
                             JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)
            SELECT qid, neighbor_id, score, rn FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY qid
                             ORDER BY score DESC, neighbor_id) AS BIGINT) AS rn
              FROM s2) WHERE rn <= 3 ORDER BY qid, rn"""),
  )

  /** X3 scale path #2: random-hyperplane LSH ANN (the bucket-join sibling
    * of IVF). A fixed-seed bank of `tables × bits` gaussian hyperplanes is
    * broadcast; each vector's per-table code is the sign pattern of its
    * hyperplane dots (one narrow flatMap, `tables` rows per vector — no
    * shuffle of embeddings beyond the bucket join). Candidates are corpus
    * vectors sharing any (table, code) bucket with a probe — a broadcast
    * join on the bucket key — then the exact scaled-int dot ranks only
    * candidates. Knobs: more bits → fewer, purer candidates; more tables →
    * higher recall. At 100 TB each probe touches ~tables·N/2^bits vectors
    * instead of N. Fixture vectors are uniform random (worst case for any
    * ANN); AnnSpec checks recall against brute force. No SQL oracle
    * (hyperplane bank is engine-side); driver records rows-only. */
  /** Reusable random-hyperplane LSH ANN (fixed-seed plane bank). Shared by
    * the QueryDef and AnnSpec's planted-cluster recall fixtures. */
  def lshTopk(e: DataFrame, probeFilter: Column, k: Int, tables: Int,
      bits: Int, dim: Int): DataFrame = {
    val s = e.sparkSession
    graft.functions.DotScaled.register(s)
    import s.implicits._
    val rnd = new java.util.Random(42) // fixed seed: same bank everywhere
    val planes: Array[Array[Float]] =
      Array.fill(tables * bits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val bc = s.sparkContext.broadcast(planes)
    def codes(v: Array[Float]): Array[Int] = {
      val ps = bc.value
      Array.tabulate(tables) { t =>
        var code = 0; var b = 0
        while (b < bits) {
          val p = ps(t * bits + b)
          var acc = 0.0; var i = 0
          val n = math.min(p.length, v.length)
          while (i < n) { acc += p(i) * v(i); i += 1 }
          if (acc > 0) code |= (1 << b)
          b += 1
        }
        code
      }
    }
    val bucketed = e.select("vec_id", "embedding").as[(Long, Array[Float])]
      .mapPartitions(_.flatMap { case (id, v) =>
        codes(v).zipWithIndex.map { case (c, t) => (id, t, c, v) } })
      .toDF("neighbor_id", "tbl", "code", "emb")
    val probes = e.filter(probeFilter)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .flatMap { case (qid, qv) =>
        codes(qv).zipWithIndex.map { case (c, t) => (qid, t, c, qv) } }
    val probeDf = broadcast(s.createDataset(probes.toSeq).toDF("qid", "tbl", "code", "qe"))
    val scored = bucketed.join(probeDf, Seq("tbl", "code"))
      .filter(col("neighbor_id") =!= col("qid"))
      .dropDuplicates("qid", "neighbor_id") // a pair may collide in several tables
      .select(col("qid"), col("neighbor_id"), dotScaled(col("qe"), col("emb")).as("score"))
    topKPerKey(scored, k)
  }

  /** X3 multi-table LSH ANN, ORACLE-ANCHORED: `tables` independent md5-
    * derived ±1 plane banks (namespace `lshm:<table>`), OR-amplified —
    * a pair is a candidate if it collides in ANY table (higher recall than
    * one bank at the same bits; the textbook LSH amplification). Buckets,
    * candidate union, and rerank are all recomputed by DuckDB, closing the
    * search-path oracle gap the gaussian [[lshTopk]] (spec-covered, engine-
    * tuned) cannot close. Scale shape: one narrow flatMap emits `tables`
    * (table, bucket) rows per vector, probes broadcast, candidates from the
    * (table, bucket) equi-join only — per probe ~tables·N/2^bits vectors,
    * never N. */
  private def md5LshMultiTopk(e: DataFrame, probeFilter: Column, k: Int,
      tables: Int, bits: Int, dim: Int): DataFrame = {
    val s = e.sparkSession
    graft.functions.DotScaled.register(s)
    import s.implicits._
    // ±1 sign banks derived from md5 on the DRIVER (JVM md5 == DuckDB md5
    // on the same string), then applied in a primitive-long kernel — the
    // oracle recomputes the identical buckets from SQL, while the engine
    // side stays one tight loop per plane instead of tables·bits
    // interpreted HOF aggregates per row (measured 6× faster at sf0.1).
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex1(str: String): Char = {
      val b = md.digest(str.getBytes(java.nio.charset.StandardCharsets.UTF_8))(0)
      java.lang.Integer.toHexString((b & 0xff) | 0x100).charAt(1)
    }
    val planes: Array[Array[Long]] = Array.tabulate(tables * bits) { tj =>
      val t = tj / bits; val j = tj % bits
      Array.tabulate(dim)(d => if (hex1(s"lshm:$t:$j:$d") <= '7') 1L else -1L)
    }
    val bc = s.sparkContext.broadcast(planes)
    // scaled-int projection — term-for-term the arithmetic the oracle runs:
    // sum_d round(v_d * 1e4) * sign_d, sign of the exact Long sum
    def codes(v: Array[Float]): Array[Long] = {
      val ps = bc.value
      Array.tabulate(tables) { t =>
        var code = 0L; var b = 0
        while (b < bits) {
          val p = ps(t * bits + b)
          var acc = 0L; var i = 0
          val n = math.min(p.length, v.length)
          while (i < n) { acc += Math.round(v(i).toDouble * 10000d) * p(i); i += 1 }
          if (acc > 0) code |= (1L << b)
          b += 1
        }
        code
      }
    }
    def bucketize(d: DataFrame): DataFrame =
      d.select("vec_id", "embedding").as[(Long, Array[Float])]
        .mapPartitions(_.flatMap { case (id, v) =>
          codes(v).zipWithIndex.map { case (c, t) => (id, t.toLong, c, v) } })
        .toDF("vec_id", "tbl", "bucket", "emb")
    val bucketed = bucketize(e)
    // filter BEFORE the opaque kernel: predicates don't push through
    // mapPartitions, so bucketing first would re-scan the whole corpus
    // just to find the handful of probes
    val probes = broadcast(bucketize(e.filter(probeFilter))
      .select(col("vec_id").as("qid"), col("emb").as("qe"),
        col("tbl"), col("bucket")))
    val scored = bucketed.join(probes, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .dropDuplicates("qid", "vec_id") // a pair may collide in several tables
      .select(col("qid"), col("vec_id").as("neighbor_id"),
        dotScaled(col("qe"), col("emb")).as("score"))
    topKPerKey(scored, k)
  }

  private val annLshTopk = QueryDef(
    "ann_lsh_topk",
    (s, dir) => md5LshMultiTopk(emb(s, dir), col("vec_id") < 10, k = 3,
      tables = 12, bits = 6, dim = 64).orderBy("qid", "rn"),
    Some("""WITH hp AS (
              SELECT t, j, d,
                     CASE WHEN substring(md5('lshm:' || t || ':' || j || ':' || d), 1, 1) <= '7'
                          THEN 1 ELSE -1 END AS sgn
              FROM (SELECT unnest(range(0, 12)) AS t),
                   (SELECT unnest(range(0, 6)) AS j),
                   (SELECT unnest(range(0, 64)) AS d)),
            bits AS (
              SELECT e.vec_id, h.t, h.j,
                     CASE WHEN sum(CAST(round(CAST(e.embedding[CAST(h.d AS INT) + 1] AS DOUBLE) * 10000) AS BIGINT) * h.sgn) > 0
                          THEN 1 ELSE 0 END AS bit
              FROM embeddings e JOIN hp h ON true
              GROUP BY e.vec_id, h.t, h.j),
            buck AS (SELECT vec_id, t, CAST(sum(bit << CAST(j AS INT)) AS BIGINT) AS bucket
                     FROM bits GROUP BY vec_id, t),
            cand AS (
              SELECT DISTINCT q.vec_id AS qid, c.vec_id AS neighbor_id
              FROM buck q JOIN buck c ON q.t = c.t AND q.bucket = c.bucket
                                     AND c.vec_id <> q.vec_id
              WHERE q.vec_id < 10),
            s2 AS (
              SELECT cand.qid, cand.neighbor_id,
                     CAST(list_sum(list_transform(list_zip(qe.embedding, ce.embedding),
                          p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000))) AS BIGINT) AS score
              FROM cand
              JOIN embeddings qe ON qe.vec_id = cand.qid
              JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)
            SELECT qid, neighbor_id, score, rn FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY qid
                             ORDER BY score DESC, neighbor_id) AS BIGINT) AS rn
              FROM s2) WHERE rn <= 3 ORDER BY qid, rn"""),
  )

  /** Bucket id = `bits` sign bits of ±1-hyperplane projections, the planes
    * derived from md5 (sign of plane j at dim d = first hex char of
    * md5("lsh:j:d") ≤ '7') and the projection in scaled-int arithmetic —
    * fully deterministic AND recomputable in SQL. ±1 sign planes are valid
    * sign-random-projection LSH; the gaussian bank in [[lshTopk]] is the
    * engine-tuned sibling. */
  private def md5LshBucket(embCol: Column, bits: Int, dim: Int,
      ns: String = "lsh"): Column = {
    // the plane bank is a CONSTANT: derive the signs once on the driver
    // (JVM md5 == Spark/DuckDB md5 on the same string) and embed them as
    // literal arrays — the per-row work is one zip_with multiply-add per
    // plane, not dim·bits md5 calls
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex1(s: String): Char = {
      val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))(0)
      java.lang.Integer.toHexString((b & 0xff) | 0x100).charAt(1)
    }
    (0 until bits).map { j =>
      val signs: Seq[Long] =
        (0 until dim).map(d => if (hex1(s"$ns:$j:$d") <= '7') 1L else -1L)
      val proj = aggregate(
        zip_with(embCol, typedLit(signs),
          (x, s) => round(x.cast("double") * 10000d).cast("long") * s),
        lit(0L), (acc, v) => acc + v)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** X3 ORACLE-ANCHORED LSH ANN: the bucket-join search with md5-derived
    * ±1 hyperplanes, so DuckDB recomputes the identical buckets, candidate
    * sets, and rerank — upgrading the LSH search path itself from
    * spec-trusted to hash-matched (the same md5-anchor trick as
    * `minhash_dedup`). Same scale shape as [[lshTopk]]: one narrow bucket
    * assignment, probes broadcast, candidates from the bucket equi-join
    * only, exact rerank on candidates. */
  private val annLshMd5Topk = QueryDef(
    "ann_lsh_md5_topk",
    (s, dir) => {
      graft.functions.DotScaled.register(s)
      val withB = emb(s, dir).select(col("vec_id"), col("embedding"),
        md5LshBucket(col("embedding"), bits = 6, dim = 64).as("bucket"))
      val probes = broadcast(withB.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket")))
      val scored = withB.join(probes, "bucket")
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("neighbor_id"),
          dotScaled(col("qe"), col("embedding")).as("score"))
      topKPerKey(scored, 5).orderBy("qid", "rn")
    },
    Some("""WITH hp AS (
              SELECT j, d,
                     CASE WHEN substring(md5('lsh:' || j || ':' || d), 1, 1) <= '7'
                          THEN 1 ELSE -1 END AS sgn
              FROM (SELECT unnest(range(0, 6)) AS j), (SELECT unnest(range(0, 64)) AS d)),
            bits AS (
              SELECT e.vec_id, h.j,
                     CASE WHEN sum(CAST(round(CAST(e.embedding[CAST(h.d AS INT) + 1] AS DOUBLE) * 10000) AS BIGINT) * h.sgn) > 0
                          THEN 1 ELSE 0 END AS bit
              FROM embeddings e JOIN hp h ON true
              GROUP BY e.vec_id, h.j),
            buck AS (SELECT vec_id, CAST(sum(bit << CAST(j AS INT)) AS BIGINT) AS bucket
                     FROM bits GROUP BY vec_id),
            cand AS (
              SELECT q.vec_id AS qid, c.vec_id AS neighbor_id
              FROM buck q JOIN buck c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
              WHERE q.vec_id < 10),
            s AS (
              SELECT cand.qid, cand.neighbor_id,
                     CAST(list_sum(list_transform(list_zip(qe.embedding, ce.embedding),
                          p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000))) AS BIGINT) AS score
              FROM cand
              JOIN embeddings qe ON qe.vec_id = cand.qid
              JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)
            SELECT qid, neighbor_id, score, rn FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY qid
                             ORDER BY score DESC, neighbor_id) AS BIGINT) AS rn
              FROM s) WHERE rn <= 5 ORDER BY qid, rn"""),
  )

  /** X2 embedding-cosine near-dup: pairs in a bounded probe set whose
    * scaled dot ≥ 0.4 (fixture vectors are ~unit-norm). The quadratic
    * verification is bounded; at corpus scale the candidate set would come
    * from the IVF cells or an LSH bucket join first, then this exact pass
    * runs only on candidates. */
  private val embedNearDup = QueryDef(
    "embed_near_dup",
    (s, dir) => {
      graft.functions.DotScaled.register(s)
      val sub = emb(s, dir).filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      sub.as("a").join(sub.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
          dotScaled(col("a.embedding"), col("b.embedding")).as("score"))
        .filter(col("score") >= 4000)
        .orderBy("id1", "id2")
    },
    Some("""WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500)
            SELECT a.vec_id AS id1, b.vec_id AS id2,
                   CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000)))
                        AS BIGINT) AS score
            FROM sub a JOIN sub b ON a.vec_id < b.vec_id
            WHERE CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000)))
                  AS BIGINT) >= 4000
            ORDER BY id1, id2"""),
  )

  /** X26 int8 embedding quantization accounting: symmetric per-vector
    * quantization to [-127, 127] (q_i = round(x_i · 127 / max|x|)) — the
    * storage/serving format vector stacks ship (4× smaller than float32,
    * SIMD-friendly int dot products). Output is the per-vector scale plus
    * the quantized sum/L1 checksums, each an exact integer — so the whole
    * quantization arithmetic is recomputed bit-identically by DuckDB
    * (element-wise double ops + integer sums; no float accumulation).
    * Narrow per-row map, no shuffle before the final order-by. */
  private val embedQuantize = QueryDef(
    "embed_quantize",
    (s, dir) => {
      val maxAbs = aggregate(col("embedding"), lit(0d),
        (a, x) => greatest(a, abs(x.cast("double"))))
      def q(x: Column) = round(x.cast("double") * 127d / col("ma"))
      emb(s, dir)
        .select(col("vec_id"), maxAbs.as("ma"), col("embedding"))
        .filter(col("ma") > 0d) // an all-zero vector has no scale
        .select(
          col("vec_id"),
          round(col("ma") * 10000d).cast("long").as("max_abs_scaled"),
          aggregate(transform(col("embedding"), x => q(x).cast("long")),
            lit(0L), (acc, v) => acc + v).as("q_sum"),
          aggregate(transform(col("embedding"), x => abs(q(x)).cast("long")),
            lit(0L), (acc, v) => acc + v).as("q_l1"))
        .orderBy("vec_id")
    },
    Some("""WITH m AS (
              SELECT vec_id, embedding,
                     list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
              FROM embeddings)
            SELECT vec_id,
                   CAST(round(ma * 10000) AS BIGINT) AS max_abs_scaled,
                   CAST(list_sum(list_transform(embedding,
                        x -> round(CAST(x AS DOUBLE) * 127 / ma))) AS BIGINT) AS q_sum,
                   CAST(list_sum(list_transform(embedding,
                        x -> abs(round(CAST(x AS DOUBLE) * 127 / ma)))) AS BIGINT) AS q_l1
            FROM m WHERE ma > 0 ORDER BY vec_id"""),
  )

  /** Scaled-int squared distance over a dimension slice — per-element
    * `round((aᵢ−bᵢ)²·1e4)` summed: floats widen exactly to double, the
    * subtraction/multiply are single IEEE ops, and the rounded Long sum is
    * associative — identical in DuckDB's
    * `round((p[1]-p[2])*(p[1]-p[2])*10000)` (same family as
    * [[dotScaledJvm]]). */
  private def sqDistScaledJvm(a: Array[Float], b: Array[Float],
      from: Int, until: Int): Long = {
    var i = from; var acc = 0L
    while (i < until) {
      val d = a(i).toDouble - b(i).toDouble
      acc += Math.round(d * d * 10000d)
      i += 1
    }
    acc
  }

  /** X3 scale path #3: product-quantization (PQ) ANN — the memory-
    * compression index family (IVF partitions the corpus, LSH buckets it,
    * PQ shrinks each vector). The 64-dim space splits into 4 subspaces of
    * 16 dims; each subspace gets a 16-entry codebook (the md5-ordered
    * deterministic sample, same as IVF), so a vector encodes to 4 codes —
    * 4 bytes standing in for 256 bytes of floats, the asymmetric-distance
    * trick of Jégou et al.'s "Product Quantization for Nearest Neighbor
    * Search" (TPAMI 2011).
    *
    * Query-time ADC: the probe's distance to every (subspace, centroid)
    * pair is a 4×16 table computed once; a candidate's approximate
    * distance is 4 table lookups. Scale shape: ONE narrow mapPartitions
    * encodes the corpus and scores it against the broadcast ADC table —
    * no shuffle at all — and top-k is TakeOrderedAndProject. At 100 TB
    * the codes would be precomputed at ingest (append-only column) and
    * probes batched; codebook + ADC stay O(k·dim) on the driver.
    *
    * ORACLE-ANCHORED end to end: codebook selection, scaled-int argmin
    * encoding (tie → smaller code), ADC table, and the final ranking are
    * all recomputed by DuckDB — the probe IS vector 0, so its
    * subspace-to-centroid distances double as the ADC table. */
  def pqTopk(e: DataFrame, k: Int, codebookK: Int, subspaces: Int): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    require(subspaces == 4, "output schema is fixed to 4 subspace codes")
    val cents: Array[Array[Float]] = md5Codebook(e, codebookK).map(_._2)
    val dim = cents.head.length
    val dsub = dim / subspaces
    val probe = e.filter(col("vec_id") === 0L)
      .select("embedding").as[Array[Float]].head()
    val ptable = Array.tabulate(subspaces, codebookK) { (m, j) =>
      sqDistScaledJvm(probe, cents(j), m * dsub, (m + 1) * dsub)
    }
    val bcC = s.sparkContext.broadcast(cents)
    val bcP = s.sparkContext.broadcast(ptable)
    e.select("vec_id", "embedding").as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcC.value; val pt = bcP.value
        it.map { case (id, v) =>
          val codes = new Array[Long](4)
          var adc = 0L
          var m = 0
          while (m < 4) {
            var best = 0; var bestD = Long.MaxValue
            var j = 0
            while (j < cs.length) {
              val d = sqDistScaledJvm(v, cs(j), m * dsub, (m + 1) * dsub)
              if (d < bestD) { bestD = d; best = j } // strict < keeps smaller j on ties
              j += 1
            }
            codes(m) = best.toLong
            adc += pt(m)(best)
            m += 1
          }
          (id, codes(0), codes(1), codes(2), codes(3), adc)
        }
      }
      .toDF("vec_id", "c0", "c1", "c2", "c3", "adc_scaled")
      .orderBy(asc("adc_scaled"), asc("vec_id"))
      .limit(k)
  }

  private val annPqTopk = QueryDef(
    "ann_pq_topk",
    (s, dir) => pqTopk(emb(s, dir), k = 50, codebookK = 16, subspaces = 4),
    Some("""WITH cb AS (SELECT vec_id AS cid, embedding AS ce,
                   CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) - 1 AS j
                 FROM embeddings ORDER BY j LIMIT 16),
            sub AS (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS m),
            vd AS (SELECT e.vec_id, s.m, cb.j,
                     CAST(list_sum(list_transform(
                          list_zip(e.embedding[s.m*16+1 : s.m*16+16], cb.ce[s.m*16+1 : s.m*16+16]),
                          p -> round((CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                                   * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * 10000))) AS BIGINT) AS d
                   FROM embeddings e CROSS JOIN cb CROSS JOIN sub s),
            code AS (SELECT vec_id, m, j AS code FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn FROM vd)
                     WHERE rn = 1),
            pt AS (SELECT v.m, v.j, v.d FROM vd v WHERE v.vec_id = 0),
            adc AS (SELECT c.vec_id, CAST(sum(pt.d) AS BIGINT) AS adc_scaled
                    FROM code c JOIN pt ON pt.m = c.m AND pt.j = c.code GROUP BY 1)
            SELECT a.vec_id,
                   CAST(max(CASE WHEN c.m = 0 THEN c.code END) AS BIGINT) AS c0,
                   CAST(max(CASE WHEN c.m = 1 THEN c.code END) AS BIGINT) AS c1,
                   CAST(max(CASE WHEN c.m = 2 THEN c.code END) AS BIGINT) AS c2,
                   CAST(max(CASE WHEN c.m = 3 THEN c.code END) AS BIGINT) AS c3,
                   a.adc_scaled
            FROM adc a JOIN code c ON c.vec_id = a.vec_id
            GROUP BY a.vec_id, a.adc_scaled
            ORDER BY a.adc_scaled, a.vec_id LIMIT 50"""),
  )

  /** Per-label centroid, one row per (label, dimension). Elements are
    * quantized to 1e6-scaled BIGINTs first (`round(x·1e6)` matches across
    * engines — same scheme as embed_quantize), so the mean is integer
    * arithmetic: exact, associative, order-independent. The division is
    * `floor(sum/n)` on BOTH sides — DuckDB's `//` floors while Spark's
    * `div` truncates, and negative sums would diverge.
    *
    * Scale shape: posexplode amplifies rows ×dim, but the groupBy(label,
    * dim) partial-aggregates map-side, so the shuffle carries only
    * labels×dims rows per partition — at 100 TB the wire traffic is the
    * codebook size, not the corpus. */
  private val embedCentroid = QueryDef(
    "embed_centroid",
    (s, dir) =>
      emb(s, dir)
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          round(col("x").cast("double") * 1000000d).cast("long").as("v"))
        .groupBy("label", "dim")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .select(col("label"), col("dim"),
          floor(col("sv").cast("double") / col("n").cast("double")).cast("long")
            .as("centroid_scaled"),
          col("n"))
        .orderBy("label", "dim"),
    Some("""WITH ex AS (SELECT label,
                   unnest(range(1, len(embedding)+1)) AS dim,
                   unnest(list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS v
                 FROM embeddings)
            SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
                   CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS centroid_scaled,
                   CAST(count(*) AS BIGINT) AS n
            FROM ex GROUP BY 1, 2 ORDER BY label, dim"""),
  )

  /** X47 Lloyd k-means over the embedding corpus, exact end to end — the
    * clustering member of the vector family (top-k searches it, centroids
    * summarize it, PQ/IVF index from it; k-means is how real IVF codebooks
    * are trained). Determinism recipe: vectors quantize once to 1e4-scaled
    * BIGINTs, so every distance is a pure-integer `(a−b)²` sum (≤ ~2.6e10,
    * exact in any engine/order), assignment ties break on the smaller
    * cluster id, and the centroid update is `floor(sum/n)` with the sum an
    * associative integer — a double-typed Lloyd iteration diverges across
    * partition counts; this one is bit-identical, so THREE chained
    * iterations hash-match a chained-CTE DuckDB oracle (same anchor trick
    * as `pagerank_topk`). Init = the md5-ordered deterministic sample
    * ([[md5Codebook]] rule), fixed K=8.
    *
    * Scale shape: per iteration ONE narrow mapPartitions pass (broadcast
    * K×dim centroid table, k·dim mult-adds per vector) emitting
    * per-partition partial sums — the shuffle carries partitions·K·dim
    * rows, not the corpus — and the driver holds O(K·dim) longs. At 100 TB
    * that is the textbook scalable Lloyd: corpus scanned K_iter times,
    * never shuffled, centroids metadata-scale. An empty cluster keeps its
    * previous centroid (both engines coalesce identically).
    *
    * Public so ClusteringSpec can drive it with planted fixtures, other K,
    * and different partition counts (the output must be
    * partition-invariant — that is the whole point of the fixed-point
    * arithmetic). Input: any (vec_id, embedding ArrayType(Float)) frame.
    * Output: one row per (cluster, dim) with the final 1e4-scaled centroid
    * and the cluster size under the last assignment. */
  def kmeans(e: DataFrame, k: Int, iters: Int): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val vq = e.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 10000d).cast("long")).as("v"))
    // init: the K vectors sorting first by (md5(vec_id), vec_id) — O(K)
    // driver cost via TakeOrderedAndProject, same rule as md5Codebook
    var cents: Array[Array[Long]] = vq
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k).select("v").as[Array[Long]].collect()
    val dim = cents.head.length
    var lastN = Map.empty[Long, Long]
    val qds = vq.select("vec_id", "v").as[(Long, Array[Long])]
    for (_ <- 1 to iters) {
      val bc = s.sparkContext.broadcast(cents)
      val partials = qds.mapPartitions { it =>
        val cs = bc.value
        val k = cs.length; val dim = cs.head.length
        val sums = Array.ofDim[Long](k, dim)
        val ns = new Array[Long](k)
        it.foreach { case (_, v) =>
          var best = 0; var bestD = Long.MaxValue
          var c = 0
          while (c < k) {
            val cv = cs(c); var d = 0L; var i = 0
            while (i < dim) { val df = v(i) - cv(i); d += df * df; i += 1 }
            if (d < bestD) { bestD = d; best = c } // strict <: tie keeps smaller c
            c += 1
          }
          ns(best) += 1
          val sv = sums(best); var i = 0
          while (i < dim) { sv(i) += v(i); i += 1 }
        }
        (0 until k).iterator.filter(ns(_) > 0).flatMap { c =>
          (0 until dim).iterator.map(d => (c.toLong, (d + 1).toLong, sums(c)(d), ns(c)))
        }
      }.toDF("c", "dim", "s", "n")
      // codebook-sized aggregate: K·dim rows to the driver (metadata scale)
      val upd = partials.groupBy("c", "dim")
        .agg(sum("s").as("s"), sum("n").as("n"))
        .as[(Long, Long, Long, Long)].collect()
      val next = cents.map(_.clone()) // empty cluster keeps its centroid
      upd.groupBy(_._1).foreach { case (c, rows) =>
        val arr = next(c.toInt)
        rows.foreach { case (_, d, sv, n) =>
          arr((d - 1).toInt) = math.floor(sv.toDouble / n.toDouble).toLong
        }
      }
      lastN = upd.map { case (c, _, _, n) => c -> n }.toMap
      cents = next
    }
    val rows = for {
      c <- 0 until k
      d <- 0 until dim
    } yield (c.toLong, (d + 1).toLong, cents(c)(d), lastN.getOrElse(c.toLong, 0L))
    s.createDataset(rows).toDF("cluster", "dim", "centroid_scaled", "n")
      .orderBy("cluster", "dim")
  }

  private val embedKmeans = QueryDef(
    "embed_kmeans",
    (s, dir) => kmeans(emb(s, dir), k = 8, iters = 3),
    Some {
      def iter(i: Int): String = {
        val prev = s"cb${i - 1}"
        s"""d$i AS (SELECT q.vec_id, cb.c,
                CAST(list_sum(list_transform(list_zip(q.v, cb.cv), p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d
              FROM vq q CROSS JOIN $prev cb),
            a$i AS (SELECT vec_id, c FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM d$i) WHERE rn = 1),
            s$i AS (SELECT a.c, e.dim, CAST(sum(e.x) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS n
              FROM a$i a JOIN ex e ON e.vec_id = a.vec_id GROUP BY 1, 2),
            nc$i AS (SELECT c, list(CAST(floor(CAST(sv AS DOUBLE)/n) AS BIGINT) ORDER BY dim) AS cv
              FROM s$i GROUP BY c),
            cb$i AS (SELECT o.c, coalesce(nw.cv, o.cv) AS cv
              FROM $prev o LEFT JOIN nc$i nw ON nw.c = o.c),"""
      }
      s"""WITH vq AS (SELECT vec_id,
               list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
             FROM embeddings),
          ex AS (SELECT vec_id, CAST(unnest(range(1, 65)) AS BIGINT) AS dim, unnest(v) AS x FROM vq),
          cb0 AS (SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) - 1 AS c, v AS cv
             FROM vq ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
          ${iter(1)}
          ${iter(2)}
          ${iter(3)}
          nfin AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM a3 GROUP BY c),
          fin AS (SELECT cb.c, CAST(unnest(range(1, 65)) AS BIGINT) AS dim, unnest(cb.cv) AS centroid_scaled
             FROM cb3 cb)
          SELECT f.c AS cluster, f.dim, f.centroid_scaled, coalesce(nf.n, 0) AS n
          FROM fin f LEFT JOIN nfin nf ON nf.c = f.c
          ORDER BY cluster, dim"""
    },
  )

  /** X70 SemDeDup-style semantic pruning (Abbas et al. 2023): cluster the
    * embedding space (the [[md5Codebook]] cell assignment — one narrow
    * argmax map, the IVF front half), then inside each cell drop every
    * vector that has a LOWER-id near-duplicate (scaled dot ≥ 0.4, the
    * `embed_near_dup` threshold) — keep-first semantics make the decision
    * deterministic without any centroid-distance tie-breaks. Emits the
    * per-cell accounting (members / dropped / kept / min id), the report a
    * curation run ships.
    *
    * Scale: this is the SemDeDup trick itself — the quadratic similarity
    * check is confined WITHIN cells (one equi-join on cell id, Σ per-cell
    * products ≈ N²/k for balanced cells), never across the corpus; in
    * production k grows with the corpus so per-cell membership stays
    * bounded. The fixture's codebook is FIXED at 16 cells, so to keep
    * both engines sf-linear the pairwise screen runs on a PINNED probe
    * slice (`vec_id < 2000` — the whole corpus at sf ≤ 0.1, a fixed-size
    * slice above it; the dedup_recall_report fixed-probe pattern); cell
    * assignment and membership accounting stay full-corpus. The oracle
    * recomputes codebook, assignment, pair similarities, and drops end
    * to end. */
  private val semdedupPrune = QueryDef(
    "semdedup_prune",
    (s, dir) => {
      graft.functions.DotScaled.register(s)
      import s.implicits._
      val e = emb(s, dir)
      val bc = s.sparkContext.broadcast(md5Codebook(e, 16))
      val cell = e.select("vec_id", "embedding").as[(Long, Array[Float])]
        .mapPartitions(_.map { case (id, v) =>
          val best = bc.value.map { case (cid, c) => (cid, dotScaledJvm(c, v)) }
            .minBy { case (cid, sc) => (-sc, cid) }._1
          (id, best, v)
        }).toDF("vec_id", "cell", "emb")
      val probe = cell.filter(col("vec_id") < 2000L)
      val dropped = probe.as("a").join(probe.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.cell").as("cell"), col("b.vec_id").as("vec_id"),
          dotScaled(col("a.emb"), col("b.emb")).as("sim"))
        .filter(col("sim") >= 4000L)
        .select("cell", "vec_id").distinct()
      cell.groupBy("cell")
        .agg(count(lit(1)).as("n_members"), min("vec_id").as("min_member"))
        .join(dropped.groupBy("cell").agg(count(lit(1)).as("nd")), Seq("cell"), "left")
        .select(col("cell"), col("n_members"),
          coalesce(col("nd"), lit(0L)).as("n_dropped"),
          (col("n_members") - coalesce(col("nd"), lit(0L))).as("n_kept"),
          col("min_member"))
        .orderBy("cell")
    },
    Some("""WITH cb AS (SELECT vec_id AS cid, embedding AS ce
                 FROM (SELECT vec_id, embedding,
                              row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
                       FROM embeddings) WHERE rk <= 16),
            asg AS (SELECT e.vec_id, cb.cid,
                    CAST(list_sum(list_transform(list_zip(e.embedding, cb.ce),
                         p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000))) AS BIGINT) AS s
                 FROM embeddings e CROSS JOIN cb),
            cell AS (SELECT vec_id, cid AS cell FROM
                       (SELECT vec_id, cid,
                               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
                        FROM asg) WHERE rn = 1),
            pairs AS (SELECT a.cell, b.vec_id AS vec_id,
                      CAST(list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
                           p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000))) AS BIGINT) AS sim
                 FROM cell a JOIN cell b ON a.cell = b.cell AND a.vec_id < b.vec_id
                      AND a.vec_id < 2000 AND b.vec_id < 2000
                 JOIN embeddings ea ON ea.vec_id = a.vec_id
                 JOIN embeddings eb ON eb.vec_id = b.vec_id),
            dropped AS (SELECT DISTINCT cell, vec_id FROM pairs WHERE sim >= 4000)
            SELECT c.cell, CAST(count(*) AS BIGINT) AS n_members,
                   CAST(count(d.vec_id) AS BIGINT) AS n_dropped,
                   CAST(count(*) - count(d.vec_id) AS BIGINT) AS n_kept,
                   CAST(min(c.vec_id) AS BIGINT) AS min_member
            FROM cell c LEFT JOIN dropped d ON d.cell = c.cell AND d.vec_id = c.vec_id
            GROUP BY 1 ORDER BY 1"""),
  )

  /** X71 embedding-space decontamination — the semantic sibling of
    * `decontaminate_ngrams`: surface-level n-gram overlap misses
    * paraphrased benchmark leakage, so the second pass scores every train
    * vector against the EVAL set in embedding space (label 0 plays the
    * benchmark here) and flags anything with scaled dot ≥ 0.4. Emits
    * every train vector's best eval match + verdict, so threshold
    * sensitivity is auditable, not just the flag count.
    *
    * Scale: the eval set is broadcast (benchmarks are MBs — bounded by
    * construction, the same honesty argument as `decontaminate_ngrams`);
    * the 100 TB train side is scanned once, and best-of is an ASSOCIATIVE
    * struct-min aggregate (map-side partial, one candidate per train id
    * per partition crosses the wire — never a window over all pairs). */
  /** Per-train-vector best-eval-match flags — the core of
    * [[embedDecontaminate]], shared with the cross-channel
    * `decontaminate_agreement` report in [[operators.PipelineOps]]. */
  private[operators] def embedContaminationFlags(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DotScaled.register(s)
    val e = emb(s, dir)
    // The eval split is pinned to the 32 lowest-id label-0 vectors: a
    // benchmark set is bounded by construction (MBs against a 100 TB
    // train side), and pinning its size keeps BOTH engines' train×eval
    // cross sf-LINEAR — the fixture analog of dedup_recall_report's
    // fixed probe set, closing the 100× oracle-timeout gap.
    val ev = broadcast(e.filter(col("label") === 0)
      .orderBy("vec_id").limit(32)
      .select(col("vec_id").as("eval_id"), col("embedding").as("ee")))
    e.filter(col("label") =!= 0)
      .select(col("vec_id"), col("embedding"))
      .crossJoin(ev)
      .select(col("vec_id"), col("eval_id"),
        dotScaled(col("embedding"), col("ee")).as("sim"))
      .groupBy("vec_id")
      .agg(min(struct((-col("sim")).as("ns"), col("eval_id").as("eval_id"))).as("m"))
      .select(col("vec_id"), col("m.eval_id").as("best_eval_id"),
        (-col("m.ns")).as("max_sim_scaled"),
        when(-col("m.ns") >= 4000L, 1L).otherwise(0L).as("contaminated"))
  }

  private val embedDecontaminate = QueryDef(
    "embed_decontaminate",
    (s, dir) => embedContaminationFlags(s, dir).orderBy("vec_id"),
    Some("""WITH ev AS (SELECT vec_id AS eval_id, embedding AS ee FROM embeddings
                        WHERE label = 0 ORDER BY vec_id LIMIT 32),
            tr AS (SELECT vec_id, embedding FROM embeddings WHERE label <> 0),
            s AS (SELECT tr.vec_id, ev.eval_id,
                  CAST(list_sum(list_transform(list_zip(tr.embedding, ev.ee),
                       p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000))) AS BIGINT) AS sim
                  FROM tr CROSS JOIN ev),
            best AS (SELECT vec_id, eval_id, sim FROM
                       (SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, eval_id) AS rn FROM s)
                     WHERE rn = 1)
            SELECT vec_id, eval_id AS best_eval_id, sim AS max_sim_scaled,
                   CAST(CASE WHEN sim >= 4000 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
            FROM best ORDER BY vec_id"""),
  )

  /** X83 ANN recall report — the evaluation artifact every ANN deployment
    * ships beside its index: recall@k of each approximate method against
    * the brute-force ground truth, at each method's own (probe set, k).
    * IVF and LSH are measured at k=3 over probes `vec_id < 10` (their
    * query shapes); PQ at its top-50-nearest-to-probe-0 shape against the
    * exact full-dimension squared-distance top-50. Recall is an exact
    * integer (`hits·10⁴ div truth`), so the whole report — including the
    * three method pipelines AND their ground truths — is recomputed by
    * DuckDB and hash-matched: the oracle composes the already-proven
    * `ann_ivf_topk` / `ann_lsh_topk` / `ann_pq_topk` SQL as CTEs.
    *
    * Scale shape: one plan. The truths reuse [[bruteTopk]] (probe side
    * broadcast, corpus scanned once) and a broadcast-probe exact-distance
    * scan; the methods reuse their own scale paths; the final join keys on
    * (method, qid, neighbor_id) over ≤ |probes|·k rows — report-sized,
    * not corpus-sized. */
  private val annRecallReport = QueryDef(
    "ann_recall_report",
    (s, dir) => {
      graft.functions.DotScaled.register(s)
      import s.implicits._
      val e = emb(s, dir)
      val probe3 = col("vec_id") < 10
      def tagged(name: String, d: DataFrame) =
        d.select(lit(name).as("method"), col("qid"), col("neighbor_id"))
      // exact full-dim scaled squared distance to probe 0, top 50 —
      // per-element rounds are non-negative, so HALF_UP here equals the
      // kernel's Math.round exactly
      val p0 = broadcast(e.filter(col("vec_id") === 0L)
        .select(col("embedding").as("pe")))
      val pqTruth = e.crossJoin(p0)
        .select(col("vec_id").as("neighbor_id"),
          aggregate(
            zip_with(col("embedding"), col("pe"), (x, y) =>
              round((x.cast("double") - y.cast("double")) *
                (x.cast("double") - y.cast("double")) * lit(10000d)).cast("long")),
            lit(0L), (acc, v) => acc + v).as("d"))
        .orderBy(asc("d"), asc("neighbor_id")).limit(50)
        .select(lit(0L).as("qid"), col("neighbor_id"))
      // The IVF/LSH ground truth is the SAME brute-force top-k — compute it
      // once (localCheckpoint to its report-sized ≤ |probes|·k rows) instead
      // of inlining the corpus-scale kernel twice (guide §3.3). The five
      // method/truth pipelines themselves stay LAZY in one composed plan:
      // checkpointing each was tried and REVERTED — six eager sequential
      // materialization jobs cost more than the optimizer time they save
      // (isolated steady-state 1.5–1.9 s lazy vs 2.4–2.7 s checkpointed).
      val truth3 = bruteTopk(e, probe3, 3).localCheckpoint()
      val truths =
        tagged("ivf", truth3)
          .unionAll(tagged("lsh", truth3))
          .unionAll(pqTruth.select(lit("pq").as("method"), col("qid"), col("neighbor_id")))
      val found =
        tagged("ivf", ivfTopk(e, probe3, k = 3, nprobe = 6, codebookK = 16))
          .unionAll(tagged("lsh", md5LshMultiTopk(e, probe3, k = 3,
            tables = 12, bits = 6, dim = 64)))
          .unionAll(pqTopk(e, k = 50, codebookK = 16, subspaces = 4)
            .select(lit("pq").as("method"), lit(0L).as("qid"),
              col("vec_id").as("neighbor_id")))
          .withColumn("hit", lit(1L))
      truths.join(found, Seq("method", "qid", "neighbor_id"), "left")
        .groupBy("method")
        .agg(count(lit(1)).as("n_truth"),
          coalesce(sum("hit"), lit(0L)).as("n_hits"))
        .select(col("method"), col("n_truth"), col("n_hits"),
          expr("n_hits * 10000L div n_truth").as("recall_scaled"))
        .orderBy("method")
    }, {
      // truth CTEs are written directly; the three method pipelines are
      // the EXISTING oracle SELECTs wrapped as CTEs (a CTE body may carry
      // its own WITH), so the report can never drift from the queries it
      // audits
      val ivfSql = annIvfTopk.oracle.get
      val lshSql = annLshTopk.oracle.get
      val pqSql = annPqTopk.oracle.get
      Some(s"""WITH m_ivf AS ($ivfSql),
            m_lsh AS ($lshSql),
            m_pq AS ($pqSql),
            q3 AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
            ts AS (SELECT qid, e.vec_id AS neighbor_id,
                          CAST(list_sum(list_transform(list_zip(qe, e.embedding),
                               p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000)))
                               AS BIGINT) AS score
                   FROM embeddings e, q3 WHERE e.vec_id <> qid),
            truth3 AS (SELECT qid, neighbor_id FROM (
                         SELECT *, row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, neighbor_id) AS rn FROM ts)
                       WHERE rn <= 3),
            p0 AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
            pd AS (SELECT e.vec_id AS neighbor_id,
                          CAST(list_sum(list_transform(list_zip(e.embedding, p0.pe),
                               p -> round((CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                                        * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * 10000)))
                               AS BIGINT) AS d
                   FROM embeddings e CROSS JOIN p0),
            truth_pq AS (SELECT CAST(0 AS BIGINT) AS qid, neighbor_id
                         FROM pd ORDER BY d, neighbor_id LIMIT 50),
            truths AS (SELECT 'ivf' AS method, qid, neighbor_id FROM truth3
                       UNION ALL SELECT 'lsh', qid, neighbor_id FROM truth3
                       UNION ALL SELECT 'pq', qid, neighbor_id FROM truth_pq),
            found AS (SELECT 'ivf' AS method, qid, neighbor_id FROM m_ivf
                      UNION ALL SELECT 'lsh', qid, neighbor_id FROM m_lsh
                      UNION ALL SELECT 'pq', CAST(0 AS BIGINT), vec_id FROM m_pq)
            SELECT t.method,
                   CAST(count(*) AS BIGINT) AS n_truth,
                   CAST(count(f.method) AS BIGINT) AS n_hits,
                   CAST((count(f.method) * 10000) // count(*) AS BIGINT) AS recall_scaled
            FROM truths t LEFT JOIN found f
              ON f.method = t.method AND f.qid = t.qid AND f.neighbor_id = t.neighbor_id
            GROUP BY t.method ORDER BY t.method""")
    },
  )

  /** X86 HARD-NEGATIVE mining — the contrastive-training data op a
    * retrieval/embedding pipeline runs over the same corpus it dedups: for
    * each probe vector, the k most-similar corpus vectors that are NOT
    * near-duplicates (score below the `embed_near_dup` 0.4 threshold —
    * above it the "negative" is a positive in disguise and poisons the
    * loss). Each row also carries the probe's excluded near-dup count, so
    * the mining report doubles as a contamination audit of the negative
    * pool. Ranking and the exclusion boundary both use the scaled-int dot
    * product, so the mined set is bit-identical across engines.
    *
    * Scale: probes broadcast, corpus scanned once into one score stream
    * that forks to (a) the bounded per-partition top-k heap ([[topKPerKey]]
    * — never a global per-key window over raw scores) and (b) a count
    * aggregate of the excluded band; the fork costs a second broadcast
    * scan here (the baseline brute shape, like `cosine_topk`) and rides an
    * IVF/LSH candidate stream unchanged when the corpus outgrows brute
    * force. */
  private val hardNegatives = QueryDef(
    "hard_negatives",
    (s, dir) => {
      graft.functions.DotScaled.register(s)
      val e = emb(s, dir)
      val q = broadcast(
        e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe")))
      val scored = e.crossJoin(q)
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("neighbor_id"),
          dotScaled(col("qe"), col("embedding")).as("score"))
      val nearDups = scored.filter(col("score") >= 4000)
        .groupBy("qid").agg(count(lit(1)).as("n_near_dup"))
      topKPerKey(scored.filter(col("score") < 4000), 5)
        .join(nearDups, Seq("qid"), "left")
        .select(col("qid"), col("neighbor_id"), col("score"), col("rn"),
          coalesce(col("n_near_dup"), lit(0L)).as("n_near_dup"))
        .orderBy("qid", "rn")
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < 10),
            s AS (SELECT qid, e.vec_id AS neighbor_id,
                         CAST(list_sum(list_transform(list_zip(qe, e.embedding),
                              p -> round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000)))
                              AS BIGINT) AS score
                  FROM embeddings e, q WHERE e.vec_id <> qid),
            nd AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_near_dup
                   FROM s WHERE score >= 4000 GROUP BY qid),
            topn AS (SELECT qid, neighbor_id, score,
                            CAST(row_number() OVER (PARTITION BY qid
                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rn
                     FROM s WHERE score < 4000)
            SELECT t.qid, t.neighbor_id, t.score, t.rn,
                   CAST(coalesce(nd.n_near_dup, 0) AS BIGINT) AS n_near_dup
            FROM topn t LEFT JOIN nd USING (qid)
            WHERE t.rn <= 5 ORDER BY t.qid, t.rn"""),
  )

  /** X100 embedding drift — the batch-over-batch monitoring artifact an
    * embedding pipeline publishes: per label, the L1 shift and the worst
    * single-dimension shift between the centroids of two deterministic
    * corpus halves (vec_id parity stands in for "previous slice vs new
    * slice"). A drifting encoder or a changed upstream distribution shows
    * up here before it degrades ANN recall. Same exactness recipe as
    * `embed_centroid` (1e6-scaled integer sums, floor-divided means), so
    * shifts are bit-identical cross-engine.
    *
    * Scale: one exploded scan partial-aggregates to (label, half, dim)
    * rows — bounded by labels·2·dims, independent of corpus size — and
    * every later join/rollup is report-sized. */
  private val embeddingDrift = QueryDef(
    "embedding_drift",
    (s, dir) => {
      val c = emb(s, dir)
        .select(col("label").cast("long").as("label"),
          (col("vec_id") % 2).cast("long").as("half"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("label"), col("half"), (col("pos") + 1).cast("long").as("dim"),
          round(col("x").cast("double") * 1000000d).cast("long").as("v"))
        .groupBy("label", "half", "dim")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .select(col("label"), col("half"), col("dim"),
          floor(col("sv").cast("double") / col("n").cast("double")).cast("long").as("c"))
      val a = c.filter(col("half") === 0L).select(col("label"), col("dim"), col("c").as("ca"))
      val b = c.filter(col("half") === 1L).select(col("label"), col("dim"), col("c").as("cb"))
      a.join(b, Seq("label", "dim"))
        .groupBy("label")
        .agg(sum(abs(col("ca") - col("cb"))).as("l1_shift_scaled"),
          max(abs(col("ca") - col("cb"))).as("max_dim_shift_scaled"),
          count(lit(1)).as("dims"))
        .orderBy("label")
    },
    Some("""WITH ex AS (SELECT CAST(label AS BIGINT) AS label,
                   CAST(vec_id % 2 AS BIGINT) AS half,
                   unnest(range(1, len(embedding)+1)) AS dim,
                   unnest(list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS v
                 FROM embeddings),
            c AS (SELECT label, half, CAST(dim AS BIGINT) AS dim,
                   CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS c
                 FROM ex GROUP BY 1, 2, 3),
            j AS (SELECT a.label, a.dim, a.c AS ca, b.c AS cb
                 FROM c a JOIN c b ON a.label = b.label AND a.dim = b.dim
                 WHERE a.half = 0 AND b.half = 1)
            SELECT label, CAST(sum(abs(ca - cb)) AS BIGINT) AS l1_shift_scaled,
                   CAST(max(abs(ca - cb)) AS BIGINT) AS max_dim_shift_scaled,
                   CAST(count(*) AS BIGINT) AS dims
            FROM j GROUP BY label ORDER BY label"""),
  )

  val defs: Seq[QueryDef] =
    Seq(cosineTopk, embedNorms, annIvfTopk, annLshTopk, annLshMd5Topk, annPqTopk,
      embedNearDup, embedQuantize, embedCentroid, embedKmeans, semdedupPrune,
      embedDecontaminate, annRecallReport, hardNegatives, embeddingDrift)
}
