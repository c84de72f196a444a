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
    * element (deterministic double ops), then exact Long sum. */
  private def dotScaled(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => round(x.cast("double") * y.cast("double") * lit(10000))),
      lit(0L), (acc, v) => acc + v.cast("long"))

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  /** X3 brute-force cosine/dot top-k: for each probe vector (vec_id < 10),
    * the 5 nearest corpus vectors by scaled dot product. (Fixture vectors
    * are ~unit-norm, so dot ≈ cosine; the scaled-int trick keeps ranking
    * deterministic.) */
  private val cosineTopk = QueryDef(
    "cosine_topk",
    (s, dir) => {
      val e = emb(s, dir)
      val q = broadcast(
        e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe")))
      val scored = e.crossJoin(q)
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("neighbor_id"),
          dotScaled(col("qe"), col("embedding")).as("score"))
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("neighbor_id"))
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },
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
    (s, dir) =>
      emb(s, dir)
        .select(
          col("vec_id"),
          col("label").cast("long").as("label"),
          aggregate(
            transform(col("embedding"), x => round(x.cast("double") * x.cast("double") * lit(10000))),
            lit(0L), (acc, v) => acc + v.cast("long")).as("norm_sq_scaled"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id, CAST(label AS BIGINT) AS label,
            CAST(list_sum(list_transform(embedding,
                 x -> round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 10000))) AS BIGINT)
              AS norm_sq_scaled
            FROM embeddings ORDER BY vec_id"""),
  )

  /** X3 scale path: IVF-style ANN. A deterministic codebook (vectors with
    * vec_id % 50 == 0, i.e. ~N/50 centroids growing with the corpus)
    * partitions the corpus into cells by nearest centroid; each probe
    * searches only its 4 nearest cells (the fixture vectors are uniform
    * random unit vectors — no cluster structure — so nprobe=4 of 10 cells
    * buys ~0.57 recall@3; on real clustered embeddings fewer probes go
    * further). Returns top-3 approximate neighbors per probe. No SQL oracle
    * (cell assignment is engine-side logic); AnnSpec checks recall vs the
    * brute-force result. */
  private val annIvfTopk = QueryDef(
    "ann_ivf_topk",
    (s, dir) => {
      val e = emb(s, dir)
      val centroids = broadcast(
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent")))
      def nearestCells(d: DataFrame, vecCol: String, n: Int, out: String): DataFrame = {
        val w = Window.partitionBy("vec_id").orderBy(col("cscore").desc, col("cent_id"))
        d.crossJoin(centroids)
          .select(d.columns.map(col) :+ col("cent_id") :+
            dotScaled(col(vecCol), col("cent")).as("cscore"): _*)
          .withColumn("crn", row_number().over(w))
          .filter(col("crn") <= n)
          .withColumnRenamed("cent_id", out)
          .drop("cscore", "crn")
      }
      val assigned = nearestCells(e, "embedding", 1, "cell")
      val probes = nearestCells(
        e.filter(col("vec_id") < 10), "embedding", 4, "cell")
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cell"))
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("neighbor_id"))
      probes.join(assigned, Seq("cell"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("neighbor_id"),
          dotScaled(col("qe"), col("embedding")).as("score"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .orderBy("qid", "rn")
    },
    None,
  )

  val defs: Seq[QueryDef] = Seq(cosineTopk, embedNorms, annIvfTopk)
}
