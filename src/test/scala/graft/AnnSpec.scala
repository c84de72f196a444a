package graft

import graft.operators.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality: (a) on the uniform-random fixture vectors (worst case for
  * any ANN index — no cluster structure to exploit) the IVF/LSH variants
  * keep modest recall vs brute force; (b) on PLANTED gaussian clusters —
  * the shape real embedding corpora have — the same knobs reach ≥ 0.9
  * recall, proving the index prunes without losing true neighbors
  * (SURVEY.md §2.12 X3 scale path).
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def recallOf(name: String): Double = {
    val brute = Registry.queries("cosine_topk")(spark, sf)
      .filter("rn <= 3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Registry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty)
    brute.count(approx.contains).toDouble / brute.size
  }

  test("ann_ivf_topk recall@3 vs brute force >= 0.5 on uniform fixtures") {
    val recall = recallOf("ann_ivf_topk")
    assert(recall >= 0.5, s"recall $recall")
  }

  test("ann_lsh_topk recall@3 vs brute force >= 0.5 on uniform fixtures") {
    val recall = recallOf("ann_lsh_topk")
    assert(recall >= 0.5, s"recall $recall")
  }

  /** 5 gaussian clusters of 100 unit vectors; probes vec_id % 200 < 2 draw
    * two queries from EVERY cluster. The md5-ordered codebook is a uniform
    * sample, so at k=25 every 100-point cluster holds several codewords —
    * and any member of a tight cluster serves as its center. */
  private def plantedClusters(dim: Int = 32, sigma: Float = 0.05f,
      perCluster: Int = 100): DataFrame = {
    val rnd = new scala.util.Random(7)
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centers = Array.fill(5)(normalize(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val rows = for (c <- 0 until 5; i <- 0 until perCluster) yield {
      val v = if (i == 0) centers(c)
      else normalize(centers(c).map(x => x + sigma * rnd.nextGaussian().toFloat))
      (c * 2L * perCluster + i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def clusteredRecall(approx: DataFrame, e: DataFrame): Double = {
    val brute = VectorOps.bruteTopk(e, col("vec_id") % 200 < 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = approx.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size == 30, s"expected 10 probes x 3, got ${brute.size}")
    brute.count(got.contains).toDouble / brute.size
  }

  test("IVF recall@3 >= 0.9 on planted clusters at nprobe=2") {
    val e = plantedClusters()
    val recall = clusteredRecall(
      VectorOps.ivfTopk(e, col("vec_id") % 200 < 2, k = 3, nprobe = 2, codebookK = 25), e)
    assert(recall >= 0.9, s"IVF clustered recall $recall < 0.9")
  }

  test("IVF codebook stays size-k when the corpus grows 10x") {
    val small = plantedClusters(perCluster = 100)
    val big = plantedClusters(perCluster = 1000)
    assert(big.count() == 10 * small.count())
    assert(VectorOps.md5Codebook(small, 25).length == 25)
    // the scale property the modulus rule lacked: k is independent of N
    assert(VectorOps.md5Codebook(big, 25).length == 25)
  }

  test("LSH recall@3 >= 0.9 on planted clusters at 8 tables x 4 bits") {
    val e = plantedClusters()
    val recall = clusteredRecall(
      VectorOps.lshTopk(e, col("vec_id") % 200 < 2, k = 3, tables = 8, bits = 4, dim = 32), e)
    assert(recall >= 0.9, s"LSH clustered recall $recall < 0.9")
  }

  test("PQ ADC ranking surfaces the probe's own cluster on planted clusters") {
    // probe = vec 0 = the exact center of cluster 0 (ids 0..99); with a
    // 4-byte code standing in for 32 floats, the top-50 ADC ranking should
    // still be dominated by true cluster members
    val e = plantedClusters()
    val top = VectorOps.pqTopk(e, k = 50, codebookK = 16, subspaces = 4)
      .collect().map(_.getLong(0))
    assert(top.length == 50)
    val inCluster = top.count(_ < 100)
    assert(inCluster >= 45, s"only $inCluster/50 of PQ top-50 are cluster-0 members")
  }

  test("embed_decontaminate flags exactly the planted eval twins") {
    // train 100 == eval 0's vector (contaminated, best match must be 0);
    // train 101 is orthogonal to both eval vectors (clean, sim 0)
    val dir = java.nio.file.Files.createTempDirectory("embdecon").toString
    def basis(p: Int) = Array.tabulate(64)(j => if (j == p) 1f else 0f)
    Seq((0L, basis(0), 0), (1L, basis(1), 0),
        (100L, basis(0), 3), (101L, basis(7), 4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Registry.queries("embed_decontaminate")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((100L, 0L, 10000L, 1L), (101L, 0L, 0L, 0L)))
  }

  test("semdedup_prune drops exactly the planted higher-id duplicates") {
    // 20 identical pairs on orthogonal basis vectors: members of a pair
    // share a cell by construction (identical → identical argmax), members
    // of different pairs have dot 0 < threshold — so exactly the 20
    // higher-id twins must be dropped, and nothing else
    val dir = java.nio.file.Files.createTempDirectory("semdedup").toString
    val vecs = (0 until 20).flatMap { p =>
      val v = Array.tabulate(64)(j => if (j == p) 1f else 0f)
      Seq((2L * p, v), (2L * p + 1, v))
    }
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Registry.queries("semdedup_prune")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum == 40L)
    assert(rows.map(_.getAs[Long]("n_dropped")).sum == 20L,
      "each identical pair must lose exactly its higher id")
    assert(rows.map(_.getAs[Long]("n_kept")).sum == 20L)
  }
}
