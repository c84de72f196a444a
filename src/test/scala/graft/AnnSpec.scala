package graft

/** IVF ANN returns a subset of the brute-force candidates with decent
  * recall on the fixture data (SURVEY.md §2.12 X3 scale path).
  */
class AnnSpec extends SparkSpec {

  private def recallOf(name: String): Double = {
    val brute = Registry.queries("cosine_topk")(spark, sf)
      .filter("rn <= 3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Registry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty)
    brute.count(approx.contains).toDouble / brute.size
  }

  test("ann_ivf_topk recall@3 vs brute force >= 0.5") {
    val recall = recallOf("ann_ivf_topk")
    assert(recall >= 0.5, s"recall $recall")
  }

  test("ann_lsh_topk recall@3 vs brute force >= 0.5") {
    val recall = recallOf("ann_lsh_topk")
    assert(recall >= 0.5, s"recall $recall")
  }
}
