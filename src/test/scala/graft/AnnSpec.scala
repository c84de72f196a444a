package graft

/** IVF ANN returns a subset of the brute-force candidates with decent
  * recall on the fixture data (SURVEY.md §2.12 X3 scale path).
  */
class AnnSpec extends SparkSpec {

  test("ann_ivf_topk recall@3 vs brute force >= 0.5") {
    val brute = Registry.queries("cosine_topk")(spark, sf)
      .filter("rn <= 3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Registry.queries("ann_ivf_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty)
    val recall = brute.count(approx.contains).toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall, brute=$brute approx=$approx")
  }
}
