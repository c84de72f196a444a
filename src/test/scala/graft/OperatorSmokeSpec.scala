package graft

/** Every registered operator runs on sf0.001 and returns a sane result.
  * (Value-level correctness is the driver's DuckDB-oracle gate; these keep
  * `sbt test` meaningful without DuckDB.)
  */
class OperatorSmokeSpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled query key has matching oracle and runs") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"orphan oracle $k"))
  }

  for (d <- Registry.all) {
    test(s"${d.name} runs on sf0.001") {
      val df = d.fn(spark, sf)
      val n = df.count()
      // pair-finding ops may legitimately find no pairs in the tiny
      // sf0.001 corpus (the oracle still cross-checks the empty result);
      // everything else >0
      val mayBeEmpty = Set("jaccard_pairs", "minhash_dedup",
        "multimodal_phash_near_dup", "multimodal_phash_incremental")
      if (!mayBeEmpty(d.name))
        assert(n > 0, s"${d.name} returned 0 rows")
      assert(df.columns.nonEmpty)
    }
  }
}
