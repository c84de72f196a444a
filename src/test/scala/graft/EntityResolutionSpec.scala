package graft

/** entity_resolution's blocking contract: the block key is chars 6–8 of the
  * name's DIGIT RUN (regex-extracted), so it must not depend on the text
  * layout around the id. TPC-H's fixed `Customer#` prefix made a fixed
  * name offset accidentally work; this spec feeds names whose prefixes
  * vary from 1 to 24 chars (plus punctuation variants) and requires
  * perfect self-resolution — every dirty record survives blocking (block
  * recall 1.0, no inner-join drop) and links back to its own master.
  */
class EntityResolutionSpec extends SparkSpec {

  test("blocking is layout-independent: varying-length prefixes still self-resolve") {
    import spark.implicits._
    val masters = Seq(
      1L  -> "X#000000001",
      2L  -> "LongCorporateVendor#000000002",
      3L  -> "M-000000003",
      10L -> "Shop#000000010",
      11L -> "A.Very.Dotted.Name#000000011",
      12L -> "Q#000000012",
      901L -> "Warehouse#000000901",
      902L -> "zz#000000902",
      903L -> "Mid#Name#000000903",
    )
    val dir = java.nio.file.Files.createTempDirectory("er_names").toString
    masters.toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = Registry.queries("entity_resolution")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // no record lost to a block miss, every one resolves to itself with
    // at most one edit (the perturbation family is 0–1 edits)
    assert(got.length == masters.length,
      s"block recall < 1: ${masters.length - got.length} records dropped")
    got.foreach { case (dKey, matched, dist, isSelf) =>
      assert(matched == dKey && isSelf == 1L, s"$dKey matched $matched")
      assert(dist <= 1L, s"$dKey dist $dist")
    }
  }
}
