package graft.icelite

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function internals that guard at-scale and security invariants:
  * staged part-file ordering (V3 row-id block determinism past 99,999
  * parts) and REST metadata-location confinement (scheme-only warehouse
  * shapes, traversal). No SparkSession needed.
  */
class InternalsSpec extends AnyFunSuite {

  test("stagedOrderKey orders part files numerically past 99,999") {
    // lexicographic order would put part-100000 BEFORE part-99999,
    // silently reshuffling V3 row-id block assignment on a >100k-file
    // single write
    val names = Seq(
      "/wh/t/.staging/part-100000-uuid-c000.snappy.parquet",
      "/wh/t/.staging/part-00001-uuid-c000.snappy.parquet",
      "/wh/t/.staging/part-99999-uuid-c000.snappy.parquet",
      "/wh/t/.staging/part-00000-uuid-c000.snappy.parquet")
    val sorted = names.sortBy(IceLite.stagedOrderKey)
    assert(sorted.map(_.split("part-")(1).takeWhile(_.isDigit).toLong) ==
      Seq(0L, 1L, 99999L, 100000L))
    // sanity: the lexicographic sort really is wrong here (the guard is
    // not vacuous)
    assert(names.sorted.map(_.split("part-")(1).takeWhile(_.isDigit).toLong) !=
      Seq(0L, 1L, 99999L, 100000L))
  }

  test("stagedOrderKey groups by partition dir first, index second") {
    val names = Seq(
      "/wh/t/.staging/p=b/part-00000-x.parquet",
      "/wh/t/.staging/p=a/part-00001-x.parquet",
      "/wh/t/.staging/p=a/part-00000-x.parquet")
    assert(names.sortBy(IceLite.stagedOrderKey) == Seq(
      "/wh/t/.staging/p=a/part-00000-x.parquet",
      "/wh/t/.staging/p=a/part-00001-x.parquet",
      "/wh/t/.staging/p=b/part-00000-x.parquet"))
    // a file without a parsable part index sorts after numbered ones in
    // its directory — deterministically, by name
    val mixed = Seq("/d/zz.parquet", "/d/part-00002-x.parquet")
    assert(mixed.sortBy(IceLite.stagedOrderKey) ==
      Seq("/d/part-00002-x.parquet", "/d/zz.parquet"))
  }

  test("confinement accepts a scheme-only warehouse (s3://bucket) and keeps blocking traversal") {
    val ok = RestCatalogServer.confinedUnder _
    // scheme+authority with an EMPTY path: locations under it must pass
    assert(ok("s3://bucket", "s3://bucket/wh/db/t/metadata/v3.metadata.json"))
    // the warehouse itself is not strictly under itself
    assert(!ok("s3://bucket", "s3://bucket"))
    // other bucket / other scheme with a matching path shape must fail
    assert(!ok("s3://bucket", "s3://other/wh/db/t/metadata/v3.metadata.json"))
    assert(!ok("s3://bucket", "gs://bucket/wh/db/t/metadata/v3.metadata.json"))
    // traversal out of a scheme-only warehouse cannot escape the root
    assert(ok("s3://bucket", "s3://bucket/a/../b/metadata.json")) // normalizes to /b — still under /
    assert(!ok("s3://bucket/wh", "s3://bucket/wh/../etc/passwd"))
    // local traversal and absolute escapes still rejected
    assert(!ok("/wh", "/wh/../etc/passwd"))
    assert(!ok("/wh", "/etc/passwd"))
    assert(ok("/wh", "/wh/db/t/metadata/v1.metadata.json"))
    // URI-illegal but filesystem-legal (spaces) still commits
    assert(ok("/wh with space", "/wh with space/db/t/metadata/v1.metadata.json"))
    assert(!ok("/wh with space", "/wh with space/../etc/passwd"))
  }
}
