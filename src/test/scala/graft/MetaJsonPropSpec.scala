package graft

import graft.icelite._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: the metadata JSON serde is a total roundtrip — any table state
  * the engine can construct survives toJson∘fromJson unchanged. This is
  * the durability contract: a metadata file written today must parse
  * identically forever.
  */
class MetaJsonPropSpec extends AnyFunSuite {

  private val genField = for {
    id <- Gen.choose(1, 500)
    name <- Gen.identifier.suchThat(_.nonEmpty).map(_.take(20))
    dtype <- Gen.oneOf("BIGINT", "DOUBLE", "STRING", "DATE", "TIMESTAMP", "DECIMAL(10,2)")
    default <- Gen.option(Gen.oneOf("0.05", "'x'", "NULL"))
  } yield Field(id, name, dtype, default)

  private val genSchema = for {
    sid <- Gen.choose(0, 10)
    fields <- Gen.nonEmptyListOf(genField).map(_.take(8))
  } yield TableSchema(sid, fields)

  private val genSpec = for {
    sid <- Gen.choose(0, 5)
    fields <- Gen.listOf(for {
      src <- Gen.choose(1, 500)
      tr <- Gen.oneOf("identity", "year", "month", "day", "bucket[16]")
      n <- Gen.identifier.map(_.take(12))
    } yield SpecField(src, tr, n)).map(_.take(3))
  } yield PartitionSpec(sid, fields)

  private val genDataFile = for {
    path <- Gen.identifier.map(p => s"/data/$p.parquet")
    rows <- Gen.choose(0L, 1000000L)
    sid <- Gen.choose(0, 10)
    spec <- Gen.choose(0, 5)
    part <- Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(8)), Gen.alphaNumStr.map(_.take(8))))
      .map(_.take(3))
    seq <- Gen.choose(0L, 50L)
  } yield DataFile(path, rows, sid, spec, part, seq = seq)

  private val genSnapshot = for {
    id <- Gen.choose(1L, 1000L)
    parent <- Gen.option(Gen.choose(1L, 1000L))
    ts <- Gen.choose(0L, 2000000000000L)
    op <- Gen.oneOf("append", "delete", "update", "merge", "replace", "rollback", "overwrite")
    dfs <- Gen.listOf(genDataFile).map(_.take(5))
    dels <- Gen.listOf(for {
      p <- Gen.identifier
      r <- Gen.choose(0L, 9999L)
      kind <- Gen.oneOf("pos", "eq")
      fids <- if (kind == "eq") Gen.nonEmptyListOf(Gen.choose(1, 500)).map(_.take(3))
              else Gen.const(List[Int]())
      seq <- Gen.choose(0L, 50L)
    } yield DeleteFile(s"/del/$p.parquet", r, kind, fids, seq)).map(_.take(3))
  } yield Snapshot(id, parent, ts, op, dfs, dels)

  private val genMeta: Gen[TableMetadata] = for {
    schemas <- Gen.nonEmptyListOf(genSchema).map(_.take(4))
    specs <- Gen.nonEmptyListOf(genSpec).map(_.take(3))
    props <- Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(12)), Gen.alphaNumStr.map(_.take(12))))
      .map(_.take(4))
    curSnap <- Gen.option(Gen.choose(1L, 1000L))
    snaps <- Gen.listOf(genSnapshot).map(_.take(5))
    log <- Gen.listOf(Gen.zip(Gen.choose(1, 99), Gen.choose(0L, 2000000000000L), Gen.alphaNumStr.map(_.take(20)))
      .map { case (v, t, n) => MetadataLogEntry(v, t, n) }).map(_.take(5))
  } yield TableMetadata(
    "/wh/t", 500, schemas.head.schemaId, schemas, specs.head.specId, specs,
    props, curSnap, snaps, log)

  test("toJson/fromJson roundtrip is identity for arbitrary metadata") {
    // no scalatest-scalacheck bridge in the offline deps → drive the
    // generator directly over 300 deterministic seeds
    val params = Gen.Parameters.default
    (1 to 300).foreach { i =>
      val m = genMeta(params, Seed(i.toLong))
        .getOrElse(sys.error(s"gen failed at seed $i"))
      val back = MetaJson.fromJson(MetaJson.toJson(m))
      assert(back == m, s"roundtrip mismatch at seed $i:\n$m\nvs\n$back")
    }
  }
}
