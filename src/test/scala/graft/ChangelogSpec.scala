package graft

import java.nio.file.Files

import graft.icelite.IceLite
import org.apache.spark.sql.functions._

/** CDC changelog read: MoR deletes surface without any rewrite, compaction
  * emits nothing, CoW carried rows cancel, empty ranges are empty.
  */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def scratch() =
    Files.createTempDirectory("cdc_spec").toString + "/t"

  private def changes(t: graft.icelite.IceLiteTable, from: Long, to: Long) =
    t.readChangesBetween(from, to)
      .select("id", "v", "_change_type", "_commit_version")
      .as[(Long, Double, String, Long)].collect().toSet

  test("MoR delete surfaces deleted rows as deletes, no rewrite") {
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v")
    val t = IceLite.createFrom(spark, scratch(), df,
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t.append(df)                         // v1
    t.delete(col("id") === 2L)           // v2: MoR positions only
    assert(t.meta.currentSnapshot.get.deleteFiles.nonEmpty, "expected MoR delete files")
    val got = changes(t, 1, 2)
    assert(got == Set((2L, 2.0, "delete", 2L)), s"got $got")
  }

  test("compaction is not a logical change") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val t = IceLite.createFrom(spark, scratch(), df)
    t.append(df.repartition(2))          // v1
    t.compact(target = 1)       // v2: replace
    assert(changes(t, 1, 2).isEmpty, "compaction must emit no changes")
    // and the full range still reports only the original inserts
    val full = changes(t, 0, 2)
    assert(full == Set((1L, 1.0, "insert", 1L), (2L, 2.0, "insert", 1L)), s"got $full")
  }

  test("CoW update emits only the delete+insert pair, carried rows cancel") {
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v")
    val t = IceLite.createFrom(spark, scratch(), df)
    t.append(df)                                       // v1 (single file)
    t.update(col("id") === 3L, Map("v" -> lit(30.0)))  // v2 rewrites the file
    val got = changes(t, 1, 2)
    assert(got == Set((3L, 3.0, "delete", 2L), (3L, 30.0, "insert", 2L)), s"got $got")
  }

  test("empty range yields an empty, correctly-typed frame") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    val t = IceLite.createFrom(spark, scratch(), df)
    t.append(df)
    val ch = t.readChangesBetween(1, 1)
    assert(ch.columns.toSeq ==
      Seq("id", "v", "_change_type", "_commit_version"))
    assert(ch.count() == 0)
  }
}
