package graft.icelite

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Metadata retention — the last O(commits) growth in the format. The
  * commit-note log is bounded at `write.metadata.log.max-entries` newest
  * entries, and `write.metadata.delete-after-commit.enabled` +
  * `write.metadata.previous-versions-max` (Iceberg's own property pair)
  * prune old version FILES so metadata/ holds O(window) files on a
  * long-lived table. Readers resolve only through the forward-only hint
  * and time travel reads snapshots from the CURRENT metadata, so neither
  * bound is observable to any query path. */
class MetadataRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def versionFiles(loc: String): Seq[String] = {
    val fs = IceLite.fs(spark, loc)
    val it = fs.listStatus(new Path(loc, "metadata")).toSeq
    it.map(_.getPath.getName).filter(n => n.startsWith("v") && n.endsWith(".json"))
  }

  test("metadata log is bounded at max-entries; history serves the newest window") {
    val loc = Files.createTempDirectory("meta_log_bound").toString + "/t"
    val t = IceLite.create(spark, loc, Seq("id" -> "BIGINT"),
      properties = Map("write.metadata.log.max-entries" -> "10"))
    for (i <- 0 until 25) t.append(Seq(i.toLong).toDF("id"))
    val log = t.meta.metadataLog
    assert(log.size == 10, s"log must hold exactly the newest 10, got ${log.size}")
    // the window is the NEWEST entries, contiguous, ending at the head commit
    assert(log.map(_.version) == log.map(_.version).sorted)
    assert(log.last.version == t.currentVersion)
    assert(log.last.note.startsWith("append"))
    // content untouched by the trim
    assert(t.read().count() == 25L)
    assert(MetaJson.fromJson(MetaJson.toJson(t.meta), t.manifestIO) == t.meta)
  }

  test("delete-after-commit prunes old version files; hint, reads and time travel unaffected") {
    val loc = Files.createTempDirectory("meta_vprune").toString + "/t"
    val t = IceLite.create(spark, loc, Seq("id" -> "BIGINT"),
      properties = Map(
        "write.metadata.delete-after-commit.enabled" -> "true",
        "write.metadata.previous-versions-max" -> "3"))
    for (i <- 0 until 20) t.append(Seq(i.toLong).toDF("id"))
    val early = t.meta.snapshots.head.id
    val files = versionFiles(loc)
    // steady state: {v-3 .. v} = 4 files (each commit deletes the one
    // falling out of the window)
    assert(files.size <= 5, s"expected O(window) version files, got ${files.size}: $files")
    assert(files.contains(s"v${t.currentVersion}.json"))
    assert(!files.contains("v1.json"), "files past the window must be gone")

    // a fresh load resolves through the hint exactly as before
    val t2 = IceLite.load(spark, loc)
    assert(t2.read().count() == 20L)
    // time travel reads snapshots from CURRENT metadata — old version
    // FILES are not part of the query path
    assert(t2.readAsOf(early).count() == 1L)

    // enabling the property LATE catches up (bounded per commit)
    val loc2 = Files.createTempDirectory("meta_vprune_late").toString + "/t"
    val u = IceLite.create(spark, loc2, Seq("id" -> "BIGINT"))
    for (i <- 0 until 15) u.append(Seq(i.toLong).toDF("id"))
    assert(versionFiles(loc2).size == 16, "default keeps the full version history")
    u.setProperties(Map(
      "write.metadata.delete-after-commit.enabled" -> "true",
      "write.metadata.previous-versions-max" -> "2"))
    for (i <- 0 until 3) u.append(Seq((100 + i).toLong).toDF("id"))
    assert(versionFiles(loc2).size < 16,
      "late enablement must start reclaiming old version files")
    assert(IceLite.load(spark, loc2).read().count() == 18L)
  }

  test("budget-bounded catch-up drains the WHOLE backlog — no files stranded below gaps") {
    val loc = Files.createTempDirectory("meta_vprune_floor").toString + "/t"
    val t = IceLite.create(spark, loc, Seq("id" -> "BIGINT"))
    for (i <- 0 until 30) t.append(Seq(i.toLong).toDF("id"))
    assert(versionFiles(loc).size == 31)
    t.setProperties(Map(
      "write.metadata.delete-after-commit.enabled" -> "true",
      "write.metadata.previous-versions-max" -> "2"))
    // catch-up across RELOADED tables: the low-water mark must persist in
    // the metadata (a newest-first walk stops at the first gap its own
    // budget carved and strands v1..v5 forever — the round-12 defect)
    for (i <- 0 until 6) {
      val u = IceLite.load(spark, loc)
      u.append(Seq((100 + i).toLong).toDF("id"))
    }
    val left = versionFiles(loc).map(_.stripPrefix("v").stripSuffix(".json").toInt).sorted
    val cur = IceLite.load(spark, loc).currentVersion
    assert(left.head >= cur - 3,
      s"stranded version files below the window: $left (current v$cur)")
    assert(IceLite.load(spark, loc).read().count() == 36L)
  }
}
