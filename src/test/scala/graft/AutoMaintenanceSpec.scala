package graft.icelite

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Table-property auto-maintenance ([[IceLiteTable.autoMaintain]]):
  * crossing a delete-file or small-file threshold self-maintains exactly
  * once per crossing, changelog-silent, race-safe. */
class AutoMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def replaceCount(t: IceLiteTable): Int =
    t.meta.snapshots.count(_.operation == "replace")

  test("crossing the delete-file threshold rewrites position deletes exactly once") {
    val loc = Files.createTempDirectory("automaint_del").toString + "/t"
    val t = IceLite.createFrom(spark, loc, (0L until 100L).toDF("id"),
      properties = Map(
        "write.delete.mode" -> "merge-on-read",
        "maintenance.auto.rewrite-deletes.file-threshold" -> "5"))
    t.append((0L until 100L).toDF("id"))
    val preDeleteSnap = t.meta.currentSnapshotId.get

    // four MoR deletes: below threshold, delete files accumulate untouched
    (0 until 4).foreach(i => t.delete(col("id") === i.toLong))
    assert(t.meta.currentSnapshot.get.deleteFiles.count(_.kind == "pos") == 4)
    assert(replaceCount(t) == 0, "below threshold must not rewrite")

    // the fifth crosses: ONE rewrite fires, collapsing the files to 1
    t.delete(col("id") === 4L)
    assert(t.meta.currentSnapshot.get.deleteFiles.count(_.kind == "pos") == 1,
      "crossing the threshold must merge the delete files")
    assert(replaceCount(t) == 1, "exactly one maintenance commit per crossing")
    assert(t.read().count() == 95)

    // changelog-silent: the CDC feed over the whole span shows ONLY the
    // five logical deletes — the replace snapshot contributes nothing
    val changes = t.readChangesBetween(preDeleteSnap, t.meta.currentSnapshotId.get)
    assert(changes.filter(col("_change_type") === "delete").count() == 5)
    assert(changes.filter(col("_change_type") === "insert").count() == 0)

    // the next deletes accumulate again until the next crossing
    (5 until 8).foreach(i => t.delete(col("id") === i.toLong))
    assert(t.meta.currentSnapshot.get.deleteFiles.count(_.kind == "pos") == 4)
    assert(replaceCount(t) == 1)
  }

  test("crossing the small-file threshold compacts exactly once") {
    val loc = Files.createTempDirectory("automaint_cmp").toString + "/t"
    val t = IceLite.createFrom(spark, loc, (0L until 10L).toDF("id"),
      properties = Map(
        "maintenance.auto.compact.file-threshold" -> "10",
        "maintenance.auto.compact.target-files" -> "2"))
    // two appends of 4 files: 8 < 10, no compaction
    t.append(spark.range(0, 40).toDF("id").repartition(4))
    t.append(spark.range(40, 80).toDF("id").repartition(4))
    assert(replaceCount(t) == 0)
    // the third crosses 10 → self-compacts to the target count, once
    t.append(spark.range(80, 120).toDF("id").repartition(4))
    assert(replaceCount(t) == 1, "exactly one compaction per crossing")
    assert(t.meta.currentSnapshot.get.files.fileCount == 2L)
    assert(t.read().agg(sum("id")).head.getLong(0) == (0L until 120L).sum)
  }

  test("a failed advisory maintenance leaves an observable trace; the next crossing retriggers") {
    val loc = Files.createTempDirectory("automaint_skip").toString + "/t"
    val t = IceLite.createFrom(spark, loc, (0L until 10L).toDF("id"),
      properties = Map(
        "maintenance.auto.compact.file-threshold" -> "6",
        // poisoned policy: compact(0) throws into the advisory catch
        "maintenance.auto.compact.target-files" -> "0"))
    t.append(spark.range(0, 70).toDF("id").repartition(7))
    assert(replaceCount(t) == 0, "poisoned maintenance must not commit a rewrite")
    val skip = t.meta.properties.get("maintenance.last-skip")
    assert(skip.nonEmpty, "a skipped maintenance must leave a table-metadata trace")
    assert(t.meta.metadataLog.exists(_.note.startsWith("auto-maintenance skipped")),
      "the skip must appear in the metadata history log")

    // heal the policy: the NEXT crossing commit retriggers and succeeds
    t.setProperties(Map("maintenance.auto.compact.target-files" -> "2"))
    t.append(spark.range(70, 80).toDF("id").repartition(1))
    assert(replaceCount(t) == 1, "healed policy must retrigger on the next crossing")
    assert(t.meta.currentSnapshot.get.files.fileCount == 2L)
    assert(t.read().agg(sum("id")).head.getLong(0) == (0L until 80L).sum)
  }

  test("racing appends across the threshold still compact exactly once") {
    val loc = Files.createTempDirectory("automaint_race").toString + "/t"
    val t0 = IceLite.createFrom(spark, loc, (0L until 10L).toDF("id"),
      properties = Map(
        "maintenance.auto.compact.file-threshold" -> "6",
        "maintenance.auto.compact.target-files" -> "2",
        "commit.orphan-quarantine-ms" -> "3600000"))
    t0.append(spark.range(0, 40).toDF("id").repartition(4))
    assert(replaceCount(t0) == 0)
    // two racing appends of 3 files each: whichever interleaving the
    // scheduler picks, the threshold is crossed and exactly one writer's
    // maintenance lands (the loser collides or re-checks below threshold)
    val f1 = Future(new IceLiteTable(spark, loc)
      .append(spark.range(40, 70).toDF("id").repartition(3)))
    val f2 = Future(new IceLiteTable(spark, loc)
      .append(spark.range(70, 100).toDF("id").repartition(3)))
    Await.result(f1, 120.seconds); Await.result(f2, 120.seconds)
    val t = new IceLiteTable(spark, loc)
    assert(replaceCount(t) == 1,
      s"racing crossings must self-compact exactly once; ops=${t.meta.snapshots.map(_.operation)}")
    assert(t.read().agg(sum("id")).head.getLong(0) == (0L until 100L).sum,
      "maintenance must never lose rows")
  }
}
