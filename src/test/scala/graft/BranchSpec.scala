package graft

import java.nio.file.Files

import graft.icelite.IceLite
import org.apache.spark.sql.functions._

/** Branches, tags, and write-audit-publish: named refs share the snapshot
  * log (metadata-only, zero data copy); branches are movable heads, tags
  * immutable pins; publish = fast-forward of main with an ancestry check.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(n: String) = {
    val loc = Files.createTempDirectory(s"branch_$n").toString + "/t"
    val df = spark.range(0, 100).toDF("id").withColumn("v", col("id") * 2)
    val t = IceLite.createFrom(spark, loc, df)
    t.append(df)
    t
  }

  test("branch append stays invisible to main until fast-forward publish") {
    val t = mkTable("wap")
    t.createBranch("stage")
    t.appendToBranch("stage", spark.range(100, 150).toDF("id").withColumn("v", col("id") * 2))
    assert(t.read().count() == 100, "main must not see staged rows")
    assert(t.readRef("stage").count() == 150)
    t.fastForward("stage")
    assert(t.read().count() == 150)
    // refs survive the metadata JSON roundtrip
    val re = IceLite.load(spark, t.location)
    assert(re.meta.refs("stage").refType == "branch")
  }

  test("publish is rejected when main advanced since the branch was cut") {
    val t = mkTable("conflict")
    t.createBranch("stage")
    t.appendToBranch("stage", Seq((200L, 400L)).toDF("id", "v"))
    t.append(Seq((300L, 600L)).toDF("id", "v")) // main moves independently
    val e = intercept[Exception](t.fastForward("stage"))
    assert(e.getMessage.contains("not an ancestor"))
    assert(t.read().count() == 101, "failed publish must not change main")
  }

  test("tags are immutable pins; branches reject appends to tags") {
    val t = mkTable("tags")
    val v1 = t.meta.currentSnapshotId.get
    t.createTag("v1", v1)
    t.append(Seq((500L, 1000L)).toDF("id", "v"))
    assert(t.readRef("v1").count() == 100, "tag must pin the old snapshot")
    assert(t.read().count() == 101)
    val e = intercept[Exception](
      t.appendToBranch("v1", Seq((1L, 2L)).toDF("id", "v")))
    assert(e.getMessage.contains("tag"))
    intercept[Exception](t.fastForward("v1"))
  }

  test("expire keeps every ref head alive regardless of age") {
    val t = mkTable("expire")
    t.createBranch("keepme")
    t.appendToBranch("keepme", Seq((900L, 1800L)).toDF("id", "v"))
    t.append(Seq((901L, 1802L)).toDF("id", "v"))
    t.append(Seq((902L, 1804L)).toDF("id", "v"))
    val headId = t.meta.refs("keepme").snapshotId
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 3600000)
    val ids = t.meta.snapshots.map(_.id).toSet
    assert(ids.contains(headId), "branch head expired")
    assert(t.readRef("keepme").count() == 101, "branch read broken") // 100 base + 1 staged
    assert(t.read().count() == 102)
  }

  /** Schema evolution × refs: a TAG cut before DDL reads through its own
    * snapshot's schema (immutable pin, like time travel), while a BRANCH
    * — a moving write target — always reads through the CURRENT schema
    * (field-id mapping fills the added column's default and applies the
    * rename to old data). */
  test("tags pin the pre-evolution schema; branches read the current one") {
    val t = mkTable("evo")
    t.createTag("before-ddl", t.meta.currentSnapshotId.get)
    t.createBranch("old-shape")
    t.addColumn("score", "BIGINT", Some("7"))
    t.renameColumn("v", "val2")
    // the tag reads the ORIGINAL two-column shape...
    assert(t.readRef("before-ddl").columns.toSeq == Seq("id", "v"))
    // ...but the stale branch reads the evolved shape via field-id mapping
    val ob = t.readRef("old-shape")
    assert(ob.columns.toSeq == Seq("id", "val2", "score"))
    assert(ob.filter(col("score") =!= 7L).count() == 0)
    // main reads the evolved shape, default materialized at read time
    assert(t.read().columns.toSeq == Seq("id", "val2", "score"))
    assert(t.read().filter(col("score") =!= 7L).count() == 0)
    // a branch APPEND after the DDL writes/reads the evolved shape
    t.createBranch("new-shape")
    t.appendToBranch("new-shape",
      spark.range(100, 110).toDF("id")
        .withColumn("val2", col("id") * 2).withColumn("score", lit(9L)))
    val nb = t.readRef("new-shape")
    assert(nb.columns.toSeq == Seq("id", "val2", "score"))
    assert(nb.filter(col("score") === 9L).count() == 10)
    assert(nb.count() == 110)
    // publishing the evolved branch keeps every row + the default fill
    t.fastForward("new-shape")
    assert(t.read().count() == 110)
    assert(t.read().filter(col("score") === 7L).count() == 100)
    // and the tag STILL reads the original shape after all of it
    assert(t.readRef("before-ddl").columns.toSeq == Seq("id", "v"))
    assert(t.readRef("before-ddl").count() == 100)
  }

  test("dropColumn on main never disturbs a tag's historical read") {
    val t = mkTable("drop")
    t.createTag("keep", t.meta.currentSnapshotId.get)
    t.dropColumn("v")
    assert(t.read().columns.toSeq == Seq("id"))
    val tag = t.readRef("keep")
    assert(tag.columns.toSeq == Seq("id", "v"))
    assert(tag.agg(sum(col("v"))).head.getLong(0) == (0 until 100).map(_ * 2).sum)
  }

  test("ref name validation and duplicate rejection") {
    val t = mkTable("names")
    intercept[Exception](t.createBranch("main"))
    intercept[Exception](t.createBranch("bad name"))
    t.createBranch("ok-1")
    intercept[Exception](t.createBranch("ok-1"))
    t.dropRef("ok-1")
    intercept[Exception](t.readRef("ok-1"))
  }
}
