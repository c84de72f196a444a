package graft

import java.nio.file.Files

import graft.icelite.{Catalog, IceLite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IceLite invariants (SURVEY.md §5.3) the DuckDB oracle can't see:
  * snapshot immutability under later writes, rollback∘rollback identity,
  * compaction multiset preservation, MERGE duplicate-source rejection,
  * expire/orphan filesystem effects, manifest-level partition pruning.
  */
class IceLiteSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(n: String) = Files.createTempDirectory(s"ilspec_$n").toString + "/t"

  private def sample: DataFrame =
    spark.range(0, 100).toDF("id")
      .withColumn("grp", (col("id") % 5).cast("int"))
      .withColumn("amount", (col("id") * 7 % 100).cast("double"))
      .withColumn("d", expr("date_add(date'2024-01-01', cast(id % 90 as int))"))

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("snapshot read is immutable under later writes") {
    val t = IceLite.createFrom(spark, scratch("immut"), sample)
    t.append(sample.filter(col("id") < 50))
    val snap1 = ids(t.readAsOf(1))
    t.append(sample.filter(col("id") >= 50))
    t.update(col("id") < 10, Map("amount" -> lit(0.0)))
    t.delete(col("id") === 20)
    assert(ids(t.readAsOf(1)) == snap1, "snapshot 1 changed under later writes")
    assert(ids(t.read()) == (0L until 100L).filterNot(_ == 20))
  }

  test("rollback twice is identity on content; history grows") {
    val t = IceLite.createFrom(spark, scratch("rb2"), sample)
    t.append(sample.filter(col("id") < 30))
    t.append(sample.filter(col("id") >= 30))
    t.rollbackTo(1)
    val afterOnce = ids(t.read())
    t.rollbackTo(1)
    assert(ids(t.read()) == afterOnce)
    assert(t.meta.snapshots.size == 4)
  }

  test("compaction preserves row multiset and shrinks file count") {
    val t = IceLite.createFrom(spark, scratch("cmp"), sample)
    t.append(sample.repartition(10))
    val before = t.read().groupBy("grp").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(t.meta.currentSnapshot.get.dataFiles.size == 10)
    t.compact(2)
    assert(t.meta.currentSnapshot.get.dataFiles.size <= 2)
    val after = t.read().groupBy("grp").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after == before)
  }

  test("merge rejects duplicate source keys") {
    val t = IceLite.createFrom(spark, scratch("dup"), sample)
    t.append(sample)
    val dupSrc = sample.filter(col("id") === 1).unionAll(sample.filter(col("id") === 1))
    val e = intercept[RuntimeException](t.merge(dupSrc, "id"))
    assert(e.getMessage.contains("duplicate"))
  }

  test("merge is idempotent for pure updates") {
    val t = IceLite.createFrom(spark, scratch("idem"), sample)
    t.append(sample)
    val src = sample.filter(col("id") < 10).withColumn("amount", lit(42.0))
    t.merge(src, "id")
    val once = t.read().orderBy("id").collect().map(_.toSeq).toSeq
    t.merge(src, "id")
    val twice = t.read().orderBy("id").collect().map(_.toSeq).toSeq
    assert(once == twice)
  }

  test("expire deletes replaced files from disk but keeps current snapshot readable") {
    val t = IceLite.createFrom(spark, scratch("exp"), sample)
    t.append(sample)
    t.delete(col("id") < 50) // rewrites files; snapshot-1 files now dead
    // only files NOT carried into the live snapshot may be deleted
    val liveFiles = t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet
    val deadFiles = t.meta.snapshot(1).dataFiles.map(_.path).filterNot(liveFiles)
    assert(deadFiles.nonEmpty, "test needs at least one replaced file")
    t.expireSnapshots(System.currentTimeMillis() + 3600000)
    assert(t.meta.snapshots.size == 1)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    deadFiles.foreach { p =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(p)), s"expired file survives: $p")
    }
    assert(ids(t.read()) == (50L until 100L))
  }

  test("removeOrphanFiles deletes unreferenced files only") {
    val t = IceLite.createFrom(spark, scratch("orph"), sample)
    t.append(sample)
    val loc = t.location
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    val orphan = new org.apache.hadoop.fs.Path(loc, "data/orphan.parquet")
    val out = fs.create(orphan, true); out.write(1); out.close()
    // default grace period: a young unreferenced file may be an in-flight
    // append — must NOT be reclaimed
    assert(t.removeOrphanFiles().isEmpty, "grace period ignored for a young orphan")
    assert(fs.exists(orphan))
    val removed = t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 1000)
    assert(removed.exists(_.endsWith("orphan.parquet")))
    assert(ids(t.read()) == (0L until 100L))
  }

  test("manifest-level partition pruning reads only matching files") {
    val t = IceLite.createFrom(spark, scratch("prune"), sample,
      partition = Seq("grp" -> "identity"))
    t.append(sample)
    val files = t.meta.currentSnapshot.get.dataFiles
    assert(files.forall(_.partition.contains("grp_identity")))
    val pruned = t.read(p => p("grp_identity") == "2")
    assert(ids(pruned) == (0L until 100L).filter(_ % 5 == 2))
  }

  test("schema evolution: old files keep reading after add+rename; type stays") {
    val t = IceLite.createFrom(spark, scratch("evo"), sample)
    t.append(sample.filter(col("id") < 50))
    t.addColumn("tag", "STRING", Some("'legacy'"))
    t.renameColumn("amount", "amt")
    t.append(sample.filter(col("id") >= 50)
      .withColumnRenamed("amount", "amt").withColumn("tag", lit("new")))
    val rows = t.read().select("id", "amt", "tag").orderBy("id").collect()
    assert(rows.length == 100)
    assert(rows.take(50).forall(_.getString(2) == "legacy"))
    assert(rows.drop(50).forall(_.getString(2) == "new"))
    assert(rows.forall(r => !r.isNullAt(1)))
  }

  test("type widening is metadata-only; narrowing rejected") {
    val t = IceLite.createFrom(spark, scratch("widen"),
      spark.range(5).toDF("id").withColumn("n", col("id").cast("int")))
    t.append(spark.range(5).toDF("id").withColumn("n", col("id").cast("int")))
    val filesBefore = t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet
    t.updateColumnType("n", "BIGINT")
    assert(t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet == filesBefore)
    val sch = t.read().schema
    assert(sch("n").dataType == org.apache.spark.sql.types.LongType)
    assert(t.read().agg(sum(col("n"))).head.getLong(0) == 10)
    intercept[IllegalArgumentException](t.updateColumnType("n", "INT"))
  }

  test("merge-on-read delete leaves data files untouched; compact materializes") {
    val t = IceLite.createFrom(spark, scratch("mor"), sample,
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t.append(sample)
    val dataFilesBefore = t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet
    t.delete(col("id") % 3 === 0)
    val after = t.meta.currentSnapshot.get
    assert(after.dataFiles.map(_.path).toSet == dataFilesBefore, "MoR delete rewrote data files")
    assert(after.deleteFiles.nonEmpty)
    assert(ids(t.read()) == (0L until 100L).filterNot(_ % 3 == 0))
    t.compact(1)
    val cm = t.meta.currentSnapshot.get
    assert(cm.deleteFiles.isEmpty, "compaction must materialize deletes")
    assert(ids(t.read()) == (0L until 100L).filterNot(_ % 3 == 0))
  }

  test("catalog lists namespaces and tables; metadata JSON served") {
    val wh = Files.createTempDirectory("ilspec_cat").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("db", "t1", Seq("id" -> "BIGINT"))
    cat.createTable("db", "t2", Seq("id" -> "BIGINT"))
    assert(cat.listNamespaces() == Seq("db"))
    assert(cat.listTables("db") == Seq("t1", "t2"))
    val js = cat.tableMetadataJson("db", "t1")
    assert(js.contains("\"formatVersion\""))
    cat.dropTable("db", "t2")
    assert(cat.listTables("db") == Seq("t1"))
  }

  test("orphaned version file from a crashed writer is skipped after quarantine") {
    val t = IceLite.createFrom(spark, scratch("orphanv"), sample)
    t.append(sample.filter(col("id") < 10))
    // crashed writer: version file exists but the hint never advanced.
    // Backdate it past the quarantine window — a YOUNG file might be a
    // live racer mid-commit and must never be stepped over.
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    val racing = new org.apache.hadoop.fs.Path(t.location, "metadata/v3.json")
    val out = fs.create(racing, false); out.write('x'); out.close()
    fs.setTimes(racing, System.currentTimeMillis() - 600000L, -1)
    t.append(sample.filter(col("id") >= 10)) // must skip aged v3 and land at v4
    assert(t.currentVersion == 4)
    assert(ids(t.read()) == (0L until 100L))
  }

  test("young colliding version file is never stepped over (live-racer safety)") {
    val t = IceLite.createFrom(spark, scratch("youngv"), sample)
    t.append(sample.filter(col("id") < 10))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    val racing = new org.apache.hadoop.fs.Path(t.location, "metadata/v3.json")
    val out = fs.create(racing, false); out.write('x'); out.close()
    // fresh file (inside quarantine): append must fail rather than discard
    // what might be a live writer's in-flight commit
    val e = intercept[RuntimeException](t.append(sample.filter(col("id") >= 10)))
    assert(e.getMessage.contains("retries"), e.getMessage)
    fs.delete(racing, false) // "writer" aborts; now the append goes through
    t.append(sample.filter(col("id") >= 10))
    assert(ids(t.read()) == (0L until 100L))
  }

  test("incremental read returns appended rows; refuses rewrites in range") {
    val t = IceLite.createFrom(spark, scratch("incr"), sample)
    t.append(sample.filter(col("id") < 30))
    t.append(sample.filter(col("id") >= 30 && col("id") < 60))
    t.append(sample.filter(col("id") >= 60))
    assert(ids(t.readAppendedBetween(1, 2)) == (30L until 60L))
    assert(ids(t.readAppendedBetween(1, 3)) == (30L until 100L))
    assert(ids(t.readAppendedBetween(2, 2)) == Seq())
    // MoR delete in range only adds delete files → still readable, and the
    // deleted positions are filtered out of the incremental slice
    t.setProperties(Map("write.delete.mode" -> "merge-on-read")) // no snapshot
    t.delete(col("id") === 40) // snapshot 4 (delete files only)
    assert(ids(t.readAppendedBetween(1, 4)) == (30L until 100L).filterNot(_ == 40))
    // CoW rewrite in range is ambiguous → loud refusal
    t.setProperties(Map("write.delete.mode" -> "copy-on-write"))
    t.delete(col("id") === 50) // snapshot 5 rewrites a file
    val e = intercept[IllegalArgumentException](t.readAppendedBetween(1, 5))
    assert(e.getMessage.contains("ambiguous"))
  }

  test("appendIfNewBatch skips replayed batch ids (exactly-once per batch)") {
    val t = IceLite.createFrom(spark, scratch("batchid"), sample)
    assert(t.appendIfNewBatch(0L, sample.filter(col("id") < 10)))
    assert(t.appendIfNewBatch(1L, sample.filter(col("id") >= 10 && col("id") < 20)))
    // restart replays batch 1: must be a no-op, not a duplicate append
    assert(!t.appendIfNewBatch(1L, sample.filter(col("id") >= 10 && col("id") < 20)))
    assert(!t.appendIfNewBatch(0L, sample.filter(col("id") < 10)))
    assert(ids(t.read()) == (0L until 20L))
    assert(t.appendIfNewBatch(2L, sample.filter(col("id") >= 20 && col("id") < 30)))
    assert(ids(t.read()) == (0L until 30L))
  }

  test("parameterized type narrowing rejected; decimal widening metadata-only") {
    val df = spark.range(5).toDF("id")
      .withColumn("amt", (col("id") * 100 + 42).cast("decimal(10,2)"))
    val t = IceLite.createFrom(spark, scratch("decw"), df)
    t.append(df)
    val filesBefore = t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet
    t.updateColumnType("amt", "DECIMAL(14,4)") // p-s grows, s grows: lossless
    assert(t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet == filesBefore)
    assert(t.read().agg(sum(col("amt"))).head.getDecimal(0).longValue == 1210)
    // the ADVICE regression: same-base parameter NARROWING must be rejected
    intercept[IllegalArgumentException](t.updateColumnType("amt", "DECIMAL(5,0)"))
    intercept[IllegalArgumentException](t.updateColumnType("amt", "DECIMAL(18,14)")) // int digits shrink
    val ts = IceLite.createFrom(spark, scratch("vcw"),
      spark.range(3).toDF("id").withColumn("s", lit("ab")))
    intercept[IllegalArgumentException](ts.updateColumnType("s", "VARCHAR(1)"))
  }

  test("concurrent appends both land via optimistic retry") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = IceLite.createFrom(spark, scratch("race"), sample)
    val f1 = Future(t.append(sample.filter(col("id") < 50)))
    val f2 = Future(t.append(sample.filter(col("id") >= 50)))
    Await.result(f1, 120.seconds); Await.result(f2, 120.seconds)
    assert(t.meta.snapshots.size == 2, s"ops: ${t.meta.snapshots.map(_.operation)}")
    assert(ids(t.read()) == (0L until 100L), "one append lost in the race")
  }
}
