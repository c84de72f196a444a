package graft.icelite

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bitmap deletion vectors ([[DvCodec]], `write.delete.vector.enabled`) —
  * the V3 representation the reference describes (README.md:1098–1108:
  * delete info held in bitmap form, applied at read). The carrier must be
  * invisible to every query path: reads, changelog, rewrite and
  * concurrency validation behave identically to parquet position deletes,
  * while contiguous delete ranges cost O(runs) on disk. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tag: String, dv: Boolean): IceLiteTable = {
    val loc = Files.createTempDirectory(s"dv_$tag").toString + "/t"
    val props = Map("write.delete.mode" -> "merge-on-read") ++
      (if (dv) Map("write.delete.vector.enabled" -> "true") else Map())
    val t = IceLite.createFrom(spark, loc,
      Seq((0L, 0L)).toDF("id", "v"), properties = props)
    t.append(spark.range(0, 1000).select(col("id"), (col("id") * 3).as("v"))
      .repartition(4))
    t
  }

  test("DV codec: runs round-trip, header answers without blob reads, seek isolates one file") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = Files.createTempDirectory("dv_codec").toString
    // mixed shapes: contiguous run, singletons, interleaved
    val a = (100L until 200L).toArray           // one run
    val b = Array(1L, 5L, 6L, 7L, 99L)          // three runs
    val c = Array(0L)                           // one run
    assert(DvCodec.toRuns(a).toSeq == Seq(100L, 100L))
    assert(DvCodec.toRuns(b).toSeq == Seq(1L, 1L, 5L, 3L, 99L, 1L))
    val p = new Path(s"$dir/x${DvCodec.Ext}")
    DvCodec.write(p, Seq("fA" -> a, "fB" -> b, "fC" -> c), conf)
    assert(DvCodec.header(p, conf).map(e => (e._1, e._2)) ==
      Seq(("fA", 100L), ("fB", 5L), ("fC", 1L)))
    assert(DvCodec.positionsFor(p, conf, "fB").toSeq == b.toSeq)
    assert(DvCodec.positionsFor(p, conf, "fA").toSeq == a.toSeq)
    assert(DvCodec.positionsFor(p, conf, "missing").isEmpty)
    assert(DvCodec.expand(p, conf).size == 106)
    // spelling-insensitive probe: ONE header parse matches any key in the
    // set (the DeleteIndex path for adopted foreign spellings)
    assert(DvCodec.runsForAny(p, conf, Set("file:fB", "fB")).toSeq
      == Seq(1L, 1L, 5L, 3L, 99L, 1L))
    assert(DvCodec.runsForAny(p, conf, Set("nope", "missing")).isEmpty)
  }

  test("DV codec hardening: modified-UTF-8 paths seek exactly; expand decouples from the handle; runs probe") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = Files.createTempDirectory("dv_codec_hard").toString
    // writeUTF emits MODIFIED UTF-8 (supplementary chars = 6 bytes vs
    // standard UTF-8's 4; NUL = 2 bytes vs 1) — the reader derives the
    // blob offset from bytes CONSUMED, so exotic paths cannot skew the
    // seek into a neighboring blob
    val pathA = "data/f_😀_\u0000.parquet" // surrogate pair + NUL
    val pathB = "data/f_é߿.parquet"        // 2-byte class chars
    val a = Array(3L, 4L, 5L, 100L)
    val b = Array(7L)
    val p = new Path(s"$dir/u${DvCodec.Ext}")
    DvCodec.write(p, Seq(pathA -> a, pathB -> b), conf)
    assert(DvCodec.positionsFor(p, conf, pathB).toSeq == Seq(7L),
      "blob seek skewed by modified-UTF-8 header length")
    assert(DvCodec.positionsFor(p, conf, pathA).toSeq == a.toSeq)
    // the scan path consumes RUNS (packed [start,len]*), never expansions
    assert(DvCodec.runsFor(p, conf, pathA).toSeq == Seq(3L, 3L, 100L, 1L))
    assert(DvCodec.runContains(Array(3L, 3L, 100L, 1L), 5L))
    assert(!DvCodec.runContains(Array(3L, 3L, 100L, 1L), 6L))
    assert(DvCodec.runContains(Array(3L, 3L, 100L, 1L), 100L))
    assert(!DvCodec.runContains(Array(3L, 3L, 100L, 1L), 101L))
    // a DENSE delete set stays O(runs): one run describes a million kills
    val dense = DvCodec.toRuns((0L until 1000000L).toArray)
    assert(dense.length == 2)
    assert(DvCodec.mergeRuns(Seq(Array(0L, 10L), Array(5L, 10L), Array(20L, 1L))).toSeq
      == Seq(0L, 15L, 20L, 1L))
    // expand() reads the container EAGERLY and closes before returning the
    // iterator — a partial consumer can't leak the handle; proof: delete
    // the file mid-iteration and the remaining positions still stream
    val it = DvCodec.expand(p, conf)
    assert(it.next()._2 == 3L)
    org.apache.hadoop.fs.FileSystem.get(p.toUri, conf).delete(p, false)
    assert(it.toSeq.map(_._2) == Seq(4L, 5L, 100L, 7L))
  }

  test("DV-mode DELETE and UPDATE equal the parquet-delete twin; .ildv files carry the deletes") {
    val tp = mk("pq", dv = false)
    val tv = mk("dv", dv = true)
    for (t <- Seq(tp, tv)) {
      t.delete(col("id") >= 300 && col("id") < 500) // contiguous range: RLE's case
      t.delete(col("id") % 97 === 0)                // scattered singletons
      t.update(col("id") === 777L, Map("v" -> lit(-1L)))
    }
    val want = tp.read().select("id", "v").as[(Long, Long)].collect().toSet
    val got = tv.read().select("id", "v").as[(Long, Long)].collect().toSet
    assert(got == want, "DV reads must equal the parquet-delete twin exactly")
    val dels = tv.meta.currentSnapshot.get.deleteFiles.filter(_.kind == "pos")
    assert(dels.nonEmpty && dels.forall(_.path.endsWith(DvCodec.Ext)),
      s"DV mode must write .ildv carriers, got ${dels.map(_.path)}")
    assert(dels.forall(d => d.pathLo.isDefined && d.pathHi.isDefined),
      "DV entries must carry path-range summaries for delete-manifest pruning")
    // fresh load exercises the executor-side DV resolution end-to-end
    assert(IceLite.load(spark, tv.location).read().count() == want.size.toLong)
  }

  test("changelog over DV deletes reports the same rows as the parquet twin") {
    val tp = mk("cpq", dv = false)
    val tv = mk("cdv", dv = true)
    for (t <- Seq(tp, tv)) t.delete(col("id") >= 100 && col("id") < 120)
    def changes(t: IceLiteTable): Set[(String, Long)] = {
      val snaps = t.meta.snapshots.map(_.id)
      t.readChangesBetween(snaps(snaps.size - 2), snaps.last)
        .select(col("_change_type"), col("id")).as[(String, Long)].collect().toSet
    }
    assert(changes(tv) == changes(tp))
    assert(changes(tv).count(_._1 == "delete") == 20)
  }

  test("rewritePositionDeletes merges DV containers, honoring the table's carrier") {
    val t = mk("rw", dv = true)
    (0 until 4).foreach(i => t.delete(col("id") === (i * 50).toLong))
    val before = t.meta.currentSnapshot.get.deleteFiles.filter(_.kind == "pos")
    assert(before.size >= 4 && before.forall(_.path.endsWith(DvCodec.Ext)))
    assert(t.rewritePositionDeletes())
    val after = t.meta.currentSnapshot.get.deleteFiles.filter(_.kind == "pos")
    assert(after.size == 1 && after.head.path.endsWith(DvCodec.Ext),
      s"a DV-enabled table's rewrite must merge into ONE DV container, " +
        s"got ${after.map(_.path)}")
    assert(t.read().select("id").as[Long].collect().toSet ==
      ((0L until 1000L).toSet -- Set(0L, 50L, 100L, 150L)))

    // a table that DISABLES the property afterwards rewrites back to the
    // canonical parquet — the migration path out of DVs
    t.delete(col("id") === 999L)
    t.setProperties(Map("write.delete.vector.enabled" -> "false"))
    assert(t.rewritePositionDeletes())
    val back = t.meta.currentSnapshot.get.deleteFiles.filter(_.kind == "pos")
    assert(back.size == 1 && back.head.path.endsWith(".parquet"),
      s"disabling DVs must migrate the carrier back on rewrite, got ${back.map(_.path)}")
    assert(t.read().select("id").as[Long].collect().toSet ==
      ((0L until 1000L).toSet -- Set(0L, 50L, 100L, 150L, 999L)))
  }

  test("a contiguous-range DV is materially smaller than its parquet twin") {
    // range-clustered single file: a predicate range deletes CONTIGUOUS
    // positions — the shape RLE exists for (hash-partitioned files would
    // scatter positions and both carriers degrade to O(positions))
    def mkClustered(tag: String, dv: Boolean): IceLiteTable = {
      val loc = Files.createTempDirectory(s"dv_$tag").toString + "/t"
      val props = Map("write.delete.mode" -> "merge-on-read") ++
        (if (dv) Map("write.delete.vector.enabled" -> "true") else Map())
      val t = IceLite.createFrom(spark, loc,
        Seq((0L, 0L)).toDF("id", "v"), properties = props)
      t.append(spark.range(0, 1000).select(col("id"), (col("id") * 3).as("v"))
        .coalesce(1).sortWithinPartitions("id"))
      t
    }
    val tp = mkClustered("szpq", dv = false)
    val tv = mkClustered("szdv", dv = true)
    for (t <- Seq(tp, tv)) t.delete(col("id") >= 200 && col("id") < 800)
    def delBytes(t: IceLiteTable): Long = {
      val f = IceLite.fs(spark, t.location)
      t.meta.currentSnapshot.get.deleteFiles.filter(_.kind == "pos")
        .map(d => f.getFileStatus(new Path(d.path)).getLen).sum
    }
    val (pq, dv) = (delBytes(tp), delBytes(tv))
    assert(dv * 5 < pq,
      s"600 contiguous positions must RLE far below parquet rows: dv=$dv pq=$pq")
  }
}
