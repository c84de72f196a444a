package graft.icelite

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gate shared between the spec and the update's filter UDF (same JVM in
  * local mode): holds the update's scan open until the racing delete has
  * committed, making the conflict window deterministic instead of a
  * scheduler coin-flip. */
object MorUpdateConflictGate {
  @volatile var latch: CountDownLatch = _
}

/** Deterministic replay of the MoR update-vs-delete race: an update that
  * scanned snapshot S must NOT commit after a merge-on-read DELETE landed
  * on overlapping rows. The delete adds only delete files — every data
  * file of S stays live — so the files-still-live check alone would pass
  * and the update would re-append an updated copy of the deleted row that
  * the delete's positions can never mask (resurrection). The commit-time
  * new-delete-file check must abort instead.
  */
class MorUpdateConflictSpec extends SparkSpec {
  import spark.implicits._

  test("MoR update racing a MoR delete aborts instead of resurrecting the row") {
    val loc = Files.createTempDirectory("mor_upd_conflict").toString + "/t"
    val t = IceLite.create(spark, loc, Seq("id" -> "BIGINT", "v" -> "BIGINT"),
      properties = Map(
        "write.update.mode" -> "merge-on-read",
        "write.delete.mode" -> "merge-on-read"))
    // one data file → the gated scan blocks ONE executor slot, leaving the
    // racing delete the other 31
    t.append(spark.range(0, 100).select(col("id"), (col("id") * 10).as("v")).coalesce(1))

    MorUpdateConflictGate.latch = new CountDownLatch(1)
    val gate = udf { (x: Long) =>
      MorUpdateConflictGate.latch.await(60, TimeUnit.SECONDS); x
    }
    val upd = Future {
      new IceLiteTable(spark, loc).update(gate(col("id")) === 7L, Map("v" -> lit(999L)))
    }
    Thread.sleep(500) // update is now inside its gated scan of snapshot S
    new IceLiteTable(spark, loc).delete(col("id") === 7L) // adds a delete file; data files of S stay live
    MorUpdateConflictGate.latch.countDown()

    intercept[IceLite.ConcurrentRewriteException] { Await.result(upd, 120.seconds) }

    // the deleted row stays deleted — no resurrected updated copy
    val rows = new IceLiteTable(spark, loc).read()
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(!rows.exists(_._1 == 7L), "deleted row resurrected by the racing update")
    assert(!rows.exists(_._2 == 999L), "updated copy of a deleted row leaked")
    assert(rows.size == 99)
    // the documented recovery — re-run the update — now sees the delete
    // and matches nothing
    new IceLiteTable(spark, loc).update(col("id") === 7L, Map("v" -> lit(999L)))
    assert(new IceLiteTable(spark, loc).read().count() == 99)
  }
}
