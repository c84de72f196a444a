package graft.icelite

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized SEQUENTIAL maintenance-interplay property test: equality
  * deletes × compaction × snapshot expiry × time travel, the delete-file
  * lifecycle complement to ConcurrencyStressSpec's racing-writer rounds.
  *
  * Each schedule drives one fresh table through a random op sequence
  * (append fresh keys | eq-delete a live key | re-insert a deleted key |
  * eq-upsert a live key | compact | expire-keep-recent) while a driver-side
  * model replays the same ops serially. Invariants, checked after EVERY op:
  *
  *   - `read()` equals the model's live key set — in particular, compact
  *     after an eq delete must NOT resurrect deleted rows (rewritten files
  *     take a fresh sequence number above every delete's), and a
  *     re-inserted key must survive the older delete (seq scoping);
  *   - every RETAINED snapshot time-travels to the exact key set the model
  *     recorded when that snapshot committed — after an expire this fails
  *     unless eq-delete files referenced by live snapshots were kept
  *     (expire's shared-file guard) and their sequence scoping still
  *     resolves through the old snapshot.
  *
  * 100 schedules × 7 ops, deterministic seeds.
  */
class MaintenanceInterplaySpec extends SparkSpec {
  import spark.implicits._

  private def readIds(t: IceLiteTable): Set[Long] =
    t.read().collect().map(_.getLong(0)).toSet

  test("100 random eq-delete/compact/expire schedules replay serially at every snapshot") {
    for (schedule <- 0 until 100) {
      val rnd = new scala.util.Random(1000 + schedule)
      val loc = Files.createTempDirectory(s"maint_$schedule").toString + "/t"
      val t = IceLite.create(spark, loc, Seq("id" -> "BIGINT"))
      t.append((0L until 20L).toDF("id"))

      var live: Set[Long] = (0L until 20L).toSet
      var deleted: Set[Long] = Set()
      var nextFresh = 100L
      // (snapshotId, expected key set as of that snapshot)
      var snapStates: Vector[(Long, Set[Long])] =
        Vector(t.meta.currentSnapshotId.get -> live)
      def record(): Unit =
        snapStates :+= (t.meta.currentSnapshotId.get -> live)

      for (_ <- 0 until 7) {
        rnd.nextInt(6) match {
          case 0 => // append a fresh disjoint range
            val r = nextFresh until nextFresh + 5
            nextFresh += 5
            t.append(r.toDF("id")); live ++= r; record()
          case 1 if live.nonEmpty => // eq-delete a live key
            val victim = live.toIndexedSeq(rnd.nextInt(live.size))
            t.deleteEq(Seq(victim).toDF("id"))
            live -= victim; deleted += victim; record()
          case 2 if deleted.nonEmpty => // re-insert: newer seq outlives the delete
            val back = deleted.toIndexedSeq(rnd.nextInt(deleted.size))
            t.append(Seq(back).toDF("id"))
            live += back; deleted -= back; record()
          case 3 if live.nonEmpty => // eq-upsert an existing key: set-neutral
            val k = live.toIndexedSeq(rnd.nextInt(live.size))
            t.upsertEq(Seq(k).toDF("id"), Seq("id")); record()
          case 4 => // compact: content-neutral, materializes deletes
            t.compact(2); record()
          case _ => // expire all but the 2 newest timestamps (+ pinned)
            val ts = t.meta.snapshots.map(_.timestampMs).sorted
            if (ts.size > 2) {
              t.expireSnapshots(ts.takeRight(2).head)
              val retained = t.meta.snapshots.map(_.id).toSet
              snapStates = snapStates.filter(p => retained.contains(p._1))
            }
        }
        assert(readIds(t) == live,
          s"schedule $schedule: live read diverged from the serial model")
      }

      // time travel: every retained snapshot replays to its recorded state
      val retained = t.meta.snapshots.map(_.id).toSet
      for ((sid, expect) <- snapStates if retained.contains(sid)) {
        val got = t.readAsOf(sid).collect().map(_.getLong(0)).toSet
        assert(got == expect,
          s"schedule $schedule snapshot $sid: time travel diverged — " +
            s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
      }
    }
  }

  test("two racing native appends both land via auto-rebase — no manual retry") {
    // file adds commute, so an append that loses the version race must
    // REBASE onto the winner's state inside commitWithRetry — never
    // surface a conflict to the caller. Two INDEPENDENT table handles
    // (the two-writer shape: separate sessions/processes), released on a
    // barrier so both load the same base version before committing.
    val loc = Files.createTempDirectory("race_append").toString + "/t"
    IceLite.create(spark, loc, Seq("id" -> "BIGINT"))
    val wA = IceLite.load(spark, loc)
    val wB = IceLite.load(spark, loc)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    def run(w: IceLiteTable, lo: Long): java.util.concurrent.Future[Unit] =
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          barrier.await()
          w.append((lo until lo + 100L).toDF("id").coalesce(1))
        }
      })
    try {
      val (fa, fb) = (run(wA, 0L), run(wB, 1000L))
      fa.get(120, java.util.concurrent.TimeUnit.SECONDS) // throws on conflict
      fb.get(120, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdown()
    val t = IceLite.load(spark, loc)
    assert(readIds(t) == ((0L until 100L) ++ (1000L until 1100L)).toSet,
      "both racing appends must land")
    assert(t.meta.snapshots.size == 2, "each append is its own snapshot")
    // the rebased loser chained onto the winner, not onto the stale base
    assert(t.meta.snapshots.last.parentId.contains(t.meta.snapshots.head.id))
    // disjoint V3 row-id blocks survived the rebase
    val ids = t.readRowLineage().select(col(IceLite.RowIdCol))
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 200L).toSet,
      s"row-id blocks must stay disjoint under the race, got ${ids.size} distinct")
  }
}
