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

  test("random eq-delete/compact/expire schedules replay serially at every snapshot") {
    for (schedule <- 0 until graft.LoadTests.n(100, 6)) {
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

  test("random native-commit/expire schedules keep the FOREIGN-ID lifecycle exact across the remap horizon") {
    // the mint-skip + expire-prune + dual-match trio under the same
    // random-schedule harness as the eq-delete/compact/expire one: an
    // adopted table's remapped foreign ids (recorded in the property
    // map) sit JUST ABOVE the native counter, so native commits mint
    // straight through their range. After any interleaving of appends,
    // eq-deletes, compactions and expires, every foreign id must either
    // serve its exact recorded state or fail loudly — and no id may
    // ever name two points (a mapped foreign id colliding with a live
    // native snapshot id would silently serve the wrong one).
    import graft.icelite.{TableMetadata => TM}
    for (schedule <- 0 until graft.LoadTests.n(25, 3)) {
      val rnd = new scala.util.Random(9100 + schedule)
      val loc = Files.createTempDirectory(s"maint_fid_$schedule").toString
      val src = IceLite.create(spark, s"$loc/src", Seq("id" -> "BIGINT"))
      var cursor = 0L
      val foreignSets = scala.collection.mutable.ArrayBuffer[Set[Long]]()
      for (_ <- 0 until 3) {
        src.append((cursor until cursor + 4L).toDF("id")); cursor += 4
        foreignSets += (0L until cursor).toSet
      }
      val mj = IcebergExport.export(src, s"$loc/foreign", Seq(1L, 2L, 3L))
      // random NON-MONOTONE foreign ids in 4..40: remap engages (ids out
      // of commit order, min > N), and native minting WILL hit them.
      // Only metadata.json is remapped — the manifests keep the original
      // ids, so every file also exercises the batched footer fallback.
      val fids = {
        val draw = rnd.shuffle((4L to 40L).toVector).take(3)
        if (draw == draw.sorted) draw.reverse else draw
      }
      val mp = java.nio.file.Paths.get(mj)
      val edited = (1L to 3L).foldLeft(
        new String(java.nio.file.Files.readAllBytes(mp), "UTF-8")) {
        case (acc, o) =>
          acc.replace(s""""snapshot-id": $o,""",
            s""""snapshot-id": ${fids(o.toInt - 1)},""")
      }.replace(""""current-snapshot-id": 3""",
        s""""current-snapshot-id": ${fids(2)}""")
      java.nio.file.Files.write(mp, edited.getBytes("UTF-8"))
      java.nio.file.Files.deleteIfExists(
        mp.resolveSibling("." + mp.getFileName + ".crc"))
      val t = IceLite.adopt(spark, mj, s"$loc/adopted")
      assert(t.meta.snapshots.map(_.id) == Seq(1L, 2L, 3L),
        s"schedule $schedule: remap must engage for $fids")
      val foreignStates: Seq[(Long, Set[Long])] = fids.zip(foreignSets).toSeq

      var live: Set[Long] = foreignSets.last
      var nextFresh = 100L
      var snapStates: Vector[(Long, Set[Long])] =
        t.meta.snapshots.map(_.id).zip(foreignSets).toVector

      def checkInvariants(): Unit = {
        assert(t.read().collect().map(_.getLong(0)).toSet == live,
          s"schedule $schedule: live read diverged")
        val props = t.meta.properties
        val nativeIds = t.meta.snapshots.map(_.id).toSet
        for ((fid, expect) <- foreignStates) {
          props.get(s"${TM.ForeignSnapshotProp}$fid").map(_.toLong) match {
            case Some(nid) =>
              assert(nativeIds.contains(nid),
                s"schedule $schedule: foreign $fid maps to expired native $nid — " +
                  "expire must prune stale mappings")
              assert(!nativeIds.contains(fid),
                s"schedule $schedule: foreign id $fid also names a live native " +
                  "snapshot — mint-skip failed, the id is ambiguous")
              assert(t.readAsOf(fid).collect().map(_.getLong(0)).toSet == expect,
                s"schedule $schedule: VERSION AS OF foreign $fid diverged")
            case None if !nativeIds.contains(fid) =>
              // pruned mapping and no native reuse: must fail loudly
              intercept[Exception](t.readAsOf(fid))
            case None => // a later native commit legitimately minted the
              // forgotten id: it serves the NATIVE point exactly
              val expectNative = snapStates.find(_._1 == fid).map(_._2)
              assert(expectNative.exists(_ ==
                  t.readAsOf(fid).collect().map(_.getLong(0)).toSet),
                s"schedule $schedule: reminted id $fid must serve its native state")
          }
        }
        // retained native history replays exactly
        for ((sid, expect) <- snapStates if nativeIds.contains(sid))
          assert(t.readAsOf(sid).collect().map(_.getLong(0)).toSet == expect,
            s"schedule $schedule native snapshot $sid: time travel diverged")
      }
      checkInvariants()

      for (_ <- 0 until 6) {
        rnd.nextInt(4) match {
          case 0 => // native append through the foreign-id range
            val r = nextFresh until nextFresh + 3
            nextFresh += 3
            t.append(r.toDF("id")); live ++= r
            snapStates :+= (t.meta.currentSnapshotId.get -> live)
          case 1 if live.nonEmpty => // eq-delete a live key
            val victim = live.toIndexedSeq(rnd.nextInt(live.size))
            t.deleteEq(Seq(victim).toDF("id")); live -= victim
            snapStates :+= (t.meta.currentSnapshotId.get -> live)
          case 2 => // compact: content-neutral replace point
            t.compact(2)
            snapStates :+= (t.meta.currentSnapshotId.get -> live)
          case _ => // expire all but the 2 newest timestamps
            val ts = t.meta.snapshots.map(_.timestampMs).sorted
            if (ts.size > 2) {
              t.expireSnapshots(ts.takeRight(2).head)
              val retained = t.meta.snapshots.map(_.id).toSet
              snapStates = snapStates.filter(p => retained.contains(p._1))
            }
        }
        checkInvariants()
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
