package graft.icelite

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import scala.util.control.NonFatal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized concurrency stress over the commit protocol: many rounds of
  * racing writers (append | delete | compact | delete-file rewrite), each
  * op on its own table handle, with an EXACT end-state invariant.
  *
  * The ops are chosen order-commutative by construction — appends insert
  * disjoint fresh key ranges, each delete targets one key committed in an
  * EARLIER round, compaction is content-neutral — so whatever interleaving
  * the scheduler produces, the committed history must replay to the same
  * multiset. Two invariants close both failure modes:
  *
  *   - row multiset == seed ∪ appended keys ∖ deleted keys
  *     (a lost append/delete, a double-applied rebase, or stale MoR
  *     positions silently dropped all break this);
  *   - final version == 1 (create) + successful commits
  *     (a writer that "succeeded" without landing a version file, or
  *     stepped over a live racer's commit, breaks this).
  *
  * Retry semantics mirror the documented contract: appends and MoR
  * deletes rebase internally; CoW delete/compact propagate collisions to
  * the caller (the derived file set is stale), so the harness re-runs the
  * WHOLE op — exactly what a job driver does. Only conflict exceptions
  * are retried; anything else fails the test.
  */
class ConcurrencyStressSpec extends SparkSpec {
  import spark.implicits._

  private val commits = new AtomicInteger(0)

  /** Re-run `op` on conflict, on a FRESH handle per attempt. */
  private def retrying(loc: String, label: String)(op: IceLiteTable => Unit): Unit =
    retryingCounted(loc, label) { t => op(t); 1 }

  /** Like [[retrying]] but `op` reports how many version commits it made
    * (0 for a no-op maintenance call), keeping the version == 1 + commits
    * invariant exact. */
  private def retryingCounted(loc: String, label: String)(op: IceLiteTable => Int): Unit = {
    var attempt = 0
    while (true) {
      try {
        commits.addAndGet(op(new IceLiteTable(spark, loc)))
        return
      } catch {
        case NonFatal(e) if isConflict(e) && attempt < 30 =>
          attempt += 1
          Thread.sleep(20L + scala.util.Random.nextInt(80))
        case NonFatal(e) =>
          throw new RuntimeException(s"$label failed non-conflict after $attempt retries", e)
      }
    }
  }

  private def isConflict(e: Throwable): Boolean = e match {
    case _: org.apache.hadoop.fs.FileAlreadyExistsException => true
    case _: IceLite.CommitSupersededException => true
    case _: IceLite.ConcurrentRewriteException => true
    case r: RuntimeException if r.getMessage != null &&
      r.getMessage.startsWith("commit failed after") => true
    case _ => false
  }

  private def runStress(deleteMode: String, rounds: Int, seed: Int,
      eq: Boolean = false): Unit = {
    commits.set(0)
    val loc = Files.createTempDirectory(s"stress_$deleteMode").toString + "/t"
    val t0 = IceLite.create(spark, loc, Seq("id" -> "BIGINT"),
      properties = Map(
        "write.delete.mode" -> deleteMode,
        // the stress runs schedules back-to-back, so a colliding version
        // file is always a LIVE racer — never quarantine-step it
        "commit.orphan-quarantine-ms" -> "3600000"))
    t0.append((0L until 100L).toDF("id"))
    commits.incrementAndGet()

    val rnd = new scala.util.Random(seed)
    var expected = (0L until 100L).toSet
    for (r <- 0 until rounds) {
      val base = 10000L + r * 40L
      // two DISTINCT keys committed in earlier rounds: eq delete vs eq
      // upsert of the SAME key would not commute (their sequence order
      // decides survival), so the harness keeps their targets disjoint —
      // matching the order-commutative construction of the other ops
      val live = expected.toIndexedSeq
      val victim = live(rnd.nextInt(live.size))
      val upKey = {
        var k = live(rnd.nextInt(live.size))
        while (k == victim) k = live(rnd.nextInt(live.size))
        k
      }
      val deleteOp: IceLiteTable => Unit =
        if (eq) (t => t.deleteEq(Seq(victim).toDF("id")))
        else (t => t.delete(col("id") === victim))
      val ops = Seq(
        Future(retrying(loc, s"append-a r$r")(_.append((base until base + 20L).toDF("id")))),
        Future(retrying(loc, s"append-b r$r")(_.append((base + 20L until base + 40L).toDF("id")))),
        Future(retrying(loc, s"delete r$r")(deleteOp))) ++
        // eq upsert of a unique live key is identity on the id multiset —
        // it must survive any interleaving (delete+insert share one seq)
        (if (eq) Seq(Future(retrying(loc, s"upsert r$r")(
          _.upsertEq(Seq(upKey).toDF("id"), Seq("id"))))) else Seq()) ++
        (if (r % 5 == 4) Seq(Future(retrying(loc, s"compact r$r")(_.compact(3)))) else Seq()) ++
        // delete-file rewrite is content-neutral like compaction; it may
        // legitimately no-op (<=1 pos file, e.g. right after a compaction
        // cleared them) and reports 0 commits for that case
        (if (deleteMode == "merge-on-read" && !eq && r % 7 == 3)
          Seq(Future(retryingCounted(loc, s"rewrite r$r")(
            t => if (t.rewritePositionDeletes()) 1 else 0)))
        else Seq())
      ops.foreach(Await.result(_, 180.seconds))
      expected = expected ++ (base until base + 40L) - victim

      if (r % 10 == 9 || r == rounds - 1) {
        val got = new IceLiteTable(spark, loc).read()
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(got == expected.toSeq.sorted,
          s"$deleteMode round $r: multiset diverged — " +
            s"missing=${(expected -- got.toSet).take(5)} extra=${(got.toSet -- expected).take(5)}")
      }
    }
    val t = new IceLiteTable(spark, loc)
    assert(t.currentVersion == 1 + commits.get,
      s"$deleteMode: ${commits.get} successful commits but version ${t.currentVersion} — " +
        "a commit was lost or double-counted")
  }

  test("50 copy-on-write schedules: racing append/delete/compact, exact end state") {
    runStress("copy-on-write", rounds = 50, seed = 11)
  }

  test("50 merge-on-read schedules: racing append/delete/compact, exact end state") {
    runStress("merge-on-read", rounds = 50, seed = 23)
  }

  test("50 equality-delete schedules: racing append/deleteEq/upsertEq/compact, exact end state") {
    runStress("merge-on-read", rounds = 50, seed = 37, eq = true)
  }
}
