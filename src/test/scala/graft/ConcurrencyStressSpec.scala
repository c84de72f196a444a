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

  test("copy-on-write schedules: racing append/delete/compact, exact end state") {
    runStress("copy-on-write", rounds = graft.LoadTests.n(50, 8), seed = 11)
  }

  test("merge-on-read schedules: racing append/delete/compact, exact end state") {
    runStress("merge-on-read", rounds = graft.LoadTests.n(50, 8), seed = 23)
  }

  test("equality-delete schedules: racing append/deleteEq/upsertEq/compact, exact end state") {
    runStress("merge-on-read", rounds = graft.LoadTests.n(50, 8), seed = 37, eq = true)
  }

  // ---------------------------------------------------------------------
  // Deterministic CoW validation-and-rebase schedules: a gate store blocks
  // the LOSER's version-file write until the winner has committed, so the
  // collision (and the rebase decision) happens on every run, not when the
  // scheduler feels like it.

  /** Wraps the real store; the first version-file createExclusive blocks
    * on `gate` (manifest chunk writes pass through ungated). */
  private final class GateStore(inner: CommitStore,
      gate: java.util.concurrent.CountDownLatch) extends CommitStore {
    private val gated = new java.util.concurrent.atomic.AtomicBoolean(false)
    /** Opens once the gated handle has read the version hint — i.e. its
      * operation has LOADED the pre-winner state. */
    val loaded = new java.util.concurrent.CountDownLatch(1)
    override def readString(p: org.apache.hadoop.fs.Path): String = {
      val s = inner.readString(p)
      if (p.getName == "version-hint.text") loaded.countDown()
      s
    }
    override def createExclusive(p: org.apache.hadoop.fs.Path, content: String): Unit = {
      if (p.getName.matches("v\\d+\\.json") && gated.compareAndSet(false, true))
        gate.await()
      inner.createExclusive(p, content)
    }
    override def replace(p: org.apache.hadoop.fs.Path, content: String): Unit = inner.replace(p, content)
    override def exists(p: org.apache.hadoop.fs.Path): Boolean = inner.exists(p)
    override def modificationTime(p: org.apache.hadoop.fs.Path): Long = inner.modificationTime(p)
    override def delete(p: org.apache.hadoop.fs.Path): Unit = inner.delete(p)
  }

  /** Table with 4 files of disjoint 100-key id ranges + a `v` column. */
  private def mkRanged(tag: String): String = {
    val loc = Files.createTempDirectory(s"cowrebase_$tag").toString + "/t"
    val df = spark.range(0, 400).toDF("id").withColumn("v", lit(0L))
    val t = IceLite.createFrom(spark, loc, df,
      properties = Map("commit.orphan-quarantine-ms" -> "3600000"))
    (0 until 4).foreach(b =>
      t.append(df.filter(col("id") >= b * 100 && col("id") < (b + 1) * 100)))
    loc
  }

  /** Run `gatedOp` on a gate-store handle in a thread, run `winnerOp` to
    * completion, open the gate, join. Returns the gated op's failure. */
  private def interleave(loc: String)(winnerOp: IceLiteTable => Unit)(
      gatedOp: IceLiteTable => Unit): Option[Throwable] = {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val inner = new HadoopCommitStore(IceLite.fs(spark, loc))
    val gs = new GateStore(inner, gate)
    val gatedT = new IceLiteTable(spark, loc, Some(gs))
    val fut = Future(gatedOp(gatedT))
    // wait until the gated op has LOADED the pre-winner state (its commit
    // attempt then parks on the gate, which we hold until after)
    assert(gs.loaded.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "gated op never loaded the table")
    winnerOp(new IceLiteTable(spark, loc))
    gate.countDown()
    try { Await.result(fut, 120.seconds); None } catch { case NonFatal(e) => Some(e) }
  }

  test("disjoint-partition CoW UPDATEs both commit via validation-and-rebase") {
    val loc = mkRanged("disjoint")
    val vBefore = new IceLiteTable(spark, loc).currentVersion
    val err = interleave(loc)(
      _.update(col("id") === 50L, Map("v" -> lit(1L))))(
      _.update(col("id") === 250L, Map("v" -> lit(2L))))
    assert(err.isEmpty, s"disjoint update must rebase, not abort: $err")
    val t = new IceLiteTable(spark, loc)
    assert(t.currentVersion == vBefore + 2, "both updates must land as commits")
    val got = t.read().filter(col("v") =!= 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((50L, 1L), (250L, 2L)), s"both updates must apply: $got")
  }

  test("overlapping CoW UPDATEs: the loser aborts instead of clobbering") {
    val loc = mkRanged("overlap")
    val err = interleave(loc)(
      _.update(col("id") === 50L, Map("v" -> lit(1L))))(
      _.update(col("id") === 55L, Map("v" -> lit(2L))))
    assert(err.exists(_.isInstanceOf[IceLite.ConcurrentRewriteException]),
      s"same-file update must abort with ConcurrentRewriteException, got $err")
    val t = new IceLiteTable(spark, loc)
    val got = t.read().filter(col("v") =!= 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((50L, 1L)), s"only the winner may apply: $got")
  }

  test("CoW DELETE rebases over a stat-disjoint append, aborts on an admitting one") {
    val loc1 = mkRanged("addsafe")
    // appended keys [10000,10020) are refuted by the delete's Eq(id,250)
    // stat filter → the delete validates and rebases over the append
    val err1 = interleave(loc1)(
      _.append(spark.range(10000, 10020).toDF("id").withColumn("v", lit(9L))))(
      _.delete(col("id") === 250L))
    assert(err1.isEmpty, s"stat-disjoint append must not abort the delete: $err1")
    val t1 = new IceLiteTable(spark, loc1)
    assert(t1.read().count() == 419)
    assert(t1.read().filter(col("id") === 250L).count() == 0)
    assert(t1.read().filter(col("id") >= 10000L).count() == 20, "the append must survive the rebase")

    val loc2 = mkRanged("addunsafe")
    // appended key 250 is ADMITTED by the delete's predicate stats: the
    // delete's already-evaluated scan never saw it → must abort
    val err2 = interleave(loc2)(
      _.append(Seq((250L, 9L)).toDF("id", "v")))(
      _.delete(col("id") === 250L))
    assert(err2.exists(_.isInstanceOf[IceLite.ConcurrentRewriteException]),
      s"predicate-admitting append must abort the delete, got $err2")
  }
}
