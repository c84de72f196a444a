package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.icelite.IceLite
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming demo (SURVEY.md §7.7): windowed agg with watermark
  * + micro-batch appends into IceLite (one snapshot per batch).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed aggregation with watermark drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingIngest.windowedEventAgg(
      mem.toDF.toDF("ts", "event_type", "value"), "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(
        (ts("2024-01-01 10:10:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 2.0),
        (ts("2024-01-01 11:15:00"), "view", 5.0))
      q.processAllAvailable()
      // watermark is now 11:15 - 2h = 09:15; this event is older → dropped
      mem.addData((ts("2024-01-01 06:00:00"), "click", 99.0))
      // advance watermark far past the 10:00 window
      mem.addData((ts("2024-01-01 20:00:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("winagg")
        .groupBy("window_start", "event_type")
        .agg(max("cnt").as("cnt"), max("sum_value").as("sv"))
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)), s"got $rows")
      assert(!rows.exists(_._4 == 99.0), s"late event leaked: $rows")
    } finally q.stop()
  }

  test("stream-static enrichment joins dimension attributes per micro-batch, losslessly") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val mem = MemoryStream[(Long, Double)]
    val out = StreamingIngest.enrichStream(
      mem.toDF.toDF("user_id", "value"), dim, "user_id")
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, 10.0), (2L, 20.0), (3L, 30.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
      // matched rows carry the attribute; the unmatched fact row survives with NULL
      assert(rows == Set((1L, 10.0, Some("gold")), (2L, 20.0, Some("silver")),
        (3L, 30.0, None)), s"got $rows")
    } finally q.stop()
  }

  test("streaming dedup keeps first arrival per fingerprint within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamingIngest.dedupStream(
      mem.toDF.toDF("ts", "doc_id", "text"), "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("streamdedup")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), 1L, "aaa"),
        (ts("2024-01-01 10:01:00"), 2L, "aaa"), // same content, same batch
        (ts("2024-01-01 10:02:00"), 3L, "bbb"))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 10:03:00"), 4L, "aaa")) // later batch, inside horizon
      q.processAllAvailable()
      val got = spark.table("streamdedup").collect()
        .map(r => (r.getLong(1), r.getString(2))).toSet
      assert(got == Set((1L, "aaa"), (3L, "bbb")),
        s"expected first arrivals only, got $got")
    } finally q.stop()
  }

  test("sessionize lowers the session start when a late-but-earlier event joins") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sessions = StreamingIngest.sessionize(
      mem.toDF.toDF("user_id", "ts", "value"), gapMs = 60000)
    val q = sessions.toDF().writeStream.format("memory").queryName("sessions_late")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((7L, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // late but ABOVE the watermark (10:00:00 − 60s): accepted into the
      // session — the emitted start must cover it, not the first-seen ts
      mem.addData((7L, ts("2024-01-01 09:59:30"), 2.0))
      q.processAllAvailable()
      mem.addData((8L, ts("2024-01-01 11:00:00"), 0.1)) // push watermark
      q.processAllAvailable()
      mem.addData((8L, ts("2024-01-01 11:00:01"), 0.1)) // drain timeouts
      q.processAllAvailable()
      val row = spark.table("sessions_late").collect()
        .find(_.getLong(0) == 7L).getOrElse(sys.error("session 7 not closed"))
      assert(row.getLong(1) == 2L, s"both events must count: $row")
      assert(row.getLong(3) == ts("2024-01-01 09:59:30").getTime,
        s"session start must cover the late-but-earlier event: $row")
      assert(row.getLong(4) == ts("2024-01-01 10:00:00").getTime)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions by event-time gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sessions = StreamingIngest.sessionize(
      mem.toDF.toDF("user_id", "ts", "value"), gapMs = 60000) // 1-minute gap
    val q = sessions.toDF().writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:00:30"), 2.0),
        (2L, ts("2024-01-01 10:00:10"), 5.0))
      q.processAllAvailable()
      // watermark jumps far past both sessions → timeouts fire next batch
      mem.addData((3L, ts("2024-01-01 11:00:00"), 0.5))
      q.processAllAvailable()
      mem.addData((3L, ts("2024-01-01 11:00:01"), 0.5)) // drain timeout emissions
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)), s"user 1 session wrong: $rows")
      assert(rows.contains((2L, 1L, 5.0)), s"user 2 session wrong: $rows")
      assert(!rows.exists(_._1 == 3L), s"user 3 still active, must not emit: $rows")
    } finally q.stop()
  }

  test("stream appends become IceLite snapshots; content matches input") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val df = mem.toDF.toDF("id", "kind", "value")
    val loc = Files.createTempDirectory("streamspec").toString + "/t"
    val table = IceLite.createFrom(spark, loc, df)
    val q = StreamingIngest.writeToIceLite(
      df, table, Files.createTempDirectory("streamspec_cp").toString).start()
    try {
      mem.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable()
      mem.addData((3L, "a", 3.0))
      q.processAllAvailable()
      val snaps = table.meta.snapshots
      assert(snaps.size == 2, s"expected 2 snapshots, got ${snaps.map(_.operation)}")
      assert(table.read().count() == 3)
      assert(table.readAsOf(1).count() == 2)
      val total = table.read().agg(sum(col("value"))).head.getDouble(0)
      assert(total == 6.0)
    } finally q.stop()
  }

  test("stream upserts MERGE per batch: last event per key wins, replays are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val df = mem.toDF.toDF("id", "seq", "value")
    val loc = Files.createTempDirectory("streamup").toString + "/t"
    val table = IceLite.createFrom(spark, loc, df)
    val q = StreamingIngest.upsertToIceLite(
      df, table, "id", "seq", Files.createTempDirectory("streamup_cp").toString).start()
    try {
      // batch 0: two keys, with an intra-batch double-write on key 1
      mem.addData((1L, 1L, 10.0), (1L, 2L, 11.0), (2L, 1L, 20.0))
      q.processAllAvailable()
      // batch 1: update key 2, insert key 3
      mem.addData((2L, 2L, 21.0), (3L, 1L, 30.0))
      q.processAllAvailable()
      val state = table.read().orderBy("id").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(state == Seq((1L, 11.0), (2L, 21.0), (3L, 30.0)), s"got $state")
      // restart-replay of an already-committed batch id: no-op
      import spark.implicits._
      val replay = Seq((2L, 2L, 99.0)).toDF("id", "seq", "value")
      assert(!table.mergeIfNewBatch(1L, replay, "id"), "replayed batch must be skipped")
      val after = table.read().filter(col("id") === 2L).head.getDouble(2)
      assert(after == 21.0, "replay changed committed state")
      // merge into an EMPTY table inserts everything (stream cold start)
      val loc2 = Files.createTempDirectory("streamup2").toString + "/t"
      val t2 = IceLite.createFrom(spark, loc2, df)
      assert(t2.mergeIfNewBatch(0L, replay, "id"))
      assert(t2.read().count() == 1)
    } finally q.stop()
  }

  test("stream upserts via EQUALITY deletes: same semantics, no target rewrite") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val df = mem.toDF.toDF("id", "seq", "value")
    val loc = Files.createTempDirectory("streameq").toString + "/t"
    val table = IceLite.createFrom(spark, loc, df)
    val q = StreamingIngest.upsertEqToIceLite(
      df, table, "id", "seq", Files.createTempDirectory("streameq_cp").toString).start()
    try {
      mem.addData((1L, 1L, 10.0), (1L, 2L, 11.0), (2L, 1L, 20.0))
      q.processAllAvailable()
      val firstBatchFiles = table.meta.currentSnapshot.get.dataFiles.map(_.path).toSet
      mem.addData((2L, 2L, 21.0), (3L, 1L, 30.0))
      q.processAllAvailable()
      val state = table.read().orderBy("id").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(state == Seq((1L, 11.0), (2L, 21.0), (3L, 30.0)), s"got $state")
      // the O(batch) guarantee: batch 1 updated key 2 WITHOUT rewriting
      // batch 0's data file (contrast the MERGE path, which CoW-rewrites)
      val nowFiles = table.meta.currentSnapshot.get.dataFiles.map(_.path).toSet
      assert(firstBatchFiles.subsetOf(nowFiles), "eq upsert must not rewrite data files")
      // restart-replay of a committed batch id is a no-op
      import spark.implicits._
      val replay = Seq((2L, 2L, 99.0)).toDF("id", "seq", "value")
      assert(!table.upsertEqIfNewBatch(1L, replay, Seq("id")))
      assert(table.read().filter(col("id") === 2L).head.getDouble(2) == 21.0)
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks inside the window only") {
    implicit val sqlCtx = spark.sqlContext
    val imp = MemoryStream[(Long, Timestamp, Double)]
    val clk = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamingIngest.intervalJoin(
      imp.toDF.toDF("key", "ts", "value"),
      clk.toDF.toDF("key", "ts", "value"),
      within = "30 minutes", watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      imp.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:00:00"), 2.0))
      clk.addData(
        (1L, ts("2024-01-01 10:10:00"), 0.5), // inside 30 min → match
        (2L, ts("2024-01-01 11:30:00"), 0.7), // outside → no match
        (3L, ts("2024-01-01 10:05:00"), 0.9)) // no impression → no match
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getDouble(4))).toSet
      assert(rows == Set((1L, 0.5)), s"got $rows")
    } finally q.stop()
  }

  test("streaming curation funnel: gate, index dedup, stream dedup, decontaminate, append") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, String)]
    val df = mem.toDF.toDF("ts", "doc_id", "source", "text")

    val corpusText = "an old page that was already stored in the corpus a while ago"
    val existingFp = Seq(Tuple1(corpusText)).toDF("text")
      .select(md5(col("text")).as("fp"))
    val benchGrams = Seq("secret eval benchmark phrase").toDF("g")

    val goodText = "the cat sat on a mat and the dog ran by a red van in the sun"
    val good2Text = "a small bird flew to the tree and a cat sat by the door to nap"
    val lowqText = "zzzzzzzzzzzzzzzz qqqqqqqqqqqqqqqq wwwwwwwwwwwwwwww kkkkkkkkkkkkkkkk"
    val contamText = "a tale with the secret eval benchmark phrase put in a book by the lake"

    val loc = Files.createTempDirectory("stream_curate").toString + "/t"
    val sinkSchema = Seq((0L, "", "", 0L)).toDF("doc_id", "source", "text", "nw")
    val table = IceLite.createFrom(spark, loc, sinkSchema)
    val q = StreamingIngest.curateStreamToIceLite(df, existingFp, benchGrams,
      table, Files.createTempDirectory("stream_curate_cp").toString).start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), 1L, "web", goodText),
        (ts("2024-01-01 10:00:01"), 2L, "web", lowqText),      // quality gate drops
        (ts("2024-01-01 10:00:02"), 3L, "web", corpusText),    // standing index drops
        (ts("2024-01-01 10:00:03"), 4L, "web", contamText))    // decontamination drops
      q.processAllAvailable()
      mem.addData(
        (ts("2024-01-01 10:01:00"), 5L, "web", goodText),      // in-stream duplicate drops
        (ts("2024-01-01 10:01:01"), 6L, "web", good2Text))
      q.processAllAvailable()

      val got = table.read().select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, goodText), (6L, good2Text)), s"got $got")
      // survivor rows carry the quality stage's token count
      val nw = table.read().filter(col("doc_id") === 1L).head.getAs[Long]("nw")
      assert(nw == goodText.split(" ").length, s"nw=$nw")
      // two non-empty batches → exactly two append snapshots
      assert(table.meta.snapshots.count(_.operation == "append") == 2,
        s"ops: ${table.meta.snapshots.map(_.operation)}")
    } finally q.stop()
  }

  test("streaming curation funnel survives restart: checkpoint resumes state, replays are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, String)]
    val df = mem.toDF.toDF("ts", "doc_id", "source", "text")
    val existingFp = Seq(Tuple1("an old page in the corpus already")).toDF("text")
      .select(md5(col("text")).as("fp"))
    val benchGrams = Seq("secret eval benchmark phrase").toDF("g")
    val goodText = "the cat sat on a mat and the dog ran by a red van in the sun"
    val good2Text = "a small bird flew to the tree and a cat sat by the door to nap"

    val loc = Files.createTempDirectory("stream_restart").toString + "/t"
    val cp = Files.createTempDirectory("stream_restart_cp").toString
    val sinkSchema = Seq((0L, "", "", 0L)).toDF("doc_id", "source", "text", "nw")
    val table = IceLite.createFrom(spark, loc, sinkSchema)

    // phase 1: process one batch, then KILL the query
    val q1 = StreamingIngest.curateStreamToIceLite(df, existingFp, benchGrams, table, cp).start()
    try {
      mem.addData((ts("2024-01-01 10:00:00"), 1L, "web", goodText))
      q1.processAllAvailable()
    } finally q1.stop()
    val appendsAfterPhase1 = table.meta.snapshots.count(_.operation == "append")
    assert(appendsAfterPhase1 == 1)

    // phase 2: RESTART from the same checkpoint. The dedup state must be
    // restored (a same-fingerprint doc inside the watermark still drops),
    // committed offsets must not be reprocessed, and new data must flow.
    val q2 = StreamingIngest.curateStreamToIceLite(df, existingFp, benchGrams, table, cp).start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:30"), 7L, "web", goodText),   // dup of phase-1 doc — state-store drop
        (ts("2024-01-01 10:00:31"), 8L, "web", good2Text))  // genuinely new
      q2.processAllAvailable()
    } finally q2.stop()

    val got = table.read().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 8L), s"after restart got $got")
    // doc 1 was not re-appended by the restart (offsets committed)
    assert(table.read().filter(col("doc_id") === 1L).count() == 1)

    // crash-window replay: foreachBatch can re-run its LAST batch id if
    // the offset commit did not land before death — the idempotent append
    // protocol must make that exact replay a no-op
    val lastBatch = table.meta.properties("streaming.last-committed-batch-id").toLong
    val replay = Seq((8L, "web", good2Text, good2Text.split(" ").length.toLong))
      .toDF("doc_id", "source", "text", "nw")
    assert(!table.appendIfNewBatch(lastBatch, replay), "replayed batch id must be skipped")
    assert(table.read().count() == 2, "replay changed committed state")
  }

  test("changelog replication tails a source table into a target as a stream") {
    implicit val sqlCtx = spark.sqlContext
    def rowsOf(t: graft.icelite.IceLiteTable) =
      t.read().orderBy("id").collect().map(_.toSeq).toSeq
    val dir = Files.createTempDirectory("chg_repl").toString
    val shape = Seq((0L, "x", 0.0)).toDF("id", "kind", "value")
    val src = IceLite.createFrom(spark, s"$dir/src", shape)
    val tgt = IceLite.createFrom(spark, s"$dir/tgt", shape)
    src.append((0L until 10L).map(i => (i, "a", i * 1.0)).toDF("id", "kind", "value"))
    src.update(col("id") === 4L, Map("kind" -> lit("upd")))
    val mem = MemoryStream[Long]
    val q = StreamingIngest.replicateChangelog(
      mem.toDF, src, tgt, "id", s"$dir/ckpt").start()
    try {
      // first poll: the whole history so far (append + CoW update)
      mem.addData(1L); q.processAllAvailable()
      assert(rowsOf(tgt) == rowsOf(src), "the first poll replicates the full history")
      // more source churn; the next poll consumes ONLY the increment
      src.delete(col("id") === 3L)
      src.append(Seq((100L, "z", 9.9)).toDF("id", "kind", "value"))
      mem.addData(2L); q.processAllAvailable()
      assert(rowsOf(tgt) == rowsOf(src), "incremental polls keep replicating")
      // a source compaction is a physical no-op: the poll advances the
      // cursor past the replace point without re-applying anything, so
      // later polls never re-read the suffix
      src.compact(target = 2)
      mem.addData(3L); q.processAllAvailable()
      assert(rowsOf(tgt) == rowsOf(src))
      assert(tgt.meta.properties("streaming.changelog-cursor").toLong ==
        src.meta.currentSnapshotId.get, "the cursor reaches the polled head")
      // an idle poll is a no-op (no new source commits, no target commits)
      val v0 = tgt.currentVersion
      mem.addData(4L); q.processAllAvailable()
      assert(tgt.currentVersion == v0, "an idle poll must not commit anything")
    } finally q.stop()
    // crash-replay shape: rewind the cursor behind the last data-bearing
    // version and re-apply — content-idempotent, so the target converges
    // to the same rows
    val cursor = tgt.meta.properties("streaming.changelog-cursor").toLong
    tgt.setProperties(Map("streaming.changelog-cursor" -> (cursor - 2).toString))
    assert(StreamingIngest.applyChangelogOnce(src, tgt, "id") >= 1)
    assert(rowsOf(tgt) == rowsOf(src), "a replayed version must be a content no-op")
    assert(tgt.meta.properties("streaming.changelog-cursor").toLong == cursor)
  }

  test("DSv2 micro-batch stream serves appended rows per commit, with a checkpoint restart") {
    // `spark.readStream.table(...)` over an IceLite table: the snapshot
    // log is the offset ledger. Three commits land across a restart —
    // every appended row arrives exactly once, the restart resumes from
    // the committed snapshot id (no replay of batches 1–2), a compaction
    // `replace` point emits nothing, a delete commit fails loudly, and
    // skip-delete-snapshots=true resumes past it.
    val dir = Files.createTempDirectory("ms_stream").toString
    spark.conf.set("spark.sql.catalog.ms_cat", "graft.icelite.connector.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ms_cat.warehouse", s"$dir/wh")
    val cat = new graft.icelite.Catalog(spark, s"$dir/wh")
    cat.createTable("db", "ev", Seq("id" -> "BIGINT", "v" -> "STRING"))
    val t = cat.loadTable("db", "ev")
    t.append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "v"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start(extra: Map[String, String] = Map()) = {
      val r = extra.foldLeft(spark.readStream) { case (rd, (k, v)) => rd.option(k, v) }
      r.table("ms_cat.db.ev").writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(row => got.add(row.getLong(0))); ()
        }.start()
    }
    val q = start()
    try {
      q.processAllAvailable()
      assert(got.toArray.toSeq.map(_.asInstanceOf[Long]).sorted == (0L until 10L),
        s"batch 1 must serve the pre-stream table, got ${got.size} rows")
      t.append((10L until 15L).map(i => (i, s"b$i")).toDF("id", "v"))
      q.processAllAvailable()
      assert(got.size == 15, s"batch 2 must serve ONLY the appended rows, got ${got.size}")
    } finally q.stop()
    // commit while the stream is DOWN, plus a mid-stream ADD COLUMN: the
    // restarted query resumes from the committed offset and keeps its
    // pinned (id, v) projection over the widened write schema
    t.addColumn("tag", "STRING", Some("'x'"))
    t.append((15L until 18L).map(i => (i, s"c$i", "y")).toDF("id", "v", "tag"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(got.size == 18,
        s"restart must resume from the committed snapshot (no replay), got ${got.size}")
      assert(got.toArray.map(_.asInstanceOf[Long]).toSet == (0L until 18L).toSet)
      // a compaction is a physical no-op: nothing streams
      t.compact(target = 2)
      q2.processAllAvailable()
      assert(got.size == 18, "a replace point must emit nothing")
      t.append(Seq((18L, "d", "z")).toDF("id", "v", "tag"))
      q2.processAllAvailable()
      assert(got.size == 19)
      // a row-removing commit cannot be represented append-only: loud stop
      t.delete(col("id") === 3L)
      val e = intercept[Exception] { q2.processAllAvailable() }
      assert(e.getMessage.contains("row-removing") ||
        Option(e.getCause).exists(_.getMessage.contains("row-removing")),
        s"a delete commit must fail the stream loudly, got: ${e.getMessage}")
    } finally q2.stop()
    // opt-in skip resumes past the delete and serves later appends
    val q3 = start(Map("skip-delete-snapshots" -> "true"))
    try {
      t.append(Seq((19L, "e", "w")).toDF("id", "v", "tag"))
      q3.processAllAvailable()
      assert(got.toArray.map(_.asInstanceOf[Long]).toSet == (0L until 20L).toSet,
        "skip-delete-snapshots must stream the append past the delete point")
    } finally q3.stop()
  }

  test("Trigger.AvailableNow drains a commit backlog as bounded batches, then stops") {
    // SupportsTriggerAvailableNow pins the drain target at query start and
    // max-snapshots-per-trigger bounds each batch to one commit — a stale
    // checkpoint against a hot table catches up as N bounded batches, not
    // one giant catch-up scan, and the query terminates at the pin.
    val dir = Files.createTempDirectory("ms_avail").toString
    spark.conf.set("spark.sql.catalog.ms_cat2", "graft.icelite.connector.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ms_cat2.warehouse", s"$dir/wh")
    val cat = new graft.icelite.Catalog(spark, s"$dir/wh")
    cat.createTable("db", "ev", Seq("id" -> "BIGINT"))
    val t = cat.loadTable("db", "ev")
    (0 until 3).foreach(b => t.append(Seq(b.toLong).toDF("id")))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = spark.readStream
      .option("max-snapshots-per-trigger", "1")
      .table("ms_cat2.db.ev").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.count().toInt); ()
      }.start()
    assert(q.awaitTermination(120000), "AvailableNow must terminate at the pinned head")
    assert(batches.toArray.toSeq == Seq(1, 1, 1),
      s"three commits at one-commit-per-trigger must drain as three 1-row batches, got $batches")
  }

  test("stream deltas survive manifest tail spills AND head consolidation: no replay, no loss") {
    // the per-commit delta is the MANIFEST-STRUCTURAL diff
    // (FileListing.addedSince — O(changed chunks + tails), never
    // O(table)); the two adversarial shapes are the commit-time tail
    // spill (a new chunk ref carrying only OLD tail files) and
    // HEAD-snapshot consolidation (undersized chunks merged into new
    // chunk files whose entries are ALL old — a "new chunks are new
    // files" diff replays hundreds of rows). min-files=1 spills every
    // commit's tail and max-count=2 forces consolidation repeatedly;
    // every row must still arrive exactly once.
    val dir = Files.createTempDirectory("ms_spill").toString
    spark.conf.set("spark.sql.catalog.ms_spl", "graft.icelite.connector.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ms_spl.warehouse", s"$dir/wh")
    val cat = new graft.icelite.Catalog(spark, s"$dir/wh")
    cat.createTable("db", "ev", Seq("id" -> "BIGINT"),
      properties = Map("write.metadata.manifest.min-files" -> "1",
        "write.metadata.manifest.target-files" -> "3",
        "write.metadata.manifest.max-count" -> "2"))
    val t = cat.loadTable("db", "ev")
    (0 until 10).foreach(i => t.append(Seq(i.toLong).toDF("id").coalesce(1)))
    val headChunks = t.meta.currentSnapshot.get.files.manifests.size
    assert(headChunks > 0 && headChunks < 10,
      s"fixture must spill every commit AND consolidate (got $headChunks chunks for 10 files)")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .option("max-snapshots-per-trigger", "1")
      .table("ms_spl.db.ev").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(r.getLong(0))); ()
      }.start()
    assert(q.awaitTermination(120000))
    assert(got.toArray.toSeq.map(_.asInstanceOf[Long]).sorted == (0L until 10L),
      s"each spilled commit's rows must arrive exactly once, got ${got.size} rows")
  }

  test("DSv2 streaming sink lands each epoch exactly once in a partitioned table") {
    // `df.writeStream.toTable("icelite.db.t")` — no foreachBatch: executor
    // fanout parquet writes + one atomic append-with-epoch-ledger commit
    // per micro-batch. Source and sink are both IceLite DSv2 streams, so
    // this is the full first-class loop: appends to src flow through the
    // snapshot-log offsets into tgt's own snapshots; a checkpoint restart
    // replays nothing; identity partitioning lands rows in per-value
    // files (manifest pruning sees them).
    val dir = Files.createTempDirectory("ms_sink").toString
    spark.conf.set("spark.sql.catalog.ms_sink", "graft.icelite.connector.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ms_sink.warehouse", s"$dir/wh")
    val cat = new graft.icelite.Catalog(spark, s"$dir/wh")
    cat.createTable("db", "src", Seq("id" -> "BIGINT", "grp" -> "STRING"))
    cat.createTable("db", "tgt", Seq("id" -> "BIGINT", "grp" -> "STRING"),
      partition = Seq("grp" -> "identity"))
    val src = cat.loadTable("db", "src")
    val tgt = cat.loadTable("db", "tgt")
    src.append(Seq((0L, "a"), (1L, "b")).toDF("id", "grp"))
    def start() = spark.readStream.table("ms_sink.db.src")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .toTable("ms_sink.db.tgt")
    val q = start()
    try {
      q.processAllAvailable()
      assert(tgt.read().count() == 2, "epoch 0 must land the pre-stream rows")
      src.append(Seq((2L, "a")).toDF("id", "grp"))
      q.processAllAvailable()
      assert(tgt.read().count() == 3, "epoch 1 must land ONLY the appended row")
    } finally q.stop()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(tgt.read().count() == 3, "a checkpoint restart must not replay epochs")
      src.append(Seq((3L, "c")).toDF("id", "grp"))
      q2.processAllAvailable()
      assert(tgt.read().count() == 4)
    } finally q2.stop()
    assert(tgt.read().filter(col("grp") === "a").select("id").collect()
      .map(_.getLong(0)).toSet == Set(0L, 2L),
      "identity-partitioned epochs must serve partition filters")
    assert(tgt.meta.snapshots.forall(_.operation != "overwrite"),
      "streaming epochs are pure appends")
    assert(tgt.meta.properties.keys.exists(_.startsWith("streaming.sink.")),
      "the per-query epoch ledger must advance inside the table commit")
    // every committed file carries a partition value under the identity
    // spec: the fanout writer and the batch writer agree on spellings
    val pvals = tgt.meta.currentSnapshot.get.dataFiles.flatMap(_.partition.values).toSet
    assert(pvals == Set("a", "b", "c"), s"fanout partition spellings, got $pvals")
  }

  test("a bootstrap over merge-on-read deletes refuses loudly instead of resurrecting rows") {
    // a fresh stream's first batch serves the bootstrap snapshot's raw
    // data files — when MoR deletes ride on them, raw files would
    // resurrect the deleted rows, so the poll must refuse (compact
    // first), never serve silently. skip-delete-snapshots skips COMMITS
    // and cannot make this batch correct.
    val dir = Files.createTempDirectory("ms_bmor").toString
    spark.conf.set("spark.sql.catalog.ms_bmor", "graft.icelite.connector.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ms_bmor.warehouse", s"$dir/wh")
    val cat = new graft.icelite.Catalog(spark, s"$dir/wh")
    cat.createTable("db", "ev", Seq("id" -> "BIGINT"),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    val t = cat.loadTable("db", "ev")
    t.append((0L until 10L).map(i => Tuple1(i)).toDF("id"))
    t.delete(col("id") === 3L)
    t.expireSnapshots(System.currentTimeMillis() + 1000)
    def start(ckpt: String) = spark.readStream.table("ms_bmor.db.ev")
      .writeStream.option("checkpointLocation", s"$dir/$ckpt")
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }.start()
    val q = start("ckpt1")
    val e = intercept[Exception] { q.processAllAvailable() }
    try {
      assert(e.getMessage.contains("merge-on-read") ||
        Option(e.getCause).exists(_.getMessage.contains("merge-on-read")),
        s"bootstrap over MoR deletes must refuse, got: ${e.getMessage}")
    } finally q.stop()
    // the prescribed remedy works: compact (delete-applied replace
    // snapshot) + expire the MoR point — bootstrap serves the TRUE
    // 9-row state
    t.compact(target = 1)
    t.expireSnapshots(System.currentTimeMillis() + 1000)
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q3 = spark.readStream.table("ms_bmor.db.ev")
      .writeStream.option("checkpointLocation", s"$dir/ckpt3")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got2.add(r.getLong(0))); ()
      }.start()
    try {
      q3.processAllAvailable()
      assert(got2.toArray.toSeq.map(_.asInstanceOf[Long]).sorted ==
        ((0L until 10L).filterNot(_ == 3L)),
        s"post-compaction bootstrap must serve the delete-applied state, got $got2")
    } finally q3.stop()
  }

  test("an upsert epoch spanning conflicting key versions refuses loudly") {
    // two commits carrying the same key drained in ONE epoch are
    // unordered at the sink — applying them would keep an arbitrary
    // version. The epoch commit must detect the duplicate key and refuse
    // with the remedy (one commit per micro-batch), not pick silently.
    val dir = Files.createTempDirectory("ms_updup").toString
    spark.conf.set("spark.sql.catalog.ms_updup", "graft.icelite.connector.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ms_updup.warehouse", s"$dir/wh")
    val cat = new graft.icelite.Catalog(spark, s"$dir/wh")
    cat.createTable("db", "src", Seq("k" -> "BIGINT", "v" -> "STRING"))
    cat.createTable("db", "tgt", Seq("k" -> "BIGINT", "v" -> "STRING"),
      properties = Map("write.upsert.enabled" -> "true",
        "write.upsert.key-columns" -> "k"))
    val src = cat.loadTable("db", "src")
    // both versions of k=1 land BEFORE the stream starts: the bootstrap
    // epoch spans both commits (no max-snapshots-per-trigger)
    src.append(Seq((1L, "v1")).toDF("k", "v"))
    src.append(Seq((1L, "v2")).toDF("k", "v"))
    val q = spark.readStream.table("ms_updup.db.src")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .toTable("ms_updup.db.tgt")
    val e = intercept[Exception] { q.processAllAvailable() }
    try {
      assert(e.getMessage.contains("one row for a key") ||
        Option(e.getCause).exists(_.getMessage.contains("one row for a key")),
        s"conflicting key versions in one epoch must refuse, got: ${e.getMessage}")
    } finally q.stop()
  }

  test("streaming sink epochs rebase cleanly against a racing batch writer") {
    // epoch commits go through the same optimistic-retry commit as every
    // other writer: a batch append racing the stream's epoch commit must
    // never be lost, never double the epoch, and the ledger property must
    // survive the rebase.
    val dir = Files.createTempDirectory("ms_race").toString
    spark.conf.set("spark.sql.catalog.ms_race", "graft.icelite.connector.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ms_race.warehouse", s"$dir/wh")
    val cat = new graft.icelite.Catalog(spark, s"$dir/wh")
    cat.createTable("db", "src", Seq("id" -> "BIGINT"))
    cat.createTable("db", "tgt", Seq("id" -> "BIGINT"))
    val src = cat.loadTable("db", "src")
    val tgt = cat.loadTable("db", "tgt")
    val q = spark.readStream.table("ms_race.db.src")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .toTable("ms_race.db.tgt")
    // batch writer races the stream: ids 1000+i from the side, 0..4 from
    // the stream, interleaved commits on one table
    val racer = new Thread(() => (0 until 5).foreach { i =>
      tgt.append(Seq(1000L + i).toDF("id").coalesce(1))
    })
    try {
      racer.start()
      (0 until 5).foreach { i =>
        src.append(Seq(i.toLong).toDF("id").coalesce(1))
        q.processAllAvailable()
      }
      racer.join()
      q.processAllAvailable()
      val ids = tgt.read().collect().map(_.getLong(0)).toSeq.sorted
      assert(ids == ((0L until 5L) ++ (1000L until 1005L)).sorted,
        s"every stream row and every batch row exactly once, got $ids")
      assert(tgt.meta.properties.collectFirst {
        case (k, v) if k.startsWith("streaming.sink.") => v.toLong }.exists(_ >= 4),
        "the epoch ledger must survive rebased commits")
    } finally q.stop()
  }

  test("streaming upsert sink retires old key versions exactly once across a restart") {
    // write.upsert.enabled turns the DSv2 sink into the CDC-upsert shape:
    // each epoch commits its rows WITH equality deletes on the key, so a
    // key's newer version retires the older ones merge-on-read. The
    // restart epoch must neither replay (duplicate versions) nor skip
    // (stale versions).
    val dir = Files.createTempDirectory("ms_upsert").toString
    spark.conf.set("spark.sql.catalog.ms_ups", "graft.icelite.connector.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ms_ups.warehouse", s"$dir/wh")
    val cat = new graft.icelite.Catalog(spark, s"$dir/wh")
    cat.createTable("db", "src", Seq("k" -> "BIGINT", "v" -> "STRING"))
    cat.createTable("db", "tgt", Seq("k" -> "BIGINT", "v" -> "STRING"),
      properties = Map("write.upsert.enabled" -> "true",
        "write.upsert.key-columns" -> "k"))
    val src = cat.loadTable("db", "src")
    val tgt = cat.loadTable("db", "tgt")
    def start() = spark.readStream.table("ms_ups.db.src")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .toTable("ms_ups.db.tgt")
    src.append(Seq((1L, "a1"), (2L, "a2")).toDF("k", "v"))
    val q = start()
    try {
      q.processAllAvailable()
      assert(tgt.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
        Map(1L -> "a1", 2L -> "a2"))
    } finally q.stop()
    // versions committed while the stream is DOWN upsert on restart
    src.append(Seq((2L, "b2"), (3L, "b3")).toDF("k", "v"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(tgt.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
        Map(1L -> "a1", 2L -> "b2", 3L -> "b3"),
        "the restart epoch must retire k=2's old version exactly once")
      assert(tgt.read().count() == 3, "no duplicate key versions may survive")
    } finally q2.stop()
  }

  test("a stream offset EXPIRED from the source table fails loudly, not from an empty base") {
    // if maintenance expires the snapshot a checkpoint points at, the gap's
    // history is unrecoverable — the poll must refuse (demanding a fresh
    // checkpoint or longer retention), never silently re-serve the table.
    val dir = Files.createTempDirectory("ms_expired").toString
    spark.conf.set("spark.sql.catalog.ms_exp", "graft.icelite.connector.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ms_exp.warehouse", s"$dir/wh")
    val cat = new graft.icelite.Catalog(spark, s"$dir/wh")
    cat.createTable("db", "ev", Seq("id" -> "BIGINT"))
    val t = cat.loadTable("db", "ev")
    t.append(Seq(0L).toDF("id"))
    def start() = spark.readStream.table("ms_exp.db.ev")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }.start()
    val q = start()
    try { q.processAllAvailable() } finally q.stop()
    // two more commits, then expire everything but the head: the
    // checkpointed offset (snapshot 1) is gone
    t.append(Seq(1L).toDF("id"))
    t.append(Seq(2L).toDF("id"))
    t.expireSnapshots(System.currentTimeMillis() + 1000)
    assert(t.meta.snapshots.size == 1, "expire must leave only the head")
    val q2 = start()
    val e = intercept[Exception] { q2.processAllAvailable() }
    try {
      assert(e.getMessage.contains("unrecoverable") ||
        Option(e.getCause).exists(_.getMessage.contains("unrecoverable")),
        s"an expired offset must fail loudly, got: ${e.getMessage}")
    } finally q2.stop()
  }

  test("a changelog cursor EXPIRED from the source fails loudly instead of diverging") {
    // if the source expires snapshots past the persisted cursor, the
    // delete history inside the gap is unrecoverable: a silent diff from
    // an empty base replays live rows as idempotent upserts but never
    // emits the gap's deletes — the target would retain deleted keys
    // forever. The poll must fail loudly and demand a full resync.
    val dir = Files.createTempDirectory("chg_expired").toString
    val shape = Seq((0L, "x")).toDF("id", "kind")
    val src = IceLite.createFrom(spark, s"$dir/src", shape)
    val tgt = IceLite.createFrom(spark, s"$dir/tgt", shape)
    src.append((0L until 5L).map(i => (i, "a")).toDF("id", "kind"))
    assert(StreamingIngest.applyChangelogOnce(src, tgt, "id") >= 1)
    assert(tgt.read().count() == 5)
    // the gap the target never hears about: a delete, then expiry
    src.delete(col("id") === 2L)
    src.append(Seq((100L, "z")).toDF("id", "kind"))
    src.expireSnapshots(System.currentTimeMillis() + 1000)
    assert(!src.meta.snapshots.exists(_.id ==
        tgt.meta.properties("streaming.changelog-cursor").toLong),
      "fixture sanity: the cursor's snapshot must be expired")
    val e = intercept[IllegalArgumentException](
      StreamingIngest.applyChangelogOnce(src, tgt, "id"))
    assert(e.getMessage.contains("EXPIRED") &&
      e.getMessage.contains("full-resync"),
      s"an expired cursor must fail loudly, got: ${e.getMessage}")
    // the loud failure left no partial state behind
    assert(tgt.read().count() == 5)
  }
}
