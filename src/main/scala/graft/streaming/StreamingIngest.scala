package graft.streaming

import graft.icelite.IceLiteTable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured-Streaming front for the engine (SURVEY.md §2.10/§7.7 — the
  * reference itself has no streaming code; this is the labeled stretch:
  * the streaming ingestion path a lakehouse deployment runs, e.g.
  * Flink/Spark → Iceberg mentioned at README.md:832).
  *
  * Two composable pieces:
  *  - windowed event aggregation with watermarked late-data handling
  *  - exactly-once-per-batch append into an IceLite table via foreachBatch
  *    (each micro-batch becomes one atomic IceLite snapshot, giving the
  *    same commit semantics as Iceberg streaming writes)
  */
object StreamingIngest {

  /** Tumbling-window count/sum per event_type with a watermark bounding
    * state. Input must carry (ts TIMESTAMP, event_type STRING, value
    * DOUBLE). */
  def windowedEventAgg(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Streaming exact dedup — the streaming complement of `dedup_exact`:
    * keep the first arrival per content fingerprint, dropping duplicates
    * that arrive within the watermark horizon of each other. The state
    * store holds one entry per fingerprint and EVICTS keys once the
    * event-time watermark passes them — bounded by traffic inside the
    * horizon, never by stream lifetime (a plain dropDuplicates grows its
    * state forever; this is the only shape that survives an unbounded
    * ingest). Input: (ts TIMESTAMP, doc_id LONG, text STRING); output
    * carries the md5 fingerprint the dedup keyed on. */
  def dedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** One user-session aggregate (emitted when the session closes). */
  case class SessionUpdate(userId: Long, nEvents: Long, totalValue: Double,
      startMs: Long, endMs: Long)
  /** Per-key state (public: Catalyst's generated encoder code needs
    * constructor access). */
  case class SessionState(nEvents: Long, totalValue: Double,
      startMs: Long, lastMs: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState: events are
    * grouped per user; a session closes once the EVENT-TIME watermark
    * passes `gapMs` beyond the user's last event, emitting one summary
    * row. Event-time timeouts make sessions deterministic under replay and
    * late data (a processing-time variant would depend on wall clock).
    * State per key is O(1) — counts and bounds, never the events — which
    * keeps the state store bounded by |active users|, not traffic.
    * Input columns: user_id LONG, ts TIMESTAMP, value DOUBLE. */
  def sessionize(events: DataFrame, gapMs: Long): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapMs milliseconds")
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(userId, s.nEvents, s.totalValue, s.startMs, s.lastMs))
          } else {
            val batch = rows.map { case (_, ts, v) => (ts.getTime, v) }.toSeq
            val prev = state.getOption.getOrElse(
              SessionState(0, 0.0, batch.map(_._1).min, batch.map(_._1).min))
            val next = SessionState(
              prev.nEvents + batch.size,
              prev.totalValue + batch.map(_._2).sum,
              // a LATE-but-above-watermark event can precede the session's
              // recorded start — the emitted start must cover every event
              // the aggregates include
              math.min(prev.startMs, batch.map(_._1).min),
              math.max(prev.lastMs, batch.map(_._1).max))
            state.update(next)
            state.setTimeoutTimestamp(next.lastMs + gapMs)
            Iterator.empty
          }
      }
  }

  /** Stream-stream interval join — the attribution shape: match each
    * right-stream event (click) to the left-stream event (impression) with
    * the same `key` where right.ts lands in [left.ts, left.ts + within].
    * Watermarks on BOTH sides are what bound the join state: Spark keeps
    * only rows younger than watermark + interval, so state is
    * O(traffic × window), not unbounded — the property that lets this run
    * for months on a 1000-executor cluster. Inputs carry (key LONG,
    * ts TIMESTAMP, value DOUBLE); output is one row per matched pair. */
  def intervalJoin(impressions: DataFrame, clicks: DataFrame,
      within: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val imp = impressions.withWatermark("ts", watermark)
      .select(col("key").as("i_key"), col("ts").as("i_ts"),
        col("value").as("i_value"))
    val clk = clicks.withWatermark("ts", watermark)
      .select(col("key").as("c_key"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    imp.join(clk,
      expr(s"i_key = c_key AND c_ts >= i_ts AND c_ts <= i_ts + interval $within"))
      .select(col("i_key").as("key"), col("i_ts"), col("c_ts"),
        col("i_value"), col("c_value"))
  }

  /** Stream-STATIC enrichment join: attach dimension attributes to a
    * stream without any streaming state. The static side is a plain batch
    * DataFrame (a dimension table, re-read per micro-batch if its source
    * changes); Spark plans it as an ordinary broadcast/hash join inside
    * each micro-batch — no watermark needed, unmatched stream rows pass
    * through with NULL attributes (left join keeps the fact stream
    * lossless). This is the lookup-enrichment pattern (user → segment,
    * item → category) that precedes every streaming aggregation at scale;
    * the dimension broadcasts, the unbounded side never shuffles. */
  def enrichStream(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream → IceLite: every micro-batch appends as one snapshot,
    * EXACTLY-ONCE per batch. foreachBatch alone is at-least-once (a restart
    * after the table append but before the checkpoint commit replays the
    * batch); appendIfNewBatch closes that window by recording the batch id
    * in the table properties inside the same atomic commit and skipping
    * replayed ids — the idempotent-writer pattern Iceberg streaming sinks
    * use. Append output mode: each row is emitted exactly once (Update mode
    * would re-append every changed aggregate row per trigger, duplicating
    * rows in an append-only table). */
  def writeToIceLite(stream: DataFrame, table: IceLiteTable,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try { if (!batch.isEmpty) { table.appendIfNewBatch(batchId, batch); () } }
        finally { batch.unpersist(); () }
      }

  /** Streaming UPSERT into IceLite: each micro-batch MERGEs on `key`
    * (update matches, insert the rest) — the CDC-apply pattern for keyed
    * streams (dimension updates, latest-state tables). Exactly-once per
    * batch via the same idempotent-writer protocol as appends: the batch
    * id commits atomically with the merge, so a restart-replayed batch is
    * a no-op instead of a double-apply. Update output mode: the stream
    * re-emits changed keys per trigger, and MERGE makes re-application
    * idempotent in content (last write per key wins). */
  def upsertToIceLite(stream: DataFrame, table: IceLiteTable, key: String,
      seqCol: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist: isEmpty + the write are two actions — without it the
        // micro-batch lineage executes twice per trigger
        batch.persist()
        try {
          if (!batch.isEmpty) {
            table.mergeIfNewBatch(batchId,
              collapseLatestPerKey(batch, key, seqCol), key)
            ()
          }
        } finally { batch.unpersist(); () }
      }

  /** A micro-batch can carry several events per key: MERGE/upsert require
    * unique source keys, so pre-collapse to the LATEST event per key by
    * `seqCol` (event time / CDC sequence number). One max-struct
    * aggregation — deterministic, no window shuffle. */
  private def collapseLatestPerKey(batch: DataFrame, key: String,
      seqCol: String): DataFrame = {
    val payload = batch.columns.filter(_ != key)
    val ordered = seqCol +: payload.filterNot(_ == seqCol)
    batch
      .groupBy(col(key))
      .agg(max(struct(ordered.map(col): _*)).as("_last"))
      .select(col(key) +: payload.map(c => col(s"_last.$c").as(c)): _*)
  }

  /** One poll of the CDC-tail loop: consume the SOURCE table's changelog
    * increments since the persisted cursor and apply them to `target`,
    * keyed by `key`. Returns the number of commit versions applied.
    *
    * Planning is O(churn): `readChangesBetween(cursor, head)` diffs file
    * sets on the driver and scans only changed files, so tailing a
    * 100 TB table reads each poll's delta, never the table. Application
    * is CONTENT-IDEMPOTENT per version — updates/inserts go through
    * [[IceLiteTable.upsertEq]] (equality-delete + append, O(batch), no
    * target scan) and pure deletes through [[IceLiteTable.deleteEq]] —
    * and the cursor advances in the target's properties after each
    * version, so a crash replays at most one version and the replay
    * re-produces the same content. Compaction/z-order commits on the
    * source are `replace` snapshots the changelog already skips. */
  def applyChangelogOnce(source: IceLiteTable, target: IceLiteTable,
      key: String): Long = {
    val cursorKey = "streaming.changelog-cursor"
    val from = target.meta.properties.get(cursorKey).map(_.toLong).getOrElse(0L)
    val sourceMeta = source.meta
    val head = sourceMeta.currentSnapshotId.getOrElse(0L)
    if (head <= from) return 0L
    // cursor integrity: if the source EXPIRED snapshots past the cursor,
    // readChangesBetween would diff from an empty base — live rows would
    // replay as idempotent upserts, but keys deleted inside the expired
    // gap would never emit deletes and the target retains them forever.
    // Fail loudly instead: the operator must full-resync (rebuild the
    // target and clear the cursor) or widen the source's retention.
    require(from == 0L || sourceMeta.snapshots.exists(_.id == from),
      s"streaming changelog: cursor snapshot $from was EXPIRED from the " +
        s"source (oldest retained: ${sourceMeta.snapshots.headOption.map(_.id).getOrElse(-1L)}) — " +
        "the delete history in the gap is unrecoverable; full-resync the " +
        "target (rebuild + clear streaming.changelog-cursor) or retain " +
        "more source history")
    val changes = source.readChangesBetween(from, head).persist()
    try {
      val versions = changes.select("_commit_version").distinct()
        .collect().map(_.getLong(0)).sorted // O(commits in the increment)
      for (v <- versions) {
        val step = changes.filter(col("_commit_version") === v)
        val ins = step.filter(col("_change_type") === "insert")
          .drop("_change_type", "_commit_version")
        // a key both deleted and re-inserted in the version is an UPDATE
        // — the upsert's equality delete covers it; only pure deletes
        // need their own delete commit
        val pureDel = step.filter(col("_change_type") === "delete")
          .select(col(key)).distinct()
          .join(ins.select(col(key)), Seq(key), "left_anti")
        if (!pureDel.isEmpty) target.deleteEq(pureDel)
        if (!ins.isEmpty) target.upsertEq(ins, Seq(key))
        target.setProperties(Map(cursorKey -> v.toString))
      }
      // advance to the polled head even when the newest source commits
      // produced no change rows (compaction `replace` points, net-zero
      // steps) — without this the cursor parks below head and every
      // poll re-reads and re-applies the same suffix forever
      if (versions.lastOption.forall(_ < head))
        target.setProperties(Map(cursorKey -> head.toString))
      versions.length.toLong
    } finally { changes.unpersist(); () }
  }

  /** The CDC-apply loop AS A STREAM: `ticks` (any streaming DataFrame —
    * a rate source in production, a MemoryStream in tests) drives polls;
    * each trigger runs [[applyChangelogOnce]], so the target table
    * continuously replicates the source through its changelog — the
    * streaming closure of `create_changelog_view` + the incremental
    * read. */
  def replicateChangelog(ticks: DataFrame, source: IceLiteTable,
      target: IceLiteTable, key: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    ticks.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (_: DataFrame, _: Long) =>
        applyChangelogOnce(source, target, key); ()
      }

  /** Streaming curation funnel — the continuous version of
    * `curation_incremental`: a crawl stream is curated against STANDING
    * indexes and lands exactly-once in an IceLite table. Stages, in the
    * order a 100 TB deployment wants them (cheapest-first, state-bounded):
    *
    *  1. quality gate — `pretraining_pipeline`'s integer rule score, a
    *     narrow stateless projection (no shuffle, no state);
    *  2. standing-index dedup — stream-static LEFT join on the corpus
    *     fingerprint index with an IS NULL filter (anti semantics; the
    *     static side re-plans per micro-batch, so a nightly index refresh
    *     is picked up without restarting the query);
    *  3. in-stream dedup — `dropDuplicatesWithinWatermark` on the content
    *     fingerprint: ONE state entry per fingerprint, EVICTED once the
    *     event-time watermark passes it — bounded by traffic inside the
    *     horizon, never by stream lifetime;
    *  4. eval decontamination — EXACT word-4-gram overlap against the
    *     benchmark gram set, run per micro-batch inside foreachBatch
    *     (explode → broadcast semi-join → doc-level anti-join): batch
    *     scope makes the doc-level aggregation legal and exact where a
    *     pure streaming plan would force a bloom-filter approximation;
    *  5. exactly-once append — `appendIfNewBatch` commits the batch id
    *     atomically with the data, so restart replays are no-ops.
    *
    * Input stream: (ts TIMESTAMP, doc_id LONG, source STRING, text
    * STRING). `existingFp` is a static (fp STRING) index; `benchGrams` a
    * static (g STRING) eval-gram set (kept broadcast, as in
    * `decontaminate_ngrams`). The sink table receives (doc_id, source,
    * text, nw) — survivors with their token count. */
  def curateStreamToIceLite(docs: DataFrame, existingFp: DataFrame,
      benchGrams: DataFrame, table: IceLiteTable, checkpoint: String,
      watermark: String = "10 minutes"): DataStreamWriter[org.apache.spark.sql.Row] = {
    val gated = docs
      .selectExpr("ts", "doc_id", "source", "text", "md5(text) AS fp",
        "CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT) AS nw",
        "CAST(size(filter(split(text, ' '), x -> x = 'a' OR x = 'the')) AS BIGINT) AS stop",
        "CAST(length(replace(text, ' ', '')) AS BIGINT) AS letters")
      .selectExpr("ts", "doc_id", "source", "text", "fp", "nw",
        s"${graft.operators.PipelineOps.QualityScoreSql} AS score")
      .filter(col("score") >= 400L)
    val fresh = gated
      .join(existingFp.select(col("fp"), lit(1L).as("_hit")), Seq("fp"), "left")
      .filter(col("_hit").isNull).drop("_hit")
    val deduped = fresh
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
    deduped.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist: the gate/join/dedup lineage feeds FOUR actions per
        // trigger (isEmpty, the gram broadcast build, out.isEmpty, the
        // write) — without it each re-executes the whole micro-batch plan
        batch.persist()
        try if (!batch.isEmpty) {
          val grams = batch.select(col("doc_id"),
            explode(graft.operators.PipelineOps.wordNgramParts(col("text"), 4)).as("p"))
            .select(col("doc_id"), graft.operators.PipelineOps.gramOf(col("p"), 4).as("g"))
          val contaminated = grams
            .join(broadcast(benchGrams.select("g")), Seq("g"), "left_semi")
            .select("doc_id").distinct()
          val out = batch
            .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
            .select("doc_id", "source", "text", "nw")
          // skip fully-contaminated batches: batch ids only dedup replays
          // of batches that WROTE, so no empty snapshots pile up
          if (!out.isEmpty) { table.appendIfNewBatch(batchId, out); () }
        } finally { batch.unpersist(); () }
      }
  }

  /** Streaming UPSERT via EQUALITY deletes — same contract as
    * [[upsertToIceLite]] (latest event per key wins, exactly-once per
    * batch) but with O(batch) write cost: the batch's keys become an
    * equality-delete file and its rows append under one shared sequence
    * number, so NO target file is scanned or rewritten. At 100 TB this is
    * the difference between a CDC sink whose latency tracks batch size and
    * one whose latency tracks table size; the trade is read-side (each
    * scan anti-joins the accumulated key sets until compaction folds them
    * in — schedule compaction by delete-file count). */
  def upsertEqToIceLite(stream: DataFrame, table: IceLiteTable, key: String,
      seqCol: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty) {
            table.upsertEqIfNewBatch(batchId,
              collapseLatestPerKey(batch, key, seqCol), Seq(key))
            ()
          }
        } finally { batch.unpersist(); () }
      }
}
