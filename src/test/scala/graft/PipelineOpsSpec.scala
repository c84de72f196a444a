package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Value-level checks for the round-6 curation pipeline operators
  * (operators/PipelineOps.scala). Expected values were computed
  * independently with DuckDB on sf0.001 — the same engine the driver's
  * oracle gate uses, so these pin the semantics between driver runs.
  */
class PipelineOpsSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def run(name: String) = Registry.queries(name)(spark, sf)

  test("decontaminate_ngrams finds the planted overlaps and excludes the benchmark source") {
    val rows = run("decontaminate_ngrams").collect()
    val byDoc = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // DuckDB at sf0.001: 6 contaminated docs; spot-pin three of them
    assert(rows.length === 6)
    assert(byDoc(8) === 72L)
    assert(byDoc(50) === 18L)
    assert(byDoc(391) === 86L)
    // benchmark docs (source=src0) are never in the output
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.forall(r => srcOf(r.getLong(0)) != "src0"))
  }

  test("decontaminate_ngrams probes the benchmark set with a broadcast join") {
    val plan = run("decontaminate_ngrams").queryExecution.executedPlan
    val hasBcast = collectWithSubqueries(plan) {
      case p if p.nodeName.toLowerCase.contains("broadcast") => p
    }.nonEmpty
    assert(hasBcast, "train-side n-grams must never shuffle for the membership probe")
  }

  test("repetition_signals matches DuckDB and needs no shuffle before the sort") {
    val df = run("repetition_signals")
    val first = df.collect().head
    assert(first === Row(0L, 0.1304, 0.0909))
    // zero-shuffle claim: the only Exchange in the plan is the final
    // range partitioning for ORDER BY, never a hash partitioning
    val exchanges = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.forall(
      _.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]),
      s"unexpected hash exchange: ${exchanges.map(_.outputPartitioning)}")
  }

  test("repetition_signals maxFreq agrees with an explode-groupBy recount") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(50)
    val viaOp = run("repetition_signals").filter($"doc_id" < 50)
      .select($"doc_id", $"top_word_frac").as[(Long, Double)].collect().toMap
    val recount = docs
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id").agg(max("count").as("mx"), sum("count").as("nt"))
      .select($"doc_id", round($"mx".cast("double") / $"nt".cast("double"), 4))
      .as[(Long, Double)].collect().toMap
    assert(viaOp === recount)
  }

  test("sequence_pack fills sequences to the budget without overlap") {
    val rows = run("sequence_pack").collect()
    val src0 = rows.filter(_.getString(0) == "src0")
    assert(src0.head === Row("src0", 0L, 10L, 527L, 0L, 180L))
    // doc ranges of consecutive sequences within a source never overlap
    rows.groupBy(_.getString(0)).foreach { case (_, seqs) =>
      val sorted = seqs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4))
        case _           =>
      }
    }
  }

  test("sequence_pack_global two-pass prefix sum equals the single-window formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val viaOp = run("sequence_pack_global").collect().toSeq
    // reference: the naive single-window global cumsum (the one-reducer
    // shape the two-pass exists to avoid)
    val nTok = size(split(col("text"), " ")).cast("long")
    val ref = Tables.documents(spark, sf)
      .select(col("doc_id"), nTok.as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(Window.orderBy("doc_id")))
      .withColumn("seq_id",
        floor((col("cum") - col("n_tokens")).cast("double") / lit(512.0)).cast("long"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("seq_id").collect().toSeq
    assert(viaOp == ref)
  }

  test("domain_budget_sample respects the per-domain token budget") {
    val rows = run("domain_budget_sample").collect()
    val bySrc = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bySrc("src0") === ((8L, 509L)))
    assert(rows.forall(_.getLong(2) <= 600L))
  }

  test("sequence_pack_global output is invariant to the range-partition count") {
    val d = Tables.documents(spark, sf)
    val a = graft.operators.PipelineOps.sequencePackGlobalOp(d, 3).collect().toSeq
    val b = graft.operators.PipelineOps.sequencePackGlobalOp(d, 13).collect().toSeq
    assert(a.nonEmpty && a == b,
      "two-pass prefix sum must not depend on where range boundaries fall")
  }

  /** 1000 docs, 90% in one domain — the mega-domain fixture the skew-safe
    * per-source windows exist for. */
  private def hotSourceDocs = {
    import spark.implicits._
    (0 until 1000).map { i =>
      val src = if (i % 10 != 0) "hot" else s"cold${i % 50 / 10}"
      (i.toLong, src, Seq.fill(i % 7 + 1)(s"w$i").mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  test("sequence_pack spreads a 90%-hot source and matches the single-window formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val d = hotSourceDocs
    val viaOp = graft.operators.PipelineOps.sequencePackOp(d, buckets = 8)
      .collect().toSeq
    val nTok = size(split(col("text"), " ")).cast("long")
    val ref = d.select(col("source"), col("doc_id"), nTok.as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(Window.partitionBy("source").orderBy("doc_id")))
      .withColumn("seq_id",
        floor((col("cum") - col("n_tokens")).cast("double") / lit(512.0)).cast("long"))
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "seq_id").collect().toSeq
    assert(viaOp.nonEmpty && viaOp == ref,
      "skew-safe per-source packing diverged from the single-window reference")
    // reducer spread: the hot source's rows split across the (source, bkt)
    // window groups instead of one 900-row reducer partition
    val width = math.max(1L, 999L / 8 + 1L)
    val groups = d.filter(col("source") === "hot")
      .groupBy((col("doc_id") / width).cast("long")).count()
      .collect().map(_.getLong(1))
    assert(groups.length >= 6, s"hot source occupies only ${groups.length} buckets")
    assert(groups.max <= 150,
      s"largest hot-source slice ${groups.max} rows — bucketing failed to spread")
  }

  /** In-memory naive reference for the full trim pipeline: recompute dup
    * grams, covered positions, and the rebuilt text per doc sequentially,
    * and demand byte-identical md5s — independent of both the Spark
    * formulation AND the DuckDB oracle. */
  test("substring_dedup_trim equals a naive sequential reference") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val grams = docs.toSeq.flatMap { case (id, text) =>
      val w = text.split(" ")
      if (w.length < 8) Seq()
      else (0 to w.length - 8).map(i => (w.slice(i, i + 8).mkString(" "), id, i))
    }
    val dupGrams = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keySet
    val covered: Map[Long, Set[Int]] = grams
      .filter(g => dupGrams(g._1))
      .groupBy(_._2)
      .map { case (id, gs) => id -> gs.flatMap(g => g._3 until g._3 + 8).toSet }
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    val expected = docs.map { case (id, text) =>
      val w = text.split(" ")
      val bad = covered.getOrElse(id, Set())
      val kept = w.zipWithIndex.collect { case (t, i) if !bad(i) => t }
      id -> ((w.length.toLong, (w.length - kept.length).toLong, md5hex(kept.mkString(" "))))
    }
    val got = Registry.queries("substring_dedup_trim")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected, "trim output differs from the sequential reference")
    assert(expected.values.exists(_._2 > 0), "fixture produced no trims — test is vacuous")
  }

  test("domain_budget_sample spreads a 90%-hot source and matches the single-window formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val d = hotSourceDocs
    val viaOp = graft.operators.PipelineOps.domainBudgetSampleOp(d, 600L)
      .collect().toSeq
    val nTok = size(split(col("text"), " ")).cast("long")
    val h = md5(concat(lit("mix:"), col("doc_id").cast("string")))
    val ref = d.select(col("source"), col("doc_id"), nTok.as("n_tokens"), h.as("h"))
      .withColumn("cum", sum("n_tokens").over(Window.partitionBy("source").orderBy("h", "doc_id")))
      .filter(col("cum") <= 600L)
      .groupBy("source")
      .agg(count(lit(1)).as("docs_kept"), sum("n_tokens").as("tokens_kept"))
      .orderBy("source").collect().toSeq
    assert(viaOp.nonEmpty && viaOp == ref,
      "skew-safe budget sample diverged from the single-window reference")
    // md5-prefix buckets split the hot domain near-uniformly over 256 groups
    val groups = d.filter(col("source") === "hot")
      .groupBy(conv(substring(h, 1, 2), 16, 10).cast("long")).count()
      .collect().map(_.getLong(1))
    assert(groups.length >= 100, s"hot source occupies only ${groups.length} buckets")
    assert(groups.max <= 30,
      s"largest hot-source slice ${groups.max} rows — md5 bucketing failed to spread")
  }

  test("context_chunks tiles every document: stride 48, full coverage, content-true md5") {
    import org.apache.spark.sql.functions._
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = Registry.queries("context_chunks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, ch) =>
      val toks = texts(doc)
      val sorted = ch.sortBy(_._4)
      // chunk indexes are 0..n-1, starts stride by 48, every chunk is
      // nonempty, the last chunk ends exactly at nt — full coverage
      assert(sorted.map(_._4).toSeq == (0L until sorted.length.toLong).toSeq)
      sorted.foreach { case (_, nt, nc, idx, start, len, m) =>
        assert(nt == toks.length.toLong && nc == sorted.length.toLong)
        assert(start == idx * 48 && len == math.min(64L, nt - start) && len > 0)
        assert(m == md5hex(toks.slice(start.toInt, (start + len).toInt).mkString(" ")))
      }
      assert(sorted.last._5 + sorted.last._6 == toks.length.toLong,
        s"doc $doc: chunks stop before the document ends")
    }
  }
}
