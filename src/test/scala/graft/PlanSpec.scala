package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Physical-plan assertions (SURVEY.md §4) — the optimizations the
  * reference teaches must actually appear in the executed plan:
  * predicate pushdown to parquet, partition pruning on hive layouts,
  * broadcast joins for dimensions, whole-stage codegen on the agg path.
  * These are the 100 TB guarantees: a plan that silently loses its
  * PushedFilters reads the whole table.
  */
class PlanSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private def planOf(name: String): String =
    Registry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("pushdown_count pushes the user_id predicate into the parquet scan") {
    val plan = planOf("pushdown_count")
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(user_id,42)"),
      s"predicate not pushed:\n$plan")
  }

  test("pushdown_count prunes columns to user_id only") {
    val plan = planOf("pushdown_count")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("user_id") && !readSchema.contains("event_type"),
      s"column pruning failed: $readSchema")
  }

  test("Explain helper: golden formatted plan for pushdown_count") {
    val txt = graft.tools.Explain.explain("pushdown_count", spark, sf)
    assert(txt.contains("PushedFilters") && txt.contains("EqualTo(user_id,42)"),
      s"formatted plan lost the pushed filter:\n$txt")
    // the only exchange a global count needs is the SinglePartition gather
    // for the final aggregate — a wide hash shuffle would mean the plan
    // degenerated
    assert(!txt.contains("Exchange hashpartitioning"),
      s"unexpected wide shuffle in a pushed-down count:\n$txt")
    // (whole-stage codegen is asserted on the EXECUTED plan in the
    // pricing_summary test — AQE's formatted pre-execution plan does not
    // carry codegen annotations)
  }

  test("Explain helper rejects unknown query names with the available list") {
    val e = intercept[IllegalArgumentException] {
      graft.tools.Explain.explain("no_such_query", spark, sf)
    }
    assert(e.getMessage.contains("pushdown_count"))
  }

  test("pk_lookup pushes the key equality (row-group skipping eligible)") {
    val plan = planOf("pk_lookup")
    assert(plan.contains("EqualTo(o_orderkey,500)"), s"no pushed key filter:\n$plan")
  }

  test("hive-partitioned scan prunes to the matching year directory") {
    val out = Files.createTempDirectory("planspec_part").toString + "/t"
    Tables.orders(spark, sf).withColumn("year", year(col("o_orderdate")))
      .repartition(col("year")).write.partitionBy("year").parquet(out)
    val df = spark.read.parquet(out).filter(col("year") === 1996)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters:") && scan.contains("year"),
      s"no partition filter:\n$scan")
    // pruning proof by files read: one year dir = 1 clustered file
    val filesRead = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles }
    assert(filesRead.contains(1L), s"expected 1 file after pruning, got $filesRead")
  }

  test("join_revenue_by_nation broadcasts all three dimension tables") {
    val plan = planOf("join_revenue_by_nation")
    val broadcasts = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts:\n$plan")
  }

  test("pricing_summary aggregates inside whole-stage codegen") {
    val df = Registry.queries("pricing_summary")(spark, sf)
    df.collect() // finalize the adaptive plan — codegen spans only show then
    val plan = df.queryExecution.executedPlan.toString
    // codegen stages render as "*(n) Op" in the simple plan string
    assert(plan.contains("*(") && plan.contains("*(2) HashAggregate") ||
      plan.linesIterator.exists(l => l.contains("*(") && l.contains("HashAggregate")),
      s"HashAggregate not inside a codegen stage:\n$plan")
  }

  test("order_topk plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf("order_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not optimized:\n$plan")
  }

  test("MoR delete read applies positions without a join or exchange") {
    val loc = Files.createTempDirectory("planspec_mor").toString + "/t"
    val t = graft.icelite.IceLite.createFrom(spark, loc, Tables.orders(spark, sf),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t.append(Tables.orders(spark, sf))
    t.delete(col("o_orderkey") % 7 === 0)
    assert(t.meta.currentSnapshot.get.deleteFiles.nonEmpty, "MoR delete wrote no delete files")
    val df = t.read()
    df.collect() // finalize adaptive plan so codegen spans render
    val plan = df.queryExecution.executedPlan.toString
    // deletion vectors must be a broadcast per-file position FILTER in the
    // scan stage — at 100 TB a (_file,_pos) anti-join shuffles the fact table
    assert(!plan.contains("Join"), s"MoR read plans a join:\n$plan")
    assert(!plan.contains("Exchange"), s"MoR read shuffles the data side:\n$plan")
    // and the filter is the codegen'd expression inside a WholeStageCodegen
    // span, not a codegen-breaking UDF
    assert(plan.contains("position_live"), s"PositionLive missing:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF"),
      s"MoR filter fell back to a UDF:\n$plan")
    val filterLine = plan.linesIterator.find(_.contains("position_live")).getOrElse("")
    assert(filterLine.contains("*("), s"MoR filter not in a codegen span: $filterLine")
    val expected = Tables.orders(spark, sf).filter(col("o_orderkey") % 7 =!= 0).count()
    assert(t.read().count() == expected)
  }

  test("equality-delete read anti-joins a BROADCAST key set; data side never shuffles") {
    import spark.implicits._
    val loc = Files.createTempDirectory("planspec_eq").toString + "/t"
    val t = graft.icelite.IceLite.createFrom(spark, loc, Tables.orders(spark, sf))
    t.append(Tables.orders(spark, sf))
    t.deleteEq(Seq(1L, 2L, 3L).toDF("o_orderkey"))
    val df = t.read()
    val plan = df.queryExecution.executedPlan
    val antiJoins = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antiJoins.nonEmpty, s"eq delete must apply as a broadcast anti-join:\n$plan")
    // the key side may shuffle its tiny distinct; the DATA side (the join's
    // streamed/left subtree — 100 TB at scale) must be a bare scan
    antiJoins.foreach { j =>
      val dataShuffles = j.left.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(dataShuffles.isEmpty,
        s"the data side of an eq-delete read must not shuffle:\n$plan")
    }
    assert(df.count() == Tables.orders(spark, sf).count() - 3)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // Catalyst's InjectRuntimeFilter: a selective predicate on the dim side
    // of a shuffle join grows a bloom filter that is pushed into the fact
    // scan — at 100 TB this is the difference between shuffling the whole
    // fact table and shuffling the ~1% that can possibly join. Thresholds
    // are sized for clusters; lower them to demonstrate at test scale.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val fact = Tables.lineitem(spark, sf)
      val dim = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n${optimized.take(3000)}")
      assert(j.collect().nonEmpty)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("AQE splits a skewed join partition at runtime (skew-join re-plan)") {
    // the runtime complement to the manual salting in skew_salted_agg:
    // one hot key owns most of the fact side; AQE detects the oversized
    // shuffle partition at stage boundary and splits it across tasks.
    // Thresholds are cluster-sized — lower them to demonstrate at test
    // scale. Assert on the FINAL adaptive plan (post-execution).
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.range(0, 200000).select(
        when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val dim = spark.range(0, 200000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = fact.join(dim, "k").agg(sum(col("v") + col("w")))
      j.collect() // drive to completion so AQE finalizes the plan
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
      assert(finalPlan.toLowerCase.contains("skew"),
        s"AQE did not mark/split the skewed partition:\n${finalPlan.take(3000)}")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("IceLite manifest pruning reads only matching files (I/O level)") {
    val loc = Files.createTempDirectory("planspec_il").toString + "/t"
    val t = graft.icelite.IceLite.createFrom(spark, loc,
      Tables.orders(spark, sf), partition = Seq("o_orderdate" -> "year"))
    t.append(Tables.orders(spark, sf))
    val all = t.meta.currentSnapshot.get.dataFiles.size
    val pruned = t.read(p => p("o_orderdate_year") == "1996")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.length }
    assert(all > 1 && scanned.exists(_ < all),
      s"manifest pruning ineffective: $scanned of $all files")
  }

  test("IVF md5 codebook plans as TakeOrderedAndProject, not a global sort") {
    // the O(k)-driver-cost claim rests on this: each partition keeps its
    // local top-k and the driver merges winners — a global Sort + Limit
    // would shuffle the corpus
    val e = Tables.embeddings(spark, sf)
    val plan = e.select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"codebook sample degenerated:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"codebook sample shuffles the corpus:\n$plan")
  }

  test("repeated_ngram_spans expands the corpus grams exactly once") {
    // the corpus-sized gram stream must cross the network once: one
    // Generate(explode) in the whole plan — a second one would mean the
    // expansion is recomputed for another shuffle (the n_positions side
    // uses size() only, no explode)
    val plan = Registry.queries("repeated_ngram_spans")(spark, sf)
      .queryExecution.executedPlan.toString
    val explodes = plan.linesIterator.count(_.contains("Generate explode"))
    assert(explodes == 1,
      s"expected exactly 1 gram expansion, found $explodes:\n${plan.take(3000)}")
  }

  test("skew-safe curation windows broadcast the carry-in, never shuffle it wide") {
    // perSourceCum's carry table is |sources|·|buckets| rows — it must
    // arrive at the big side as a broadcast join
    val plan = Registry.queries("sequence_pack")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"carry-in join is not broadcast:\n${plan.take(3000)}")
  }

  test("funnel stages stay equi-join shaped and push the type filter") {
    // stage tables are user-cardinality — too big to force-broadcast at
    // 100 TB. The plan must remain a keyed equi-join (broadcast only if
    // AQE's runtime stats justify it), never a cartesian / nested-loop,
    // and the event_type filters must reach the parquet scan.
    val plan = Registry.queries("funnel_stages")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel stage join degenerated:\n${plan.take(3000)}")
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(event_type,"),
      "event_type filter not pushed to the parquet scan")
  }

  test("retention cohorts stay equi-join shaped — no forced broadcast, no cartesian") {
    val plan = Registry.queries("retention_cohorts")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cohort join degenerated:\n${plan.take(3000)}")
  }

  test("embed_centroid partial-aggregates the exploded dims map-side") {
    // the explode amplifies rows ×64, but the shuffle must carry only the
    // label×dim partials — HashAggregate must appear below the Exchange
    val plan = Registry.queries("embed_centroid")(spark, sf)
      .queryExecution.executedPlan.toString
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate pair, got $aggs:\n${plan.take(3000)}")
    assert(plan.contains("partial_sum"),
      s"no map-side partial aggregation:\n${plan.take(3000)}")
  }

  test("quality_classifier is a zero-shuffle projection over the scan") {
    // the first-pass corpus filter must fuse into the scan: the only
    // exchange allowed is the final presentation sort's range partitioner
    val plan = Registry.queries("quality_classifier")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"classifier plan grew a wide shuffle:\n${plan.take(3000)}")
  }

  test("bm25_topk broadcasts df/totals and takes top-k without a global sort") {
    // both sides of the scoring join are bounded (|query| terms, 1 totals
    // row) — a sort-merge join or a full Sort for the limit would mean the
    // docs-sized side shuffles more than its one tf aggregation
    val plan = Registry.queries("bm25_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"bm25 joined df/totals via sort-merge:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"bm25 top-k is a global sort:\n${plan.take(3000)}")
  }

  test("ewma_smooth windows partition by event_type — no single-partition window") {
    val plan = Registry.queries("ewma_smooth")(spark, sf)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(!windows.contains("SinglePartition"),
      s"EWMA window collapsed to one partition:\n$windows")
  }

  test("quantile_sketch samples via TakeOrderedAndProject — the corpus never sorts") {
    // bottom-k-by-hash must plan as per-partition top-k + driver merge;
    // a global Sort would make the 'sketch' as expensive as the exact path
    val plan = Registry.queries("quantile_sketch")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"sample is a global sort:\n${plan.take(3000)}")
  }

  test("semdedup_prune joins pairs on cell id — no cartesian, no all-pairs") {
    val plan = planOf("semdedup_prune")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"semdedup pair generation degenerated to all-pairs:\n${plan.take(3000)}")
  }

  test("minhash_incremental screens slice-vs-corpus by band-bucket keys — never all-pairs") {
    // the candidate stage must stay a keyed equi-join on (band, bucket):
    // a cartesian/nested-loop here is the O(slice × corpus) blow-up the
    // banding exists to avoid
    val plan = planOf("minhash_incremental")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"slice-vs-corpus candidate generation degenerated to all-pairs:\n${plan.take(3000)}")
    // positive shape: the candidate stage is a hash join KEYED on the band
    // bucket (signatures are checkpointed BEFORE the join, so unlike the
    // edit_distance case the join is inspectable here)
    assert(plan.linesIterator.exists(l =>
      l.contains("HashJoin") && l.contains("band") && l.contains("bucket")),
      s"no band/bucket-keyed hash join in the plan:\n${plan.take(3000)}")
  }

  test("embed_decontaminate broadcasts the eval side and partial-aggregates best-of") {
    val plan = planOf("embed_decontaminate")
    assert(plan.contains("BroadcastExchange"),
      s"eval set not broadcast:\n${plan.take(3000)}")
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"best-of is not a partial aggregate (window over all pairs?):\n${plan.take(3000)}")
  }

  test("url_canonical_dedup is joinless — narrow regexp map + partial-agg'd rollups") {
    val plan = planOf("url_canonical_dedup")
    assert(!plan.contains("Join"), s"URL audit grew a join:\n${plan.take(3000)}")
    assert(plan.contains("partial"),
      s"domain rollup lost its map-side partial:\n${plan.take(3000)}")
  }

  test("cross_source_overlap joins on gram keys — never all-pairs") {
    val plan = planOf("cross_source_overlap")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"source-pair generation degenerated to all-pairs:\n${plan.take(3000)}")
    assert(plan.contains("partial"),
      s"(source, gram) distinct lost its map-side partial:\n${plan.take(3000)}")
  }

  test("pretraining_pipeline windows by text key and keeps partial aggregation") {
    val plan = planOf("pretraining_pipeline")
    val windows = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(!windows.contains("SinglePartition"),
      s"dedup window collapsed to one partition:\n$windows")
    assert(plan.contains("partial"),
      s"funnel rollup lost its map-side partial:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"),
      s"unexpected cartesian:\n${plan.take(3000)}")
  }

  test("gopher_quality_rules is a narrow map — no hash shuffle before the final sort") {
    val plan = planOf("gopher_quality_rules")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"per-doc rule evaluation shuffled (the run-length HOF should stay narrow):\n${plan.take(3000)}")
  }

  test("rare_bigram_rate takes top-K without a global sort and broadcast-probes membership") {
    val plan = planOf("rare_bigram_rate")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-200 bigram cut is a global sort:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"common-set membership is not a broadcast hash probe:\n${plan.take(3000)}")
    assert(plan.contains("partial_count") || plan.contains("partial count") || plan.contains("partial"),
      s"bigram/doc aggregates lost their map-side partials:\n${plan.take(3000)}")
    // the bigram stream must never sort-merge (its joins are all broadcast)
    assert(!plan.linesIterator.exists(l => l.contains("SortMergeJoin") && l.contains("bg")),
      s"bigram stream shuffled through a SortMergeJoin:\n${plan.take(3000)}")
  }

  test("edit_distance_pairs generates candidates by bucket join — never all-pairs") {
    // the registered query localCheckpoints (its executedPlan is just a
    // Scan ExistingRDD — asserting on it would be vacuous AND would
    // execute the whole job); assert on the pre-checkpoint scored plan
    val qe = graft.operators.TextOps.editDistanceScored(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation degenerated to all-pairs:\n${plan.take(3000)}")
    // the levenshtein DP must sit ABOVE the explicit candidate-keyed
    // repartition (below it = evaluated in the join stage, where AQE
    // coalescing can pack the compute-dense rows into one partition)
    val lines = plan.linesIterator.toSeq
    val dpIdx = lines.indexWhere(_.contains("levenshtein"))
    val exIdx = lines.indexWhere(l =>
      l.contains("Exchange hashpartitioning") && l.contains("id1"))
    assert(dpIdx >= 0 && exIdx >= 0 && dpIdx < exIdx,
      s"levenshtein projection not above the candidate repartition (dp@$dpIdx ex@$exIdx):\n${plan.take(3000)}")
    // exactly one DP site: Project/Filter collapse used to re-inline the
    // CASE ~3× (filter conjuncts + projection) — the materialize-behind-
    // checkpoint restructure pins it to one
    val dpCount = lines.count(_.contains("levenshtein"))
    assert(dpCount == 1, s"expected 1 levenshtein site, got $dpCount:\n${plan.take(3000)}")
  }

  test("curation_incremental broadcasts the benchmark grams; slice grams never wide-join") {
    val plan = planOf("curation_incremental")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel degenerated to a nested-loop join:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark n-gram probe is not a broadcast hash join:\n${plan.take(3000)}")
    // the slice's gram stream must not shuffle through a SortMergeJoin —
    // the bench side is tiny by construction and must stay broadcast
    val smjLines = plan.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(!smjLines.exists(_.contains("g#")),
      s"gram stream shuffled through a SortMergeJoin:\n${smjLines.mkString("\n")}")
  }

  test("multimodal_phash_near_dup verifies only band collisions — never all-pairs") {
    val plan = planOf("multimodal_phash_near_dup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation degenerated to all-pairs:\n${plan.take(3000)}")
  }

  test("minhash_decontaminate broadcasts the eval side; train signatures never wide-join") {
    val plan = planOf("minhash_decontaminate")
    val bcasts = plan.linesIterator.count(_.contains("BroadcastExchange"))
    assert(bcasts >= 3, // eval ids (×2: probe + anti), eval buckets, eval shingles
      s"eval side not broadcast (saw $bcasts BroadcastExchange):\n${plan.take(3000)}")
    // the banding probe and the Jaccard verify must join via broadcast —
    // a SortMergeJoin on the bucket or shingle stream means the 100 TB
    // train side is being shuffled
    val smjLines = plan.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(!smjLines.exists(l => l.contains("bucket") || l.contains("esh")),
      s"train bucket/shingle stream shuffled through a SortMergeJoin:\n${smjLines.mkString("\n")}")
  }

  test("context_chunks expands chunks with a single Generate and no pre-sort shuffle") {
    val plan = planOf("context_chunks")
    val generates = plan.linesIterator.count(_.contains("Generate "))
    assert(generates == 1, s"expected exactly one Generate, got $generates:\n${plan.take(3000)}")
    val beforeSort = plan.substring(plan.indexOf("Sort"))
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"chunk expansion shuffles before the final sort:\n${plan.take(3000)}")
  }

  test("mixture_weights and quality_weighted_sample partial-aggregate per source") {
    Seq("mixture_weights", "quality_weighted_sample").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("partial"),
        s"$q: per-source aggregate lost its map-side partial:\n${plan.take(3000)}")
      assert(!plan.contains("CartesianProduct") ||
        plan.contains("BroadcastExchange"), // the 1-row totals broadcast is fine
        s"$q: unexpected cartesian without broadcast:\n${plan.take(3000)}")
    }
  }

  test("pagerank iterations read checkpointed nodes/edges, not parquet per round") {
    // the node and edge lists are localCheckpoint'd before the loop: the
    // final plan's K iterations must reference cached RDD blocks — a
    // parquet scan inside the iterated plan means the graph is re-derived
    // from disk every round
    val plan = Registry.queries("pagerank_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"pagerank plan still scans parquet inside the loop:\n${plan.take(3000)}")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"expected checkpointed RDD scans:\n${plan.take(3000)}")
  }

  test("triangle_count stays equi-join shaped — no cartesian product") {
    val plan = Registry.queries("triangle_count")(spark, sf)
      .queryExecution.executedPlan.toString
    // the only permissible cross joins are the final single-row stat
    // combinations; the wedge join itself must key on (u) and (v, w)
    assert(!plan.contains("CartesianProduct"),
      s"wedge join degenerated to a cartesian product:\n${plan.take(3000)}")
  }

  test("ngram_novelty: one gram-keyed exchange with partial aggregation, no joins") {
    val plan = planOf("ngram_novelty")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"),
      s"novelty curve grew a join — min-over-window plus fold needs none:\n${plan.take(3000)}")
    assert(plan.contains("partial_count") || plan.contains("partial_sum") ||
      plan.linesIterator.exists(l => l.contains("HashAggregate") && l.contains("partial")),
      s"doc-side fold lost its map-side partial aggregation:\n${plan.take(3000)}")
  }

  test("hard_negatives broadcasts the probe set; corpus never shuffles raw scores wide") {
    val plan = planOf("hard_negatives")
    // the probe side must ride a broadcast nested-loop (crossJoin of ≤10
    // broadcast rows) — a SortMergeJoin anywhere on the score stream means
    // the 100 TB corpus shuffled before the bounded top-k partial
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"probe set is not broadcast:\n${plan.take(3000)}")
    val smjLines = plan.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(!smjLines.exists(_.contains("score#")),
      s"raw score stream shuffled through a SortMergeJoin:\n${smjLines.mkString("\n")}")
  }

  test("paragraph_dedup is join-free: one content-keyed window, no second corpus expansion") {
    val plan = planOf("paragraph_dedup")
    // keep-first is a row_number INSIDE the paragraph partition; the
    // rebuild re-aggregates the same stream by doc_id — any join means a
    // second expansion of the corpus joined back against the first
    assert(!plan.contains("Join"),
      s"paragraph dedup grew a join:\n${plan.take(3000)}")
    // the window key is the paragraph content (Dolma's dedup key): the
    // first wide exchange must hash on para, not on doc_id
    val firstHash = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq.lastOption.getOrElse("")
    assert(firstHash.contains("para#"),
      s"bottom-most exchange is not keyed on paragraph content: $firstHash")
  }

  test("shard_manifest is a single join-free partial aggregate over one scan") {
    val plan = planOf("shard_manifest")
    // map-side combine reduces each executor to ≤16 rows before the only
    // exchange; a join or a second scan means the manifest re-reads the
    // corpus it is supposed to summarize in one pass
    assert(plan.contains("partial_sum"),
      s"manifest aggregate lost its map-side partial:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), s"manifest grew a join:\n${plan.take(3000)}")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected one corpus scan, got $scans:\n${plan.take(3000)}")
  }

  test("mixing_schedule partial-aggregates per source and broadcasts the 1-row total") {
    val plan = planOf("mixing_schedule")
    assert(plan.contains("partial_sum"),
      s"per-source aggregate lost its map-side partial:\n${plan.take(3000)}")
    // the Σw/Σchars totals join the |sources|-row frame via broadcast —
    // a SortMergeJoin here would shuffle for a single-row side
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"totals row is not broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"unexpected sort-merge join against a 1-row side:\n${plan.take(3000)}")
  }
}
