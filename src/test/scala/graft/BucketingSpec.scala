package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY.md §4 / scale brief): writing both
  * sides bucketed+sorted on the join key lets Spark join with NO exchange —
  * the big-table⋈big-table strategy when broadcast is impossible. On a
  * 100 TB fact-fact join this removes the dominant shuffle entirely.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed+sorted tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
      o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      // same join on the raw (unbucketed) parquet DOES shuffle — the contrast
      val rawJoin = li.join(o, col("l_orderkey") === col("o_orderkey"))
      rawJoin.collect()
      assert(rawJoin.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))

      // and results agree
      assert(joined.count() == rawJoin.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
