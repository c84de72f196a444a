package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with total + per-query seconds over
  * SparkEntry.queries at SPARK_GRAFT_SF_DIR (contract per the builder
  * prompt). A short untimed warmup (scan each input table + one tiny write)
  * runs first so codegen/classloading/committer setup doesn't land on
  * whichever query happens to run first; queries are then timed in sorted
  * name order for run-to-run comparability, each twice with the min
  * reported (shared-box load spikes must not read as regressions), and a
  * final canary re-times the first query so a contended run is
  * self-evident in the artifact.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.icelite.connector.IceLiteExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
      Tables.events(spark, sfDir).count()
      val wtmp = java.nio.file.Files.createTempDirectory("bench_warm").toString
      spark.range(1000).toDF("i").write.parquet(wtmp + "/w")
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }

    val failed = scala.collection.mutable.ArrayBuffer[String]()
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
    }
    // each query is timed twice and the MIN reported: a transient
    // machine-load spike on a shared box must not read as a regression
    // (round 3 showed 89x phantom "regressions" from exactly that)
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = sorted.map { case (name, fn) =>
      val a = timeOnce(name, fn)
      val b = if (a.isDefined) timeOnce(name, fn) else None
      val runs: Seq[Double] = a.toSeq ++ b.toSeq
      name -> runs.sorted.headOption.getOrElse(0.0)
    }
    // canary: re-time the first query at the very end — a contended run
    // shows a canary far above that query's reported min, making bad
    // timings self-evident in the artifact
    val canary = sorted.headOption.flatMap { case (name, fn) =>
      timeOnce(name, fn).map(name -> _) }
    // 3-decimal rounding keeps the whole line ~2 KB so a tail capture of
    // stdout can't truncate the leading "metric":"total" field; the line is
    // also mirrored to bench_out.json as a file-based fallback.
    def r3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val can = canary.map { case (n, s) => s""","canary":{"query":"$n","sec":${r3(s)}}""" }.getOrElse("")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errs$can,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file mirror: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
