package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe for the per-write-job floor (guide §1.1): times N repeated
  * parquet writes of one small table on the bench-shaped session, so the
  * fixed cost every DML's staging write pays (committer setup, task
  * serialization, writer open/close, rename) can be profiled in isolation
  * with driver stack sampling.
  *
  * CLI: `sbt "runMain graft.tools.WriteProbe [reps] [sfDir] [cpus]"`
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 30
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "graft.icelite.NioLocalFs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = graft.Tables.orders(spark, sfDir)
    o.count() // warm the scan
    val base = java.nio.file.Files.createTempDirectory("wprobe").toString
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      o.write.parquet(s"$base/w$i")
      (System.nanoTime() - t0) / 1e9
    }
    val sorted = times.sorted
    println(f"[wprobe] reps=$reps min=${sorted.head}%.3f med=${sorted(reps / 2)}%.3f max=${sorted.last}%.3f")
    spark.stop()
  }
}
