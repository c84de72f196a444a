package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.Ignore

/** Ad-hoc perf instrumentation, excluded from normal runs — flip @Ignore off
  * and `testOnly graft.PerfProbeSpec` when chasing a bench hotspot. */
@Ignore
class PerfProbeSpec extends SparkSpec {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  test("raw write costs at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val o = Tables.orders(spark, dir)
    val base = Files.createTempDirectory("probe_w").toString
    t("warm count")(o.count())
    t("plain write")(o.filter(col("o_orderkey") % 2 === 0).write.parquet(base + "/w1"))
    t("phys write")(o.write.parquet(base + "/w3"))
  }
}
