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

  test("doc_fingerprint: codegen expression vs interpreted HOF at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val d = Tables.documents(spark, dir)
    graft.functions.RollingFingerprint.register(spark)
    t("warm count")(d.count())
    for (round <- 1 to 3)
      t(s"codegen fp #$round")(d.select(
        graft.functions.RollingFingerprint.rollingFingerprint(col("text")).as("fp"))
        .agg(sum("fp")).collect())
    for (round <- 1 to 3)
      t(s"HOF fp #$round")(d.select(expr(
        """aggregate(transform(split(text, ''), ch -> ascii(ch)),
                     0L, (h, c) -> (h * 31 + c) % 1000000000000000)""").as("fp"))
        .agg(sum("fp")).collect())
  }
}
