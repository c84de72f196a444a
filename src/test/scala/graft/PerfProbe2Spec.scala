package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.Ignore

class PerfProbe2Spec extends SparkSpec {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  test("minhash at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val d = Tables.documents(spark, dir)
    t("warm")(d.count())
    t("run1")(println("pairs=" + TextOps.minhashPairs(d, 6, 4, 0.5).count()))
    t("run2")(println("pairs=" + TextOps.minhashPairs(d, 6, 4, 0.5).count()))
    // candidate volume
    val sh = d.select(col("doc_id"),
      expr("""transform(sequence(0, greatest(size(split(text, ' ')) - 3, 0)),
                        i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))""").as("shingles"))
    t("shingle count")(println("docs=" + sh.count()))
  }
}
