package graft

import org.apache.spark.sql.functions._

/** Differential test for `bpe_merges`: the distributed 3-pass-replace
  * formulation must agree with a classic single-threaded BPE trainer
  * (symbol lists, overlapping pair counts, leftmost non-overlapping merge
  * — the Sennrich reference shape) on the real fixture vocabulary. The
  * engine-vs-engine oracle proves Spark == DuckDB; this proves both ==
  * the textbook algorithm.
  */
class BpeSpec extends SparkSpec {

  private def referenceBpe(wf: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] = wf.toSeq
      .map { case (w, f) => w.split("").toList -> f }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _          =>
        }
      }
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      out += ((a, b, cnt))
      def mergeWord(syms: List[String]): List[String] = {
        val buf = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            buf += (a + b); i += 2
          } else { buf += syms(i); i += 1 }
        }
        buf.toList
      }
      words = words.toSeq.map { case (syms, f) => mergeWord(syms) -> f }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    out.toSeq
  }

  /** The replace-based merge equals classic leftmost non-overlapping
    * merging only when no word holds a ≥5-run of one symbol (the scan
    * consumes the separator on such runs and pairs differently). The
    * differential test below is meaningful exactly because the fixture
    * vocabulary stays inside that domain — pin it. */
  test("fixture vocabulary has no 5-run of a single character") {
    val runs = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("(.)\\1{4,}"))
      .count()
    assert(runs == 0, s"$runs words contain a 5+ same-char run")
  }

  test("bpe_merges equals the classic single-threaded BPE trainer") {
    val got = Registry.queries("bpe_merges")(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val wf = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceBpe(wf, 5)
    assert(got == expected, s"distributed $got != reference $expected")
  }
}
