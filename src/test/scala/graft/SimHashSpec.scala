package graft

import graft.operators.TextOps

/** SimHash near-dup: planted near-identical docs pair up, unrelated docs
  * don't (SURVEY.md §2.12 X2, non-oracled path). */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  test("near-identical docs within hamming 3; unrelated far apart") {
    // simhash bit stability needs wide majority margins: repeat the token
    // set (weighted features) so ONE changed occurrence shifts votes by ±1
    // against margins of ~3 — few bits flip. A single change in a short
    // unrepeated doc flips ~10% of bits (margins of ±1), which is correct
    // simhash behavior, not a near-dup. The distinct-word count is ODD on
    // purpose: every bit's vote margin is then an odd multiple of 3, and
    // the edit shifts votes by at most 2, so no bit can cross zero — the
    // guarantee is deterministic at any signature width.
    val words = "the quick brown fox jumps over lazy dog runs far away home tonight again soon".split(" ")
    val baseToks = words ++ words ++ words
    val base = baseToks.mkString(" ")
    val nearToks = baseToks.clone(); nearToks(nearToks.length - 1) = "today"
    val near = nearToks.mkString(" ")
    val docs = Seq(
      (0L, base), (1L, near),
      (2L, "spark shuffle partitions broadcast join codegen stage exchange aggregate sort"),
    ).toDF("doc_id", "text")
    val pairs = TextOps.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"expected (0,1): $pairs")
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L }, s"false positive: $pairs")
  }

  test("identical docs have hamming 0") {
    val docs = Seq((0L, "a b c d e"), (1L, "a b c d e")).toDF("doc_id", "text")
    val rows = TextOps.simhashPairs(docs, 0).collect()
    assert(rows.length == 1 && rows.head.getLong(2) == 0L)
  }
}
