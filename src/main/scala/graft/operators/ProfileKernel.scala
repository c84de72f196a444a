package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame

/** Single-scan column-profiling kernel with a hard NDV cap
  * (SURVEY.md §2.1 S8/table_profile; reference README.md:watched
  * `ANALYZE`-style stats).
  *
  * Per partition, each column keeps: null count, min/max, and a
  * distinct tracker that is EXACT up to `cap` values and degrades to a
  * KMV bottom-`cap` sketch over md5 hashes past it. A partial therefore
  * never carries more than `cap` entries per column no matter the
  * column's cardinality — profiling `l_orderkey` (NDV ≈ row count)
  * costs the driver O(partitions · cap), not O(rows). That bound is what
  * makes the single-collect shape safe at 100 TB: with 10⁵ tasks and
  * cap=4096 the driver materializes at most ~4·10⁸ short strings spread
  * over the merge, and in practice the merge degrades to sketch hashes
  * after the first overflowing partial.
  *
  * The merged NDV is surfaced as exact-or-estimate: "exact" when every
  * partial stayed exact and the union is ≤ cap; otherwise the bottom-cap
  * md5 KMV estimator (distinct-hash count when the merged sketch is not
  * full — md5 collisions are negligible — else (cap-1)/frac(kth hash)).
  * md5 keys make the sketch deterministic across runs and engines.
  */
object ProfileKernel {

  val DefaultCap = 4096

  /** One column's per-partition partial. Invariant: at most one of
    * `exact` / `kmvHex` is non-null, and whichever is carries ≤ cap
    * entries. */
  final case class ColPartial(
      nNulls: Long,
      exact: Array[String],
      kmvHex: Array[String],
      minS: String, maxS: String,
      minD: java.lang.Double, maxD: java.lang.Double)

  /** One column's merged stats. `ndvKind` is "exact" or "estimate". */
  final case class ColStats(
      nNulls: Long, ndv: Long, ndvKind: String,
      minS: String, maxS: String,
      minD: java.lang.Double, maxD: java.lang.Double)

  def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  /** Bounded distinct tracker: exact set up to cap, KMV past it. */
  private final class BoundedDistinct(cap: Int) {
    private val exact = scala.collection.mutable.HashSet.empty[String]
    private var kmv: java.util.TreeSet[String] = null

    def add(v: String): Unit =
      if (kmv == null) {
        exact.add(v)
        if (exact.size > cap) {
          kmv = new java.util.TreeSet[String]()
          exact.foreach(x => addHash(md5hex(x)))
          exact.clear()
        }
      } else addHash(md5hex(v))

    private def addHash(h: String): Unit = {
      kmv.add(h)
      if (kmv.size > cap) kmv.pollLast()
    }

    def exactOrNull: Array[String] = if (kmv == null) exact.toArray else null
    def kmvOrNull: Array[String] =
      if (kmv == null) null else kmv.toArray(new Array[String](kmv.size))
  }

  /** One partial per partition over a pre-projected DataFrame.
    * `numeric(i)` marks column i as double-typed (min/max compare
    * numerically; distinct keys are `Double.toString`, injective on
    * non-NaN doubles). All other columns are read as strings. */
  def partials(df: DataFrame, numeric: Array[Boolean], cap: Int): Array[(Long, Array[ColPartial])] = {
    val nCols = numeric.length
    df.rdd.mapPartitions { it =>
      var n = 0L
      val nulls = new Array[Long](nCols)
      val dist = Array.fill(nCols)(new BoundedDistinct(cap))
      val minS = new Array[String](nCols); val maxS = new Array[String](nCols)
      val minD = new Array[java.lang.Double](nCols); val maxD = new Array[java.lang.Double](nCols)
      it.foreach { row =>
        n += 1
        var i = 0
        while (i < nCols) {
          if (row.isNullAt(i)) nulls(i) += 1
          else if (numeric(i)) {
            val v = row.getDouble(i)
            dist(i).add(java.lang.Double.toString(v))
            if (minD(i) == null || v < minD(i)) minD(i) = v
            if (maxD(i) == null || v > maxD(i)) maxD(i) = v
          } else {
            val v = row.getString(i)
            dist(i).add(v)
            if (minS(i) == null || v < minS(i)) minS(i) = v
            if (maxS(i) == null || v > maxS(i)) maxS(i) = v
          }
          i += 1
        }
      }
      val cols = Array.tabulate(nCols) { i =>
        ColPartial(nulls(i), dist(i).exactOrNull, dist(i).kmvOrNull,
          minS(i), maxS(i), minD(i), maxD(i))
      }
      Iterator.single((n, cols))
    }.collect()
  }

  /** Merge one column's partials into final stats. Exact only when every
    * partial is exact AND the union stays within cap; otherwise the
    * union re-keys through md5 into a bottom-cap KMV. */
  def mergeCol(ps: Seq[ColPartial], cap: Int): ColStats = {
    val nNulls = ps.map(_.nNulls).sum
    val allExact = ps.forall(_.kmvHex == null)
    val exactUnion: Set[String] =
      if (allExact) ps.iterator.flatMap(p => Option(p.exact).getOrElse(Array.empty[String])).toSet
      else null
    val (ndv, kind) =
      if (allExact && exactUnion.size <= cap) (exactUnion.size.toLong, "exact")
      else {
        val t = new java.util.TreeSet[String]()
        def addH(h: String): Unit = { t.add(h); if (t.size > cap) t.pollLast() }
        ps.foreach { p =>
          if (p.exact != null) p.exact.foreach(v => addH(md5hex(v)))
          else if (p.kmvHex != null) p.kmvHex.foreach(addH)
        }
        if (t.size < cap) (t.size.toLong, "estimate")
        else {
          // kth (= cap-th) smallest hash as a fraction of the 128-bit space
          val frac = BigDecimal(BigInt(t.last, 16)) /
            BigDecimal(BigInt(1) << 128)
          (((cap - 1) / frac.toDouble).round, "estimate")
        }
      }
    val sNN = ps.filter(_.minS != null)
    val dNN = ps.filter(_.minD != null)
    ColStats(nNulls, ndv, kind,
      if (sNN.isEmpty) null else sNN.map(_.minS).min,
      if (sNN.isEmpty) null else sNN.map(_.maxS).max,
      if (dNN.isEmpty) null else java.lang.Double.valueOf(dNN.map(_.minD.doubleValue).min),
      if (dNN.isEmpty) null else java.lang.Double.valueOf(dNN.map(_.maxD.doubleValue).max))
  }

  /** Full profile: (total rows, per-column merged stats). */
  def profile(df: DataFrame, numeric: Array[Boolean], cap: Int = DefaultCap): (Long, Array[ColStats]) = {
    val ps = partials(df, numeric, cap)
    val n = ps.map(_._1).sum
    val stats = Array.tabulate(numeric.length)(i => mergeCol(ps.map(_._2(i)).toSeq, cap))
    (n, stats)
  }
}
