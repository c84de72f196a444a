package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch kernel: the k-th smallest
  * DISTINCT hash seen per group, as a native Catalyst aggregate with
  * BOUNDED state (a ≤k-element ordered set), partial-aggregable and
  * mergeable — the property that makes it safe at 100 TB where
  * `count(DISTINCT x)` forces a full shuffle of every distinct value and
  * `collect_set` holds an unbounded group in memory.
  *
  * The estimator lives in the query, not here: with F = kth/2^60 the
  * fraction of hash space covered by the k smallest of n uniform hashes,
  * E[distinct] ≈ (k-1)/F (Bar-Yossef et al., "Counting distinct elements
  * in a data stream", RANDOM 2002). Hashes are md5-derived 60-bit ints so
  * the DuckDB oracle computes the identical value.
  *
  * Returns NULL when the group has fewer than k distinct hashes (caller
  * falls back to the exact count — which is small by definition there).
  */
case class KmvKth(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2 && k <= (1 << 20), s"kmv_kth: k must be in [2, 2^20], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_kth"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast() // keep only the k smallest
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size >= k) buf.last.longValue() else null

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKth =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvKth =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvKth =
    copy(child = newChildren.head)
}

object KmvKth {
  /** Register `kmv_kth(hash, k)` for SQL/expr use (k must be a literal).
    * Idempotent; the registry is the public Column↔Expression door on
    * Spark 4 (see DotScaled.register). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_kth",
      { exprs =>
        require(exprs.length == 2, s"kmv_kth takes 2 args, got ${exprs.length}")
        require(exprs(1).foldable, "kmv_kth: k must be a literal")
        KmvKth(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
      },
      "built-in")
}
