package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Misra-Gries heavy-hitter sketch: ≤k counters per partial aggregate,
  * merged with the Agarwal et al. ("Mergeable Summaries", PODS 2012)
  * correction — sum counters, subtract the (k+1)-th largest, drop
  * non-positives — which preserves the frequent-items guarantee under
  * arbitrary merge trees: any key with true frequency > n/(k+1) SURVIVES
  * into the final candidate set.
  *
  * The candidate SET is deterministic in its guarantee but not in its
  * extras (merge order decides which light keys linger), so the operator
  * contract is two-pass: sketch → exact-count verify of the ≤k candidates
  * → threshold filter. The verified output is exactly the keys with
  * freq > n/T for any T ≤ k+1 — deterministic, oracle-checkable — while
  * the scan that finds them shuffles O(k) state instead of every distinct
  * key (what a bare GROUP BY ... HAVING does at 100 TB).
  *
  * Returns the candidate keys as a sorted array<long>.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]] {

  require(k >= 1 && k <= (1 << 16), s"misra_gries: k must be in [1, 65536], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "misra_gries"

  private type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def createAggregationBuffer(): Buf = new java.util.HashMap()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = java.lang.Long.valueOf(v.asInstanceOf[Long])
      val cur = buf.get(key)
      if (cur != null) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key, 1L)
      else decrementAll(buf, 1L) // the MG step: a miss pays one from everyone
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all, drop non-positives
      val counts = new Array[Long](buf.size)
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buf.size - (k + 1)) // (k+1)-th largest
      decrementAll(buf, sub)
    }
    buf
  }

  private def decrementAll(buf: Buf, by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def eval(buf: Buf): Any = {
    val keys = new Array[Long](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](n * 2)
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Register `misra_gries(key, k)` (k literal) for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries",
      { exprs =>
        require(exprs.length == 2, s"misra_gries takes 2 args, got ${exprs.length}")
        require(exprs(1).foldable, "misra_gries: k must be a literal")
        MisraGries(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
      },
      "built-in")
}
