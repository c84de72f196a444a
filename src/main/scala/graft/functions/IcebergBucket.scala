package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-spec `bucket[N]` transform as a codegen'd Catalyst expression:
  * `(murmur3_x86_32(icebergBytes(v)) & Int.MaxValue) % N` over the
  * per-type serialization the Iceberg table spec pins (Appendix B; see
  * [[graft.icelite.IcebergTransforms]] for the byte layouts and the
  * spec-vector validation).
  *
  * Used by [[graft.icelite.IcebergExport]] to lay exported data out in
  * the EXACT buckets a real Iceberg reader computes when pruning —
  * Spark's own `hash()` is also murmur3_x86_32 but with seed 42 over
  * Spark's serialization, so it lands values in different buckets; a
  * codegen expression (not a UDF) keeps the export's full-table rewrite
  * inside whole-stage codegen. */
case class IcebergBucket(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  require(numBuckets > 0, s"bucket[$numBuckets]: bucket count must be positive")

  override def prettyName: String = "iceberg_bucket"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
        StringType | BinaryType | _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket has no spec serialization for ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    // local alias, not a field: the expression ships to executors and the
    // module object must not ride along in the closure
    val T = graft.icelite.IcebergTransforms
    child.dataType match {
    case IntegerType | DateType =>
      T.bucketLong(v.asInstanceOf[Int].toLong, numBuckets)
    case LongType | TimestampType | TimestampNTZType =>
      T.bucketLong(v.asInstanceOf[Long], numBuckets)
    case StringType => T.bucketString(v.asInstanceOf[UTF8String], numBuckets)
    case BinaryType => T.bucketBytes(v.asInstanceOf[Array[Byte]], numBuckets)
    case _: DecimalType => T.bucketDecimal(v.asInstanceOf[Decimal], numBuckets)
    case other => sys.error(s"iceberg_bucket: unreachable type $other")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "graft.icelite.IcebergTransforms"
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case IntegerType | DateType =>
        s"${ev.value} = $cls.bucketLong((long) $c, $numBuckets);"
      case LongType | TimestampType | TimestampNTZType =>
        s"${ev.value} = $cls.bucketLong($c, $numBuckets);"
      case StringType =>
        s"${ev.value} = $cls.bucketString($c, $numBuckets);"
      case BinaryType =>
        s"${ev.value} = $cls.bucketBytes($c, $numBuckets);"
      case _: DecimalType =>
        s"${ev.value} = $cls.bucketDecimal($c, $numBuckets);"
      case other => sys.error(s"iceberg_bucket: unreachable type $other")
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
