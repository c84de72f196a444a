package graft.icelite

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[IcebergTransforms]] against the Iceberg table spec's PUBLISHED hash
  * test vectors (spec Appendix B, "32-bit Hash Requirements") — the
  * ground truth that makes `bucket[N]` exports prunable by real readers.
  * A single wrong byte in the per-type serialization lands every value
  * in the wrong bucket, so each declared type gets its spec vector. */
class IcebergTransformsSpec extends AnyFunSuite {
  private val T = IcebergTransforms

  test("spec vectors: int/long widen to one 8-byte LE hash") {
    assert(T.hashLong(34L) == 2017239379)
    // the cross-promotion guarantee: int 34 and long 34 bucket together
    assert(T.bucketLong(34L, 16) == (2017239379 & Int.MaxValue) % 16)
  }

  test("spec vectors: date and time hash their epoch-relative longs") {
    val days = java.time.LocalDate.of(2017, 11, 16).toEpochDay
    assert(days == 17486L)
    assert(T.hashLong(days) == -653330422)
    val micros = java.time.LocalTime.of(22, 31, 8).toNanoOfDay / 1000
    assert(T.hashLong(micros) == -662762989)
  }

  test("spec vectors: timestamps hash epoch micros (µs precision distinct)") {
    val micros = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000
    assert(T.hashLong(micros) == -2047944441)
    assert(T.hashLong(micros + 1) == -1207196810)
  }

  test("spec vectors: string = UTF-8 bytes, no length prefix") {
    assert(T.hashString(UTF8String.fromString("iceberg")) == 1210000089)
  }

  test("spec vectors: decimal = minimal two's-complement big-endian unscaled") {
    val d = new java.math.BigDecimal("14.20")
    assert(T.hashDecimal(d.unscaledValue()) == -500754589)
    assert(T.hashDecimal(java.math.BigInteger.valueOf(1420L)) == -500754589,
      "scale lives in the type; equal unscaled values hash equal")
  }

  test("spec vectors: uuid = 16 big-endian bytes; binary as-is") {
    assert(T.hashUuid(java.util.UUID.fromString(
      "f79c3e09-677c-4bbd-a479-3f349cb785e7")) == 1488055340)
    assert(T.hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207)
  }

  test("bucket is (hash & Int.MaxValue) % N: non-negative, stable, full-range") {
    val n = 8
    val buckets = (0L until 10000L).map(v => T.bucketLong(v, n))
    assert(buckets.forall(b => b >= 0 && b < n))
    assert(buckets.distinct.size == n, "10k longs must hit all 8 buckets")
    // a negative hash still buckets non-negative (the & MaxValue rule)
    assert(T.hashLong(17486L) < 0 && T.bucketLong(17486L, 4) >= 0)
  }
}
