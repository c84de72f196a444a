package graft.icelite

import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-spec value hashing for the `bucket[N]` partition transform.
  *
  * The Iceberg table spec (Appendix B, "32-bit Hash Requirements") pins
  * bucketing to murmur3_x86_32 with seed 0 over a per-type single-value
  * serialization — int/long/date/time/timestamp hash as the 8-byte
  * LITTLE-endian long, strings as raw UTF-8 bytes, decimals as the
  * minimal two's-complement BIG-endian unscaled value, uuid as its
  * 16 big-endian bytes, binary as-is — and the bucket as
  * `(hash & Int.MaxValue) % N`. Implemented from the published algorithm
  * (Austin Appleby's MurmurHash3, public domain) and validated against
  * the spec's published test vectors (IcebergTransformsSpec).
  *
  * IceLite's OWN bucket transform hashes xxhash64 (Spark's native choice
  * for even distribution); these functions exist at the INTEROP boundary
  * so [[IcebergExport]] can lay data out in the buckets a real Iceberg
  * reader will prune by, and pruning predicates over foreign tables can
  * compute the tuple value a manifest records. The reference teaches
  * bucket partitioning on Iceberg at /root/reference/README.md:991.
  */
object IcebergTransforms {

  /** murmur3_x86_32, seed 0 — the exact variant the Iceberg spec names. */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed
    val n = (data.length / 4) * 4
    var i = 0
    while (i < n) {
      var k1 = (data(i) & 0xFF) | ((data(i + 1) & 0xFF) << 8) |
        ((data(i + 2) & 0xFF) << 16) | ((data(i + 3) & 0xFF) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    val rem = data.length & 3
    if (rem == 3) k1 ^= (data(n + 2) & 0xFF) << 16
    if (rem >= 2) k1 ^= (data(n + 1) & 0xFF) << 8
    if (rem >= 1) {
      k1 ^= data(n) & 0xFF
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** int/long/date(days)/time(µs)/timestamp(µs) all widen to long and
    * hash its little-endian 8 bytes (so bucket(34: int) == bucket(34L),
    * the spec's cross-type-promotion guarantee). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
    murmur3(b)
  }

  def hashBytes(v: Array[Byte]): Int = murmur3(v)

  /** Strings hash their UTF-8 bytes, no length prefix. */
  def hashString(v: UTF8String): Int = murmur3(v.getBytes)

  /** Decimals hash the minimal two's-complement big-endian bytes of the
    * unscaled value (exactly `BigInteger.toByteArray`). */
  def hashDecimal(unscaled: java.math.BigInteger): Int = murmur3(unscaled.toByteArray)

  /** UUIDs hash their 16 big-endian bytes. */
  def hashUuid(v: java.util.UUID): Int = {
    val b = java.nio.ByteBuffer.allocate(16)
    b.putLong(v.getMostSignificantBits).putLong(v.getLeastSignificantBits)
    murmur3(b.array())
  }

  private def toBucket(hash: Int, n: Int): Int = (hash & Int.MaxValue) % n

  // static-forwarder entry points the codegen'd IcebergBucket expression
  // calls per row (top-level object ⇒ javac-visible static methods)
  def bucketLong(v: Long, n: Int): Int = toBucket(hashLong(v), n)
  def bucketString(v: UTF8String, n: Int): Int = toBucket(hashString(v), n)
  def bucketBytes(v: Array[Byte], n: Int): Int = toBucket(hashBytes(v), n)
  def bucketDecimal(v: org.apache.spark.sql.types.Decimal, n: Int): Int =
    toBucket(hashDecimal(v.toJavaBigDecimal.unscaledValue()), n)
}
