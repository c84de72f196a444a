package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-7 JVM kernels, driven over deterministic
  * scalacheck seeds (no scalatest bridge in the offline deps — same
  * pattern as MetaJsonPropSpec):
  *
  *  - [[graft.functions.NfcNormalize]] is idempotent, agrees with the JDK
  *    normalizer, and is identity on ASCII (the fast path is the common
  *    path).
  *  - [[graft.operators.Multimodal.sampleFrames]]'s fused loop equals a
  *    naive frame-list reference on arbitrary byte payloads.
  *  - Bottom-k-by-hash (the `quantile_sketch` sample rule) is mergeable:
  *    bottom-k of a union equals bottom-k of the per-part bottom-ks — the
  *    algebra that lets it plan as TakeOrderedAndProject.
  */
class KernelPropSpec extends AnyFunSuite {

  private val params = Gen.Parameters.default

  private def gen[A](g: Gen[A], seed: Int): A =
    g(params, Seed(seed.toLong)).getOrElse(sys.error(s"gen failed at seed $seed"))

  test("nfc kernel: idempotent, JDK-equal, ASCII-identity") {
    import org.apache.spark.unsafe.types.UTF8String
    val genStr = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf('e', 'a', 'o'),
      Gen.oneOf('́', '̀', '̈'), // combining accents
      Gen.oneOf('é', 'ü', 'ñ'))).map(_.mkString)
    (1 to 300).foreach { i =>
      val s = gen(genStr, i)
      val once = graft.functions.NfcNormalize.nfc(UTF8String.fromString(s)).toString
      val twice = graft.functions.NfcNormalize.nfc(UTF8String.fromString(once)).toString
      assert(twice == once, s"not idempotent at seed $i")
      val jdk = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(once == jdk, s"differs from JDK at seed $i")
    }
    val ascii = UTF8String.fromString("plain ascii text 123")
    // fast path returns the same object — no copy for already-normal input
    assert(graft.functions.NfcNormalize.nfc(ascii) eq ascii)
  }

  test("sampleFrames kernel equals a naive frame-list reference") {
    val spark = SparkSpec.session
    import spark.implicits._
    val genBytes = Gen.choose(0, 100).flatMap(n =>
      Gen.listOfN(n, Gen.choose(32, 126)).map(_.map(_.toByte).toArray))
    val payloads = (1 to 40).map(i => (i.toLong, gen(genBytes, i)))
    val got = operators.Multimodal
      .sampleFrames(spark.createDataset(payloads), frameBytes = 16, every = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    payloads.foreach { case (id, bytes) =>
      val frames = bytes.grouped(16).filter(_.length == 16).toSeq
      val sampled = frames.zipWithIndex.collect { case (f, i) if i % 4 == 0 => f }
      val checksum = sampled.map(_.map(b => (b & 0xff).toLong).sum).sum
      val resized = frames.headOption
        .map(f => new String((0 until 8).map(i => f(2 * i)).toArray, "UTF-8"))
        .getOrElse("")
      assert(got(id) == ((frames.length.toLong, sampled.length.toLong, checksum, resized)),
        s"kernel mismatch for payload $id (${bytes.length} bytes)")
    }
  }

  /** The frame-sample kernel is BYTE-addressed while its DuckDB oracle is
    * character-addressed; they agree only when one char == one byte. Pin
    * that contract on the fixture the oracle actually runs against. */
  test("fixture documents are pure ASCII (byte == char addressing)") {
    val spark = SparkSpec.session
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(length(col("text")) =!= octet_length(encode(col("text"), "utf-8")))
      .count()
    assert(nonAscii == 0, s"$nonAscii docs contain multi-byte chars")
  }

  test("bottom-k-by-hash is mergeable (union law)") {
    def bottomK(xs: Seq[Long], k: Int): Seq[Long] =
      xs.map(x => graft.functions.RollingFingerprint.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"q:$x")) -> x)
        .sortBy(t => (t._1, t._2)).take(k).map(_._2)
    val genXs = Gen.listOf(Gen.choose(0L, 100000L))
    (1 to 100).foreach { i =>
      val a = gen(genXs, 2 * i)
      val b = gen(genXs, 2 * i + 1)
      val direct = bottomK(a ++ b, 16)
      val merged = bottomK(bottomK(a, 16) ++ bottomK(b, 16), 16)
      assert(direct == merged, s"union law broken at seed $i")
    }
  }
}
