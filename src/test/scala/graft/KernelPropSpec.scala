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
    * that contract on EVERY fixture scale the harness runs against — the
    * correctness gate uses sf0.01 and the bench sf0.1 (plus whatever
    * SPARK_GRAFT_SF_DIR points at), so a non-ASCII doc introduced at a
    * larger scale factor must fail here, not silently invalidate the
    * oracle equivalence. */
  test("fixture documents are pure ASCII (byte == char addressing)") {
    val spark = SparkSpec.session
    import org.apache.spark.sql.functions._
    val dirs = (Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1") ++ sys.env.get("SPARK_GRAFT_SF_DIR"))
      .distinct.filter(d => new java.io.File(s"$d/documents.parquet").exists)
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val nonAscii = Tables.documents(spark, d)
        .filter(length(col("text")) =!= octet_length(encode(col("text"), "utf-8")))
        .count()
      assert(nonAscii == 0, s"$nonAscii docs in $d contain multi-byte chars")
    }
  }

  test("isqrt float-seed + CASE correction is exact for any x < 2^53") {
    // mixture_weights computes integer sqrt as floor(sqrt(double)) then a
    // ±1 CASE correction; the seed can be off by at most one ulp-rounding
    // step for exactly-representable x, so the corrected value must equal
    // the true BigInteger floor sqrt — on random values AND the adversarial
    // perfect-square / square-minus-one boundaries where float rounding lies
    def corrected(x: Long): Long = {
      val s0 = math.floor(math.sqrt(x.toDouble)).toLong
      if ((s0 + 1) * (s0 + 1) <= x) s0 + 1
      else if (s0 * s0 > x) s0 - 1
      else s0
    }
    val max = 1L << 53
    val edge = Seq(0L, 1L, 2L, 3L, 4L, max - 1) ++
      (1 to 200).flatMap { i =>
        val k = gen(Gen.choose(1L, (1L << 26) - 1), 7000 + i)
        Seq(k * k - 1, k * k, k * k + 1)
      }
    val rand = (1 to 2000).map(i => gen(Gen.choose(0L, max - 1), i))
    (edge ++ rand).foreach { x =>
      val want = java.math.BigInteger.valueOf(x).sqrt().longValueExact()
      assert(corrected(x) == want, s"isqrt($x)")
    }
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
