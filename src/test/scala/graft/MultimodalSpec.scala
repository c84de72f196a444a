package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.FakeImageCodec

/** Binary-column pipeline: codec roundtrip, corrupt-input handling, and the
  * partition-wise decode kernel end-to-end (SURVEY.md §2.12 multimodal).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("codec roundtrip recovers header and pixel stats") {
    val payload = "hello pixels".getBytes("UTF-8")
    val img = FakeImageCodec.encode(640, 480, payload)
    val Some((w, h, n, mean)) = FakeImageCodec.decode(img)
    assert(w == 640 && h == 480 && n == payload.length)
    assert(math.abs(mean - payload.map(_ & 0xff).sum.toDouble / payload.length) < 1e-9)
  }

  test("corrupt input decodes to None, kernel marks ok=false") {
    assert(FakeImageCodec.decode("JUNK".getBytes).isEmpty)
    assert(FakeImageCodec.decode(Array[Byte]()).isEmpty)
    val ds = spark.createDataset(Seq(
      (1L, FakeImageCodec.encode(2, 2, Array[Byte](10, 20, 30, 40))),
      (2L, "not an image".getBytes("UTF-8"))))
    val rows = Multimodal.decodeImages(ds).orderBy("doc_id").collect()
    assert(rows(0).getBoolean(1) && rows(0).getInt(2) == 2 && rows(0).getDouble(5) == 25.0)
    assert(!rows(1).getBoolean(1))
  }

  test("decode_stats pipeline: every synthesized image decodes with bounded dims") {
    val df = Registry.queries("multimodal_decode_stats")(spark, sf)
    val r = df.head
    assert(r.getAs[Long]("n_images") == r.getAs[Long]("n_decoded"), "some images failed decode")
    assert(r.getAs[Int]("max_width") <= 64 && r.getAs[Int]("max_height") <= 48)
    assert(r.getAs[Long]("total_pixels") > 0)
  }
}
