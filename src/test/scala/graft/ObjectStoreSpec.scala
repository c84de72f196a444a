package graft.icelite

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Object-store model of the commit control plane: NO rename primitive at
  * all — createExclusive is a put-if-absent CAS (S3 conditional PUT),
  * replace is an atomic whole-blob swap (S3 PUT). The commit protocol must
  * hold unchanged through this store, proving its atomicity needs are the
  * two CommitStore guarantees and not HDFS rename semantics. */
final class ObjectStoreCommitStore extends CommitStore {
  private val blobs = new ConcurrentHashMap[String, (String, Long)]()
  def seed(p: String, content: String): Unit = {
    blobs.put(p, (content, System.currentTimeMillis())); ()
  }
  override def readString(p: Path): String = {
    val v = blobs.get(p.toString)
    if (v == null) throw new java.io.FileNotFoundException(p.toString)
    v._1
  }
  override def createExclusive(p: Path, content: String): Unit =
    if (blobs.putIfAbsent(p.toString, (content, System.currentTimeMillis())) != null)
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(p.toString)
  override def replace(p: Path, content: String): Unit = {
    blobs.put(p.toString, (content, System.currentTimeMillis())); ()
  }
  override def exists(p: Path): Boolean = blobs.containsKey(p.toString)
  override def modificationTime(p: Path): Long = {
    val v = blobs.get(p.toString)
    if (v == null) throw new java.io.FileNotFoundException(p.toString)
    v._2
  }
  override def delete(p: Path): Unit = { blobs.remove(p.toString); () }
}

class ObjectStoreSpec extends SparkSpec {

  test("commit race holds on an object store with no rename primitive") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import spark.implicits._
    val loc = Files.createTempDirectory("objstore").toString + "/t"
    val sample = (0L until 100L).toDF("id")
    IceLite.createFrom(spark, loc, sample)
    // lift the on-disk control plane into the object store; everything
    // after this line runs the protocol against the double only
    val store = new ObjectStoreCommitStore
    for (n <- Seq("v1.json", "version-hint.text"))
      store.seed(new Path(loc, s"metadata/$n").toString,
        new String(Files.readAllBytes(Paths.get(s"$loc/metadata/$n")), "UTF-8"))
    val t1 = new IceLiteTable(spark, loc, Some(store))
    val t2 = new IceLiteTable(spark, loc, Some(store))
    val f1 = Future(t1.append(sample.filter(col("id") < 50)))
    val f2 = Future(t2.append(sample.filter(col("id") >= 50)))
    Await.result(f1, 120.seconds); Await.result(f2, 120.seconds)
    val t = new IceLiteTable(spark, loc, Some(store))
    assert(t.currentVersion == 3, "both racing appends must land")
    assert(t.meta.snapshots.size == 2,
      s"ops: ${t.meta.snapshots.map(_.operation)}")
    assert(t.read().collect().map(_.getLong(0)).sorted.toSeq == (0L until 100L),
      "one append lost in the race")
    // and the real-FS control plane was never touched after the seed —
    // the protocol genuinely ran through the object store
    assert(new String(Files.readAllBytes(
      Paths.get(s"$loc/metadata/version-hint.text")), "UTF-8").trim == "1")
    assert(!Files.exists(Paths.get(s"$loc/metadata/v2.json")))
  }

  test("forward-only hint swap still enforced through the store") {
    import spark.implicits._
    val loc = Files.createTempDirectory("objstore_fwd").toString + "/t"
    IceLite.createFrom(spark, loc, (0L until 10L).toDF("id"))
    val store = new ObjectStoreCommitStore
    for (n <- Seq("v1.json", "version-hint.text"))
      store.seed(new Path(loc, s"metadata/$n").toString,
        new String(Files.readAllBytes(Paths.get(s"$loc/metadata/$n")), "UTF-8"))
    val hint = new Path(loc, "metadata/version-hint.text")
    store.replace(hint, "5") // another writer moved the table forward
    intercept[IceLite.CommitSupersededException] {
      IceLite.swapHintForward(store, hint, 3)
    }
    assert(store.readString(hint) == "5", "superseded swap must not regress the hint")
  }
}
