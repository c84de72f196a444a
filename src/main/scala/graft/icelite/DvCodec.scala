package graft.icelite

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Bitmap deletion-vector container (`.ildv`) — the V3 deletion-vector
  * representation the reference describes (README.md:1098–1108:
  * "ビットマップ形式で削除情報を保持" — delete info held in BITMAP form,
  * applied at read). Replaces the V2-shaped (file_path, pos) parquet rows
  * for position deletes when `write.delete.vector.enabled=true`: deleted
  * positions are run-length encoded per data file, so the contiguous
  * ranges row-level DML actually produces (a predicate kills clustered
  * rows) cost O(runs), not O(positions) — the same compression argument
  * as Iceberg V3's roaring bitmaps in Puffin, with a deliberately simpler
  * RLE carrier.
  *
  * One container holds blobs for MANY data files (like a Puffin file):
  *
  * {{{
  * magic "ILDV1"
  * int32 nEntries
  * index (nEntries ×): writeUTF(filePath) | int64 positionCount | int32 nRuns
  * blobs  (same order): nRuns × (int64 start, int64 runLength)
  * }}}
  *
  * The index carries per-blob run counts, so a reader resolves one data
  * file's blob by a header parse + one seek — it never streams other
  * files' runs. Readers dispatch on the `.ildv` extension ([[DeleteIndex]],
  * the rewrite, the update read-back), so parquet and DV position deletes
  * coexist in one snapshot and a table migrates formats live. */
object DvCodec {
  val Ext = ".ildv"
  private val Magic = "ILDV1".getBytes("US-ASCII")

  /** (filePath, positionCount, runs) for one data file's blob. */
  final case class Entry(filePath: String, count: Long, runs: Array[Long])

  /** RLE-encode a SORTED, DISTINCT position array: packed [start, len]*. */
  def toRuns(sorted: Array[Long]): Array[Long] = {
    if (sorted.isEmpty) return Array.emptyLongArray
    val runs = scala.collection.mutable.ArrayBuilder.make[Long]
    var start = sorted(0); var len = 1L; var i = 1
    while (i < sorted.length) {
      if (sorted(i) == start + len) len += 1
      else { runs += start; runs += len; start = sorted(i); len = 1L }
      i += 1
    }
    runs += start; runs += len
    runs.result()
  }

  private def expandRuns(runs: Array[Long]): Array[Long] = {
    var n = 0L
    var i = 1
    while (i < runs.length) { n += runs(i); i += 2 }
    val out = new Array[Long](n.toInt)
    var o = 0; i = 0
    while (i < runs.length) {
      var p = runs(i); val end = runs(i) + runs(i + 1)
      while (p < end) { out(o) = p; o += 1; p += 1 }
      i += 2
    }
    out
  }

  /** Write one container holding `entries` (positions pre-sorted). */
  def write(path: Path, entries: Seq[(String, Array[Long])], conf: Configuration): Seq[Entry] = {
    val es = entries.map { case (fp, pos) =>
      Entry(fp, pos.length.toLong, toRuns(pos))
    }
    val fs = FileSystem.get(path.toUri, conf)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(path, false)))
    try {
      out.write(Magic)
      out.writeInt(es.size)
      es.foreach { e =>
        out.writeUTF(e.filePath); out.writeLong(e.count)
        out.writeInt(e.runs.length / 2)
      }
      es.foreach(_.runs.foreach(out.writeLong))
    } finally out.close()
    es
  }

  /** Header only: (filePath, positionCount, nRuns) per blob — O(index). */
  def header(path: Path, conf: Configuration): Seq[(String, Long, Int)] = {
    val fs = FileSystem.get(path.toUri, conf)
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(path)))
    try {
      val m = new Array[Byte](Magic.length)
      in.readFully(m)
      require(java.util.Arrays.equals(m, Magic), s"not an ILDV container: $path")
      val n = in.readInt()
      (0 until n).map(_ => (in.readUTF(), in.readLong(), in.readInt()))
    } finally in.close()
  }

  /** Sorted deleted positions recorded for `dataFile` (empty when none):
    * header parse + one seek to the file's own blob. */
  def positionsFor(path: Path, conf: Configuration, dataFile: String): Array[Long] = {
    val fs = FileSystem.get(path.toUri, conf)
    val in = fs.open(path)
    try {
      val din = new java.io.DataInputStream(new java.io.BufferedInputStream(in))
      val m = new Array[Byte](Magic.length)
      din.readFully(m)
      require(java.util.Arrays.equals(m, Magic), s"not an ILDV container: $path")
      val n = din.readInt()
      var headerBytes = Magic.length.toLong + 4
      var runsBefore = 0L
      var targetRuns = -1
      var i = 0
      while (i < n) {
        val fp = din.readUTF(); val cnt = din.readLong(); val nRuns = din.readInt()
        headerBytes += 2 + fp.getBytes("UTF-8").length + 8 + 4
        if (fp == dataFile && targetRuns < 0) targetRuns = nRuns
        else if (targetRuns < 0) runsBefore += nRuns
        i += 1; val _ = cnt
      }
      if (targetRuns < 0) return Array.emptyLongArray
      in.seek(headerBytes + runsBefore * 16)
      val din2 = new java.io.DataInputStream(new java.io.BufferedInputStream(in))
      val runs = new Array[Long](targetRuns * 2)
      var j = 0
      while (j < runs.length) { runs(j) = din2.readLong(); j += 1 }
      expandRuns(runs)
    } finally in.close()
  }

  /** Every (filePath, pos) pair in the container — the expansion the
    * delete-file rewrite consumes to materialize DVs back into the merged
    * parquet form. */
  def expand(path: Path, conf: Configuration): Iterator[(String, Long)] = {
    val fs = FileSystem.get(path.toUri, conf)
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(path)))
    val m = new Array[Byte](Magic.length)
    in.readFully(m)
    require(java.util.Arrays.equals(m, Magic), s"not an ILDV container: $path")
    val n = in.readInt()
    val idx = (0 until n).map(_ => (in.readUTF(), in.readLong(), in.readInt()))
    idx.iterator.flatMap { case (fp, _, nRuns) =>
      (0 until nRuns).iterator.flatMap { _ =>
        val start = in.readLong(); val len = in.readLong()
        (start until start + len).iterator.map(fp -> _)
      }
    } ++ { in.close(); Iterator.empty }
  }
}
