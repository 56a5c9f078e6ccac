package graft.sources

import java.io.{BufferedInputStream, InputStream, RandomAccessFile}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Shared-storage contract for the byte-range scans (OsmSource, OmaScan).
  *
  * The binary scans split a file into independently-decodable byte ranges on
  * the driver and have each executor read ONLY its own range. On local[32]
  * "the same path on every task" is trivially true; on a real cluster the
  * path must resolve to the same bytes on every node (HDFS/S3-style shared
  * storage). This trait is that contract in one place: the driver uses
  * [[open]]/[[length]] for its sequential metadata skim, executors use
  * [[readRange]] for their slice. Implementations must be Serializable —
  * the store instance rides into the executor closure.
  *
  * [[RangeStore.local]] is the local-filesystem instance used everywhere in
  * this sandbox; a cluster deployment supplies an HDFS/S3-backed instance
  * through the same seam (the scans never touch `java.io` directly).
  */
trait RangeStore extends Serializable {

  /** Total length of the object in bytes. */
  def length(path: String): Long

  /** Sequential stream over the whole object starting at byte 0 — the
    * driver-side skim path. Callers close it; implementations should
    * buffer. The skim contract is STREAMING: implementations must not be
    * asked to materialize the object (see OsmSourceStreamSpec).
    */
  def open(path: String): InputStream

  /** Read exactly [offset, offset + len) — the executor-side path. `len`
    * is an Int because a single *range* must fit one task's memory; the
    * file itself (offset, length) is unbounded Long.
    */
  def readRange(path: String, offset: Long, len: Int): Array[Byte]

  /** Expand `path` to the concrete objects to scan, in deterministic
    * (name-sorted) order: a plain object expands to itself; a directory to
    * its files — real planet mirrors ship SHARDED extracts, so every binary
    * scan accepts either. Default suits stores without a directory notion.
    */
  def list(path: String): Seq[String] = Seq(path)
}

object RangeStore {

  /** Local-filesystem store (the sandbox default). */
  val local: RangeStore = new RangeStore {
    override def length(path: String): Long = Files.size(Paths.get(path))

    override def open(path: String): InputStream =
      new BufferedInputStream(Files.newInputStream(Paths.get(path)), 1 << 16)

    override def readRange(path: String, offset: Long, len: Int): Array[Byte] = {
      val raf = new RandomAccessFile(path, "r")
      try {
        val out = new Array[Byte](len)
        raf.seek(offset)
        raf.readFully(out)
        out
      } finally raf.close()
    }

    override def list(path: String): Seq[String] = {
      val p = Paths.get(path)
      if (!Files.isDirectory(p)) Seq(path)
      else {
        val s = Files.list(p)
        try s.iterator().asScala
          .filter(Files.isRegularFile(_)).map(_.toString).toSeq.sorted
        finally s.close()
      }
    }
  }

  /** Read fully and exactly `n` bytes (InputStream.read may return short). */
  def readFully(in: InputStream, buf: Array[Byte], n: Int): Unit = {
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      require(r > 0, s"unexpected EOF at $off of $n")
      off += r
    }
  }

  /** Skip exactly `n` bytes (InputStream.skip may skip fewer). */
  def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else {
        require(in.read() >= 0, s"unexpected EOF with $left bytes left to skip")
        left -= 1
      }
    }
  }
}

/** Write-side counterpart of [[RangeStore]] for the streamed .oma sink
  * (OmaPipeline.runToFile): executors write per-chunk part files, the
  * driver streams them back, concatenates into the final container, and
  * patches the chunk-table pointer. On local[32] a temp directory is
  * trivially shared; on a real cluster every path here must resolve to the
  * same bytes on every node — this trait is that contract in one place
  * (an HDFS/S3-backed instance plugs in at the same seam as the read side).
  */
trait PartStore extends Serializable {
  /** A fresh directory for part files, visible to driver AND executors. */
  def mkTempDir(): String
  /** Executor-side: write one part in full. */
  def write(path: String, bytes: Array[Byte]): Unit
  /** Driver-side: sequential stream over a written part. */
  def open(path: String): java.io.InputStream
  def delete(path: String): Unit
  def deleteDir(path: String): Unit
  /** Driver-side: create the final output object as a stream. */
  def create(path: String): java.io.OutputStream
  /** Patch 8 bytes (big-endian long) at `pos` of a written object — the
    * chunk-table pointer fix-up after the body length is known. */
  def patchLong(path: String, pos: Long, value: Long): Unit
}

object PartStore {
  val local: PartStore = new PartStore {
    override def mkTempDir(): String =
      java.nio.file.Files.createTempDirectory("omaparts").toString
    override def write(path: String, bytes: Array[Byte]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes); ()
    }
    override def open(path: String): java.io.InputStream =
      new BufferedInputStream(Files.newInputStream(Paths.get(path)), 1 << 16)
    override def delete(path: String): Unit = {
      java.nio.file.Files.delete(java.nio.file.Paths.get(path))
    }
    override def deleteDir(path: String): Unit = {
      scala.util.Try(java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))); ()
    }
    override def create(path: String): java.io.OutputStream =
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    override def patchLong(path: String, pos: Long, value: Long): Unit = {
      val raf = new RandomAccessFile(path, "rw")
      try { raf.seek(pos); raf.writeLong(value) } finally raf.close()
    }
  }
}
