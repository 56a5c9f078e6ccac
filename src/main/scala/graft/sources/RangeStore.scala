package graft.sources

import java.io.{BufferedInputStream, InputStream, RandomAccessFile}
import java.nio.file.{Files, Paths}

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
