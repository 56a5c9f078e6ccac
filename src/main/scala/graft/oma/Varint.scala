package graft.oma

/** Byte-buffer reader/writer for the varint encodings shared by the O5M and
  * PBF input formats (reference PackedIntegerReader.java:8-50).
  *
  * The reference's unsigned varint `u` is exactly the protobuf base-128
  * varint, and its signed varint `s` is byte-identical to the protobuf
  * zigzag sint encoding (the sign lands in bit 0 of the first byte, six
  * magnitude bits follow, then plain 7-bit groups) — so one codec serves
  * both formats.
  */
object Varint {

  /** Cursor over a byte range; `atEnd` replaces the reference's
    * EOFException control flow. */
  final class In(val buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)

    def atEnd: Boolean = pos >= end

    def byte(): Int = {
      require(pos < end, s"read past end ($pos >= $end)")
      val b = buf(pos) & 0xff
      pos += 1
      b
    }

    def bytes(n: Int): Array[Byte] = {
      require(pos + n <= end, s"read past end ($pos + $n > $end)")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      a
    }

    /** Sub-cursor over the next n bytes (the reference's getChunk /
      * ByteArrayInputStream-per-message pattern without the copy). */
    def sub(n: Int): In = {
      require(pos + n <= end, s"sub past end ($pos + $n > $end)")
      val s = new In(buf, pos, pos + n)
      pos += n
      s
    }

    /** Unsigned base-128 varint (PackedIntegerReader.u). */
    def u(): Long = {
      var value = 0L
      var fak = 1L
      var cont = true
      while (cont) {
        val next = byte()
        value += (next & 0x7f) * fak
        cont = next >= 0x80
        fak *= 0x80
      }
      value
    }

    /** Signed varint = protobuf zigzag (PackedIntegerReader.s). */
    def s(): Long = {
      val zz = u()
      (zz >>> 1) ^ -(zz & 1)
    }

    /** Four-byte big-endian int (PBF blob framing: `din.readInt()`). */
    def int32(): Int =
      (byte() << 24) | (byte() << 16) | (byte() << 8) | byte()
  }

  final class Out {
    private val b = new java.io.ByteArrayOutputStream()

    def size: Int = b.size()
    def byte(v: Int): this.type = { b.write(v & 0xff); this }
    def raw(a: Array[Byte]): this.type = { b.write(a, 0, a.length); this }
    def raw(o: Out): this.type = { o.b.writeTo(b); this }

    /** The operand is UNSIGNED 64-bit: a zigzag of a very negative long
      * (e.g. s(Long.MinValue/2 - 1)) sets the top bit, so the loop must
      * test the remaining-bits mask, not signed >= 0x80 — found by the
      * PropertySpec round-trip over arbitrary longs. */
    def u(v: Long): this.type = {
      var x = v
      while ((x & ~0x7fL) != 0) { byte(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      byte(x.toInt)
    }

    def s(v: Long): this.type = u((v << 1) ^ (v >> 63))

    def int32(v: Int): this.type = {
      byte(v >>> 24); byte(v >>> 16); byte(v >>> 8); byte(v)
    }

    def result(): Array[Byte] = b.toByteArray
  }

  /** Byte length of u(v) — the reference's O5MReader.getLength (unsigned
    * domain, same mask test as Out.u). */
  def uLen(v: Long): Int = {
    var x = v; var n = 1
    while ((x & ~0x7fL) != 0) { x >>>= 7; n += 1 }
    n
  }
}
