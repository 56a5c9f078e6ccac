package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-ROW minhash band-bucket kernel: given a document's word array
  * (array<string>, the raw token multiset — duplicates allowed), computes
  * the k = seedsA.length minhash values min_w((a_j * h60(w) % p + b_j) % p)
  * and renders them as the band bucket strings
  * "bd:m_{r*bd}:...:m_{r*bd+r-1}" — bit-identical to the former
  * explode + DISTINCT + md5 + 32-way min groupBy formulation because each
  * minhash depends on a word only through its hash, so the min over the
  * multiset equals the min over the distinct set.
  *
  * Why (optimization round 6): the aggregate formulation shuffled every
  * (doc_id, word) pair once for the DISTINCT and once more for the
  * signature aggregation — and the band frame is referenced from several
  * subplans of the pair pipeline (bucket cap, both candidate sides), most
  * inside broadcast builds where runtime exchange reuse cannot serve them,
  * so those two exchanges were paid up to four times per query. As a pure
  * map the band assignment costs ZERO exchanges at any scale and one md5
  * per word occurrence, all inside whole-stage codegen.
  *
  * The word hash is PortableHash.h60 % p computed directly from the md5
  * digest bytes (first 15 hex digits == first 60 bits of the digest), so
  * engine and DuckDB oracle derive identical buckets.
  */
final class MinhashBandsKernel(seedsA: Array[Long], seedsB: Array[Long],
                               p: Long, bandRows: Int) extends Serializable {

  @transient private lazy val mdLocal: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  /** first 60 bits of md5(bytes), i.e. conv(substr(md5_hex, 1, 15), 16, 10). */
  private def h60(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    val v = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    v >>> 4
  }

  def bands(ws: ArrayData): ArrayData = {
    val k = seedsA.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      val hw = h60(ws.getUTF8String(i).getBytes) % p
      var j = 0
      while (j < k) {
        val v = (seedsA(j) * hw + seedsB(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val nb = k / bandRows
    val out = new Array[AnyRef](nb)
    var bd = 0
    while (bd < nb) {
      val sb = new java.lang.StringBuilder(12 * bandRows + 4)
      sb.append(bd).append(':')
      var r = 0
      while (r < bandRows) {
        if (r > 0) sb.append(':')
        sb.append(mins(bandRows * bd + r))
        r += 1
      }
      out(bd) = UTF8String.fromString(sb.toString)
      bd += 1
    }
    new GenericArrayData(out)
  }
}

case class MinhashBands(child: Expression, kernel: MinhashBandsKernel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(ws: Any): Any = kernel.bands(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("minhashKernel", kernel, classOf[MinhashBandsKernel].getName)
    defineCodeGen(ctx, ev, c => s"$k.bands($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashBands {
  def apply(ws: Column, kernel: MinhashBandsKernel): Column =
    GraftColumnBridge.column(MinhashBands(GraftColumnBridge.expression(ws), kernel))
}
