package graft.oma

import scala.collection.mutable.ArrayBuffer
import graft.core.Geo

/** Pure geometry-assembly kernels, re-implemented to match the reference's
  * observable behavior exactly (including backtracking order and tie-breaks):
  * multipolygon ring assembly (Multipolygon.java:40-186) and restriction
  * from/via/to path assembly (FromTo.java:58-215). These run per-relation
  * inside flatMapGroups — a relation's members are one group, so no
  * distributed state is needed.
  */
object Assembly {

  type Ring = (Array[Int], Array[Int]) // parallel lon/lat

  private def pEq(a: (Int, Int), b: (Int, Int)): Boolean = a == b
  private def first(r: Ring): (Int, Int) = (r._1(0), r._2(0))
  private def last(r: Ring): (Int, Int) = (r._1(r._1.length - 1), r._2(r._2.length - 1))

  /** Backtracking segment chaining into closed rings. Returns None when any
    * segment is unusable (the relation then contributes nothing, matching
    * `createRings` returning null).
    */
  def createRings(segs: IndexedSeq[Ring]): Option[IndexedSeq[Ring]] = {
    val n = segs.length
    if (segs.exists(s => s._1.length < 1)) return None
    val used = new Array[Boolean](n)
    val result = new Array[Int](n) // signed index: negative = reversed (0 encoded as-is)
    val starts = segs.map(first)
    val ends = segs.map(last)

    // recursion mirrors Multipolygon.createRings(nr, s, e)
    def rec(nr0: Int, s0: (Int, Int), e0: (Int, Int)): Boolean = {
      var nr = nr0; var s = s0; var e = e0
      if (s == null || pEq(s, e)) {
        var found = false
        var i = 0
        while (i < n && !found) {
          if (!used(i)) {
            used(i) = true
            result(nr) = i
            nr += 1
            if (!pEq(starts(i), ends(i))) { s = starts(i); e = ends(i); found = true }
          }
          i += 1
        }
        if (!found) return true
      }
      var i = 0
      while (i < n) {
        if (!used(i)) {
          if (pEq(starts(i), e)) {
            used(i) = true; result(nr) = i
            if (rec(nr + 1, s, ends(i))) return true
            used(i) = false
          }
          if (pEq(ends(i), e)) {
            used(i) = true; result(nr) = -i
            if (rec(nr + 1, s, starts(i))) return true
            used(i) = false
          }
        }
        i += 1
      }
      false
    }

    if (!rec(0, null, null)) return None

    // stitch result order into rings, splitting at closure points
    val out = new ArrayBuffer[Ring]
    var curX: ArrayBuffer[Int] = null
    var curY: ArrayBuffer[Int] = null
    var i = 0
    while (i < n) {
      if (curX == null) { curX = new ArrayBuffer[Int]; curY = new ArrayBuffer[Int] }
      val idx = math.abs(result(i))
      val (sx, sy) = segs(idx)
      val fwd = result(i) >= 0
      var j = 0
      while (j < sx.length) {
        val k = if (fwd) j else sx.length - 1 - j
        curX += sx(k); curY += sy(k)
        j += 1
      }
      // NB: a single-point segment closes immediately, like the reference
      if (curX.head == curX.last && curY.head == curY.last) {
        out += ((curX.toArray, curY.toArray))
        curX = null; curY = null
      }
      i += 1
    }
    Some(out.toIndexedSeq)
  }

  /** Any-vertex-inside containment with the shared-numerics caveat
    * (Multipolygon.java:190-195).
    */
  def ringInside(a: Ring, b: Ring): Boolean = {
    var i = 0
    while (i < a._1.length) {
      if (Geo.pointInPolygon(a._1(i), a._2(i), b._1, b._2)) return true
      i += 1
    }
    false
  }

  final case class AssembledArea(lon: Array[Int], lat: Array[Int],
                                 holesLon: Array[Array[Int]], holesLat: Array[Array[Int]])

  /** Nest inner rings under their outer rings (Multipolygon.sortRings):
    * outer rings sorted innermost-first by the containment comparator
    * (insertion-stable), each claims every unused inner ring inside it.
    * Ring arrays still carry the closing duplicate point; the caller strips
    * it on write (Reunify.java:1240-1255 writes length-1).
    */
  def sortRings(outerRings: Option[IndexedSeq[Ring]],
                innerRings: Option[IndexedSeq[Ring]]): IndexedSeq[AssembledArea] = {
    if (outerRings.isEmpty) return IndexedSeq.empty
    val outs = new java.util.ArrayList[Ring]()
    outerRings.get.foreach(outs.add)
    java.util.Collections.sort(outs, new java.util.Comparator[Ring] {
      def compare(a: Ring, b: Ring): Int =
        if (ringInside(a, b)) -1 else if (ringInside(b, a)) 1 else 0
    })
    val inner = innerRings.getOrElse(IndexedSeq.empty)
    val used = new Array[Boolean](inner.length)
    val out = new ArrayBuffer[AssembledArea]
    val it = outs.iterator()
    while (it.hasNext) {
      val ring = it.next()
      val holes = new ArrayBuffer[Ring]
      var i = 0
      while (i < inner.length) {
        if (!used(i) && ringInside(inner(i), ring)) { holes += inner(i); used(i) = true }
        i += 1
      }
      out += AssembledArea(ring._1, ring._2, holes.map(_._1).toArray, holes.map(_._2).toArray)
    }
    out.toIndexedSeq
  }

  // -------------------------------------------------------------------------
  // Restriction / destination_sign path assembly (FromTo.java)
  // -------------------------------------------------------------------------

  type Pts = Array[(Int, Int)]

  /** Chain via segments end-to-end with reversals (FromTo.sortVia). */
  def sortVia(via: IndexedSeq[Pts]): Option[ArrayBuffer[(Int, Int)]] = {
    val w = new ArrayBuffer[(Int, Int)]
    val used = new Array[Boolean](via.length)
    via(0).foreach(w += _)
    used(0) = true
    if (via.length == 1) return Some(w)
    var lastP = w.last
    var reversed = false
    var break = false
    while (!break) {
      var changed = false
      var k = 0
      while (k < via.length) {
        if (!used(k)) {
          if (lastP == via(k)(0)) {
            var i = 1
            while (i < via(k).length) { w += via(k)(i); i += 1 }
            lastP = w.last; used(k) = true; changed = true
          } else if (lastP == via(k)(via(k).length - 1)) {
            var i = via(k).length - 2
            while (i >= 0) { w += via(k)(i); i -= 1 }
            lastP = w.last; used(k) = true; changed = true
          }
        }
        k += 1
      }
      if (!changed) {
        if (reversed) break = true
        else {
          val rev = w.reverse
          w.clear(); rev.foreach(w += _)
          lastP = w.last
          reversed = true
        }
      }
    }
    if (used.exists(!_)) None else Some(w)
  }

  /** Emit one synthetic way per (from, to) combination (FromTo.createWays).
    * NOTE the reference mutates the shared `via`-chain and the `to`/`from`
    * arrays in place across loop iterations; this port does the same.
    */
  def createWays(from0: IndexedSeq[Pts], via0: IndexedSeq[Pts],
                 to0: IndexedSeq[Pts]): IndexedSeq[Ring] = {
    val ways = new ArrayBuffer[Ring]
    if (to0.isEmpty) return IndexedSeq.empty
    val from = from0.map(_.clone)
    val to = to0.map(_.clone)
    var via = via0.map(_.clone)

    if (via.isEmpty) {
      // infer the missing via node where all from/to endpoints agree
      val k1 = to(0)(0)
      val k2 = to(0)(to(0).length - 1)
      var isFirst = true; var isLast = true
      for (i <- 1 until to.length) {
        if (isFirst && k1 != to(i)(0) && k1 != to(i)(to(i).length - 1)) isFirst = false
        if (isLast && k2 != to(i)(0) && k2 != to(i)(to(i).length - 1)) isLast = false
      }
      for (i <- from.indices) {
        if (isFirst && k1 != from(i)(0) && k1 != from(i)(from(i).length - 1)) isFirst = false
        if (isLast && k2 != from(i)(0) && k2 != from(i)(from(i).length - 1)) isLast = false
      }
      if (isFirst) via = IndexedSeq(Array(k1))
      else if (isLast) via = IndexedSeq(Array(k2))
      else return IndexedSeq.empty
    }

    val viaSorted = sortVia(via) match {
      case None => return IndexedSeq.empty
      case Some(v) => v
    }

    for (t <- to) {
      val way = new ArrayBuffer[(Int, Int)]
      viaSorted.foreach(way += _)

      if (way.head == t(0) || way.head == t(t.length - 1)) {
        val rev = way.reverse; way.clear(); rev.foreach(way += _)
      }
      if (way.last == t(t.length - 1)) {
        // Collections.reverse(Arrays.asList(t)) mutates t in place
        var i = 0; var j = t.length - 1
        while (i < j) { val tmp = t(i); t(i) = t(j); t(j) = tmp; i += 1; j -= 1 }
      }
      if (way.last == t(0)) {
        way += t(1)
        if (from.isEmpty) {
          val xs = new Array[Int](way.length + 1)
          val ys = new Array[Int](way.length + 1)
          xs(0) = way(0)._1; ys(0) = way(0)._2
          for (i <- way.indices) { xs(i + 1) = way(i)._1; ys(i + 1) = way(i)._2 }
          ways += ((xs, ys))
        } else {
          for (f <- from) {
            if (way.last == f(0) || way.last == f(f.length - 1)) {
              val rev = way.reverse; way.clear(); rev.foreach(way += _)
            }
            if (way.head == f(0)) {
              var i = 0; var j = f.length - 1
              while (i < j) { val tmp = f(i); f(i) = f(j); f(j) = tmp; i += 1; j -= 1 }
            }
            if (way.head == f(f.length - 1)) {
              val xs = new Array[Int](way.length + 1)
              val ys = new Array[Int](way.length + 1)
              xs(0) = f(f.length - 2)._1; ys(0) = f(f.length - 2)._2
              for (i <- way.indices) { xs(i + 1) = way(i)._1; ys(i + 1) = way(i)._2 }
              ways += ((xs, ys))
            }
          }
        }
      }
    }
    ways.toIndexedSeq
  }
}
