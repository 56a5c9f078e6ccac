package graft.oma

import scala.collection.mutable.ArrayBuffer

/** The type-classification config (the reference's `default.type` format)
  * and the classifier itself (TypeAnalysis.java:67-229 parse,
  * 437-526 classification incl. lifecycle-prefix cross-product, the
  * way/area decision and the W-chunk split).
  */
final case class TypeConfig(
    nodeKeys: IndexedSeq[String], nodeValues: IndexedSeq[IndexedSeq[String]],
    wayKeys: IndexedSeq[String], wayValues: IndexedSeq[IndexedSeq[String]],
    areaValues: IndexedSeq[IndexedSeq[String]],
    isAreaFlag: IndexedSeq[Boolean], exceptions: IndexedSeq[IndexedSeq[String]],
    collKeys: IndexedSeq[String], collValues: IndexedSeq[IndexedSeq[String]],
    lifecyclePrefixes: IndexedSeq[String]) {

  def keysFor(kind: Char): IndexedSeq[String] = kind match {
    case 'N' => nodeKeys
    case 'C' => collKeys
    case _ => wayKeys
  }
  def valuesFor(kind: Char): IndexedSeq[IndexedSeq[String]] = kind match {
    case 'N' => nodeValues
    case 'C' => collValues
    case 'A' => areaValues
    case _ => wayValues
  }
}

object TypeConfig {

  def parse(text: String): TypeConfig = {
    val nk = ArrayBuffer[String](); val nv = ArrayBuffer[ArrayBuffer[String]]()
    val wk = ArrayBuffer[String](); val wv = ArrayBuffer[ArrayBuffer[String]]()
    val av = ArrayBuffer[ArrayBuffer[String]]()
    val ia = ArrayBuffer[Boolean](); val ex = ArrayBuffer[ArrayBuffer[String]]()
    val ck = ArrayBuffer[String](); val cv = ArrayBuffer[ArrayBuffer[String]]()
    val lc = ArrayBuffer[String]("")

    var values: ArrayBuffer[String] = null
    var avalues: ArrayBuffer[String] = null
    var evalues: ArrayBuffer[String] = null
    var mode: String = null
    var submode: String = null
    var nr = -1

    for (line <- text.linesIterator) {
      if (!line.isBlank && line.charAt(0) != '#') {
        if (line.startsWith("      ")) {
          submode match {
            case "WAY" => values += line.trim
            case "AREA" => avalues += line.trim
            case "EXCEPTIONS" => evalues += line.trim
            case _ =>
          }
        } else if (line.startsWith("    ")) {
          mode match {
            case "NODE" | "COLLECTION" => values += line.trim
            case "WAY" =>
              line.trim match {
                case "IS_AREA" => ia(nr) = true
                case "WAY" => submode = "WAY"
                case "AREA" => submode = "AREA"
                case "EXCEPTIONS" => submode = "EXCEPTIONS"
                case _ =>
              }
            case _ =>
          }
        } else if (line.startsWith("  ")) {
          mode match {
            case "NODE" =>
              nk += line.trim; values = ArrayBuffer(); nv += values
            case "WAY" =>
              wk += line.trim; ia += false; nr += 1
              values = ArrayBuffer(); wv += values
              avalues = ArrayBuffer(); av += avalues
              evalues = ArrayBuffer(); ex += evalues
            case "COLLECTION" =>
              ck += line.trim; values = ArrayBuffer(); cv += values
            case "LIFECYCLE" =>
              lc += line.trim + ":"
            case _ =>
          }
        } else {
          mode = line
          nr = -1
        }
      }
    }
    TypeConfig(
      nk.toIndexedSeq, nv.map(_.toIndexedSeq).toIndexedSeq,
      wk.toIndexedSeq, wv.map(_.toIndexedSeq).toIndexedSeq,
      av.map(_.toIndexedSeq).toIndexedSeq,
      ia.toIndexedSeq, ex.map(_.toIndexedSeq).toIndexedSeq,
      ck.toIndexedSeq, cv.map(_.toIndexedSeq).toIndexedSeq,
      lc.toIndexedSeq)
  }

  /** A minimal config exercising lifecycle rewrite, IS_AREA, exceptions and
    * the `one_element` stop (for unit tests and custom-config goldens).
    */
  val Minimal: String =
    """NODE
      |  amenity
      |    bench
      |    restaurant
      |  highway
      |    crossing
      |
      |WAY
      |  highway
      |    residential
      |    service
      |      AREA
      |    pedestrian
      |      EXCEPTIONS
      |    rest_area
      |  building
      |    IS_AREA
      |    WAY
      |      wall
      |    AREA
      |      yes
      |      house
      |
      |COLLECTION
      |  route
      |    bus
      |    bicycle
      |  type
      |    multipolygon
      |
      |LIFECYCLE
      |  abandoned
      |  disused
      |""".stripMargin
}

/** Classification result for one element: which block (key index) lists it
  * joins, the final tag map (after lifecycle rewrites), and whether a
  * non-area way is routed to the re-analysis pass (the W-chunk split).
  */
final case class Classified(blocks: IndexedSeq[Int], finalTags: Map[String, String],
                            toSplit: Boolean,
                            splitTags: Map[String, String] = Map.empty)

object Classifier {

  /** The way/area decision (TypeAnalysis.isArea, 518-526): evaluated against
    * the tag state AT THE MOMENT of the key match.
    */
  def isArea(cfg: TypeConfig, closed: Boolean, tags: Map[String, String], j: Int): Boolean = {
    if (!closed) return false
    tags.get("area") match {
      case Some("yes") => true
      case Some("no") => false
      case _ =>
        if (j == -1) false
        else cfg.isAreaFlag(j) != cfg.exceptions(j).contains(tags.getOrElse(cfg.wayKeys(j), null))
    }
  }

  /** Replicates handleNextElement (TypeAnalysis.java:437-496): scan keys in
    * config order x lifecycle prefixes (unprefixed first), sequentially
    * mutating the tag map on lifecycle hits; `split` is true for the first
    * pass over a W chunk, where non-area ways exit to the split stream.
    * An element matching several keys joins several blocks — all sharing
    * the FINAL tag map (the reference mutates one shared HashMap).
    */
  def classify(cfg: TypeConfig, kind: Char, split: Boolean, closed: Boolean,
               tags0: Map[String, String], oneElement: Boolean): Classified = {
    val keys = cfg.keysFor(kind)
    val lcp = cfg.lifecyclePrefixes
    var tags = tags0
    var used = false
    var toSplit = false
    var splitTags = tags0 // tag state when the way hits the split stream
    var firstway = true
    val blocks = ArrayBuffer[Int]()
    var stop = false
    var j = 0
    while (j < keys.length && !stop) {
      var k = 0
      var brk = false
      while (k < lcp.length && !brk && !stop) {
        val key = lcp(k) + keys(j)
        if (tags.contains(key)) {
          used = true
          if (split && !isArea(cfg, closed, tags, j)) {
            if (firstway) { toSplit = true; splitTags = tags; firstway = false }
            if (oneElement) stop = true
            brk = true
          } else {
            if (k > 0) {
              tags = tags +
                ("lifecycle" -> lcp(k).dropRight(1)) +
                (keys(j) -> tags(key)) - key
            }
            blocks += j
            if (oneElement) stop = true
            brk = true
          }
        }
        k += 1
      }
      j += 1
    }
    if (!used) {
      if (split && !isArea(cfg, closed, tags, -1)) {
        if (firstway) { toSplit = true; splitTags = tags }
      } else {
        blocks += keys.length // the "other" block
      }
    }
    Classified(blocks.toIndexedSeq, tags, toSplit, splitTags)
  }
}
