package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Lighthouse JSON metric extraction (reference parity:
  * /root/reference/src/etl.js:258-304): per-file LCP/CLS/INP/TTFB numeric
  * values + performance score, then lower-nearest-rank p75 and the CWV
  * pass rate across files.
  */
object Lighthouse {

  final case class Metrics(lcpMs: Option[Double], cls: Option[Double],
                           inpMs: Option[Double], ttfbMs: Option[Double],
                           perfScore: Option[Double])

  private val mapper = new ObjectMapper

  /** Throws on malformed JSON (caller marks the manifest `partial`). */
  def parse(bytes: Array[Byte]): Metrics = {
    val root: JsonNode = mapper.readTree(new String(bytes, "UTF-8"))
    val audits = root.path("audits")
    def num(node: JsonNode): Option[Double] =
      if (node.isNumber) Some(node.doubleValue) else None
    def auditNum(key: String): Option[Double] =
      num(audits.path(key).path("numericValue"))
    Metrics(
      lcpMs = auditNum("largest-contentful-paint"),
      cls = auditNum("cumulative-layout-shift"),
      inpMs = auditNum("interactive"),
      ttfbMs = auditNum("server-response-time"),
      perfScore = num(root.path("categories").path("performance").path("score")))
  }

  /** `sorted(a)[floor(0.75*(n-1))]` — lower nearest rank (etl.js:284-289). */
  def p75(values: Seq[Double]): Option[Double] =
    if (values.isEmpty) None
    else {
      val s = values.sorted
      Some(s(math.floor(0.75 * (s.length - 1)).toInt))
    }

  /** Pass across URLs with all three metrics present: LCP<=2500 &&
    * CLS<=0.1 && INP<=200 (etl.js:297-303). None when no URL qualifies. */
  def passRate(all: Seq[Metrics]): Option[Double] = {
    val complete = all.filter(m =>
      m.lcpMs.isDefined && m.cls.isDefined && m.inpMs.isDefined)
    if (complete.isEmpty) None
    else {
      val pass = complete.count(m =>
        m.lcpMs.get <= 2500 && m.cls.get <= 0.1 && m.inpMs.get <= 200)
      Some(pass.toDouble / complete.size)
    }
  }
}
