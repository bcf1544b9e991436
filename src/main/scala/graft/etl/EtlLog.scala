package graft.etl

import scala.collection.mutable

/** Structured, quiet-by-default observability for the audit ETL — parity
  * with the reference's progress breadcrumbs: the resolved-column log lines
  * (/root/reference/src/etl.js:128,158,315) and the input echo
  * (src/main.js:9-14).
  *
  * Two sinks per event:
  *   1. an in-memory collector on this instance — callers (and the specs)
  *      can assert exactly which columns the fuzzy resolver picked for a
  *      given archive, the debuggability the reference gets from its
  *      log.info calls;
  *   2. slf4j INFO on the "graft.etl" logger — invisible under Spark's
  *      default WARN threshold (quiet by default), visible the moment a
  *      deployment lowers that one logger, with no code change.
  *
  * Instances are cheap; create one per archive (processZip call) so the
  * breadcrumb list is per-run, the way one actor invocation owns one log
  * stream in the reference.
  */
final class EtlLog extends Serializable {
  private val buf = mutable.ArrayBuffer.empty[(String, Map[String, String])]
  @transient private lazy val slf = org.slf4j.LoggerFactory.getLogger("graft.etl")

  def info(event: String, fields: (String, String)*): Unit = synchronized {
    buf += ((event, fields.toMap))
    if (slf.isInfoEnabled)
      slf.info(event + fields.map { case (k, v) => s" $k=$v" }.mkString(" {", ", ", "}"))
  }

  /** Breadcrumbs recorded so far, in order. */
  def events: Seq[(String, Map[String, String])] = synchronized(buf.toList)

  /** The field map of the first event with this name, if any. */
  def first(event: String): Option[Map[String, String]] =
    events.collectFirst { case (`event`, fields) => fields }
}

object EtlLog {
  def apply(): EtlLog = new EtlLog
}
