package graft.etl

/** Golden-fixture authoring tool: writes the three JSON documents per
  * scenario to src/test/resources/golden/ AFTER their values have been
  * manually audited against the reference semantics (see AuditEtlSpec,
  * which then locks them byte-for-byte). Re-run deliberately only when the
  * fixtures or intended semantics change. */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    for ((name, bytes) <- Seq("minimal" -> Fixtures.minimalZip,
                              "full" -> Fixtures.fullZip,
                              "empty" -> Fixtures.emptyZip)) {
      val r = AuditEtl.processZip(bytes, "acme", "example.com", "2026-08-12")
      AuditPipeline.writeKv(s"src/test/resources/golden/$name", r)
      println(s"wrote golden/$name")
    }
  }
}
