package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

/** Archive download (reference parity: /root/reference/src/etl.js:96-99 —
  * fetch, fail on non-OK status). Supports http(s) via java.net.http and
  * file:/plain paths for tests and offline runs; the non-ZIP magic check
  * lives in AuditEtl.processZip (etl.js:102-108).
  */
object ZipFetch {

  def fetch(url: String): Array[Byte] =
    if (url.startsWith("http://") || url.startsWith("https://")) {
      val client = HttpClient.newBuilder()
        .followRedirects(HttpClient.Redirect.NORMAL).build()
      val res = client.send(
        HttpRequest.newBuilder(URI.create(url)).GET().build(),
        HttpResponse.BodyHandlers.ofByteArray())
      if (res.statusCode() < 200 || res.statusCode() >= 300)
        throw new RuntimeException(s"Download failed: ${res.statusCode()}")
      res.body()
    } else {
      val path = if (url.startsWith("file:")) Paths.get(URI.create(url))
                 else Paths.get(url)
      Files.readAllBytes(path)
    }
}
