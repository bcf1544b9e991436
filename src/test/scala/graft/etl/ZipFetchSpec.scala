package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.Files

/** ZipFetch parity (/root/reference/src/etl.js:96-99): bytes on OK,
  * "Download failed: <status>" on non-OK, redirects followed, and
  * file:/plain paths for offline runs. Uses the JDK's built-in
  * HttpServer — no network egress. */
class ZipFetchSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, (Int, Array[Byte])])(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, (status, body)) =>
      server.createContext(path, new HttpHandler {
        def handle(ex: HttpExchange): Unit = {
          if (status >= 300 && status < 400)
            ex.getResponseHeaders.add("Location", s"/target")
          ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length.toLong)
          if (body.nonEmpty) ex.getResponseBody.write(body)
          ex.close()
        }
      })
    }
    server.start()
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  test("OK response returns the body bytes") {
    val payload = "PKfake-zip".getBytes("ISO-8859-1")
    withServer(Map("/audit.zip" -> (200, payload))) { port =>
      assert(ZipFetch.fetch(s"http://127.0.0.1:$port/audit.zip").sameElements(payload))
    }
  }

  test("non-OK status throws the reference's Download failed message") {
    withServer(Map("/gone.zip" -> (404, Array.empty[Byte]))) { port =>
      val e = intercept[RuntimeException] {
        ZipFetch.fetch(s"http://127.0.0.1:$port/gone.zip")
      }
      assert(e.getMessage == "Download failed: 404")
    }
  }

  test("redirects are followed (Drive-style direct-download links)") {
    val payload = "PKredirected".getBytes("ISO-8859-1")
    withServer(Map(
      "/start.zip" -> (302, Array.empty[Byte]),
      "/target" -> (200, payload))) { port =>
      assert(ZipFetch.fetch(s"http://127.0.0.1:$port/start.zip").sameElements(payload))
    }
  }

  test("file: URIs and plain paths read local bytes") {
    val p = Files.createTempFile("zf", ".zip")
    Files.write(p, "PKlocal".getBytes)
    assert(ZipFetch.fetch(p.toString).sameElements("PKlocal".getBytes))
    assert(ZipFetch.fetch(p.toUri.toString).sameElements("PKlocal".getBytes))
  }
}
