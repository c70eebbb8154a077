package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

/** Resilience semantics (reference `tests/test_phase2_hardening.py:9-51`,
  * `tests/test_errors.py:13-26`) — fully offline, scripted transports. */
class NetSpec extends AnyFunSuite {

  test("backoff grows exponentially with ≤25% jitter, capped at 300s") {
    assert(Backoff.base(1, 30.0) == 30.0)
    assert(Backoff.base(2, 30.0) == 60.0)
    assert(Backoff.base(3, 30.0) == 120.0)
    // jitter bounds
    assert(Backoff.delay(1, 30.0, 0.0) == 30.0)
    assert(Backoff.delay(1, 30.0, 0.999) <= 30.0 * 1.25)
    // cap
    assert(Backoff.delay(10, 30.0, 0.5) == 300.0)
  }

  test("429,429,200 sequence: two growing sleeps then success") {
    val sleeps = scala.collection.mutable.ListBuffer[Long]()
    val f = new Fetcher(
      new ScriptedTransport(Seq((429, ""), (429, ""), (200, "<html>ok</html>"))),
      retries = 3, backoffFactor = 1.0,
      random = () => 0.0, sleeper = sleeps += _, clock = () => 42L)
    val res = f.fetch("https://example.cl/pozo", "TestBot/1.0")
    assert(res.html == "<html>ok</html>")
    assert(sleeps.toList == List(1000L, 2000L)) // factor·2^(n-1)
  }

  test("429 beyond retry budget raises NetworkError") {
    val f = new Fetcher(new ScriptedTransport(Seq((429, ""))),
      retries = 3, backoffFactor = 0.001, random = () => 0.0, sleeper = _ => ())
    val e = intercept[NetworkError](f.fetch("https://example.cl/", "UA"))
    assert(e.context("status") == "429")
  }

  test("non-429 error is not retried") {
    var calls = 0
    val t = new HttpTransport {
      def get(url: String, ua: String, timeoutMs: Int): (Int, String) = {
        calls += 1; (500, "boom")
      }
    }
    intercept[NetworkError](new Fetcher(t, retries = 3, sleeper = _ => ()).fetch(
      "https://example.cl/", "UA"))
    assert(calls == 1)
  }

  test("robots disallow raises RobotsDisallowedError (a SecurityException)") {
    val t = new FixtureTransport(
      pages = Map("https://example.cl/pozo" -> "x"),
      robotsTxt = Map("example.cl" -> "User-agent: *\nDisallow: /pozo"))
    val e = intercept[RobotsDisallowedError](
      new Fetcher(t).fetch("https://example.cl/pozo", "UA"))
    assert(e.isInstanceOf[SecurityException])
    assert(e.errorCode == "ROBOTS_DISALLOWED")
  }

  test("robots: longest match wins; missing robots is permissive") {
    val txt = Some("User-agent: *\nDisallow: /private\nAllow: /private/ok")
    assert(Robots.allowed(txt, "UA", "/private/ok/page"))
    assert(!Robots.allowed(txt, "UA", "/private/other"))
    assert(Robots.allowed(txt, "UA", "/public"))
    assert(Robots.allowed(None, "UA", "/anything"))
  }

  test("per-host rate limiter enforces min interval per host only") {
    var now = 0L
    val sleeps = scala.collection.mutable.ListBuffer[Long]()
    val rl = new HostRateLimiter(1000, () => now, w => { sleeps += w; now += w })
    rl.acquire("a.cl")            // first: no wait
    now += 200
    rl.acquire("b.cl")            // different host: no wait
    rl.acquire("a.cl")            // 800ms early → sleep 800
    assert(sleeps.toList == List(800L))
  }

  test("HTML flatten mirrors get_text(' ', strip=True)") {
    val html = "<html><head><style>p{}</style><script>var x=1;</script></head>" +
      "<body><p>Loto Cl&aacute;sico</p>\n<div>$690&nbsp;MILLONES</div></body></html>"
    assert(Html.toText(html) == "Loto Clásico $690 MILLONES")
  }

  test("fetch result carries sha256 of the body") {
    val f = new Fetcher(new FixtureTransport(Map("https://x.cl/" -> "abc")))
    assert(f.fetch("https://x.cl/", "UA").sha256 ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  // ---- JdkHttpTransport: the real java.net.http transport, exercised
  // ONLY against loopback (JDK's own HttpServer) — no egress, CI-safe ----

  test("JdkHttpTransport: GET returns status+body, sends the UA header") {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenUa: String = null
    srv.createContext("/page", { ex =>
      seenUa = ex.getRequestHeaders.getFirst("User-Agent")
      val body = "<html>pozo</html>".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length); ex.getResponseBody.write(body)
      ex.close()
    })
    srv.createContext("/missing", { ex =>
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val t = new JdkHttpTransport()
      assert(t.get(s"$base/page", "TestBot/1.0", 5000) ==
        (200, "<html>pozo</html>"))
      assert(seenUa == "TestBot/1.0")
      assert(t.get(s"$base/missing", "TestBot/1.0", 5000)._1 == 404)
    } finally srv.stop(0)
  }

  test("JdkHttpTransport: connect failure → NetworkError; robots → permissive None") {
    // port 1 on loopback: nothing listens there, refused instantly
    val t = new JdkHttpTransport()
    intercept[NetworkError] { t.get("http://127.0.0.1:1/x", "UA", 2000) }
    assert(t.robots("127.0.0.1:1", "UA").isEmpty)
  }

  test("Fetcher over JdkHttpTransport: 429,429,200 retry loop end-to-end") {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    srv.createContext("/flaky", { ex =>
      val n = hits.incrementAndGet()
      if (n < 3) { ex.sendResponseHeaders(429, -1); ex.close() }
      else {
        val body = "ok".getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length); ex.getResponseBody.write(body)
        ex.close()
      }
    })
    srv.start()
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}/flaky"
      val sleeps = scala.collection.mutable.ListBuffer[Long]()
      val f = new Fetcher(new JdkHttpTransport(), retries = 3,
        backoffFactor = 0.001, random = () => 0.0, sleeper = sleeps += _)
      assert(f.fetch(url, "UA").html == "ok")
      assert(hits.get == 3 && sleeps.size == 2)
    } finally srv.stop(0)
  }
}
