package graft.sources

import graft.{NetworkError, RobotsDisallowedError}
import java.net.URI
import scala.annotation.tailrec

/** Polite-fetch resilience semantics, re-expressed for executor-side use.
  *
  * Reference behavior (`polla_app/net.py`):
  *  - exponential backoff `factor·2^(n-1)` plus uniform jitter of up to
  *    25%, capped at 300 s (`net.py:75-83`; growth pinned by
  *    `tests/test_phase2_hardening.py:9-51`);
  *  - only HTTP 429 is retried, up to `retries` attempts (`net.py:149-169`);
  *  - per-host min-interval rate limiting (`net.py:111-133`);
  *  - robots.txt gate: disallow ⇒ error, robots fetch failure ⇒ allow
  *    (`net.py:41-72`).
  *
  * In the Spark engine each of these lives *inside* the partition iterator
  * of a fetch-task Dataset (`tasks.repartition(col("host")).mapPartitions`)
  * so politeness survives parallelism: one partition per host ⇒ the
  * per-host limiter is honest even on 1000 executors. Everything here is
  * injectable (clock/sleeper/random/transport) for deterministic offline
  * tests — the reference itself never fetches in CI.
  */
object Backoff {
  /** Deterministic part of the delay for attempt n (1-based). */
  def base(attempt: Int, factor: Double): Double =
    factor * math.pow(2, attempt - 1)

  /** Full delay: base + U(0, 0.25·base), capped. `u` ∈ [0,1). */
  def delay(attempt: Int, factor: Double, u: Double, cap: Double = 300.0): Double =
    math.min(base(attempt, factor) * (1.0 + 0.25 * u), cap)
}

/** Per-host minimum-interval rate limiter (token-bucket of depth 1).
  * One instance per partition; hosts are co-partitioned. */
final class HostRateLimiter(minIntervalMs: Long, clock: () => Long,
    sleeper: Long => Unit) {
  private val lastSeen = scala.collection.mutable.Map[String, Long]()
  def acquire(host: String): Unit = {
    val now = clock()
    lastSeen.get(host).foreach { last =>
      val wait = minIntervalMs - (now - last)
      if (wait > 0) sleeper(wait)
    }
    lastSeen(host) = clock()
  }
}

/** Minimal robots.txt evaluator: longest-match Disallow/Allow for a UA
  * group (exact agent substring or `*`). Fetch failure ⇒ permissive, as the
  * reference (`net.py:56-72`). */
object Robots {
  def allowed(robotsTxt: Option[String], ua: String, path: String): Boolean =
    robotsTxt match {
      case None => true
      case Some(txt) =>
        val groups = parse(txt)
        val uaLower = ua.toLowerCase
        val group = groups.find(g => g.agents.exists(a => a != "*" && uaLower.contains(a)))
          .orElse(groups.find(_.agents.contains("*")))
        group.forall { g =>
          val matches = g.rules.filter { case (_, p) => p.nonEmpty && path.startsWith(p) }
          if (matches.isEmpty) true
          else matches.maxBy(_._2.length)._1 // longest rule wins; _1 = isAllow
        }
    }

  private case class Group(agents: List[String], rules: List[(Boolean, String)])

  private def parse(txt: String): List[Group] = {
    val lines = txt.linesIterator.map(_.takeWhile(_ != '#').trim).filter(_.nonEmpty).toList
    val groups = scala.collection.mutable.ListBuffer[Group]()
    var agents = List.empty[String]
    var rules = List.empty[(Boolean, String)]
    var inRules = false
    def flush(): Unit = if (agents.nonEmpty) {
      groups += Group(agents, rules.reverse); agents = Nil; rules = Nil
    }
    for (line <- lines) line.split(":", 2) match {
      case Array(k, v) =>
        val key = k.trim.toLowerCase; val value = v.trim
        key match {
          case "user-agent" =>
            if (inRules) { flush(); inRules = false }
            agents = value.toLowerCase :: agents
          case "disallow" => inRules = true; rules = (false, value) :: rules
          case "allow"    => inRules = true; rules = (true, value) :: rules
          case _ => ()
        }
      case _ => ()
    }
    flush()
    groups.toList
  }
}

/** Result of one fetch: body + provenance (reference `net.py:26-38`). */
case class FetchResult(url: String, userAgent: String, fetchedAtMs: Long,
    html: String) {
  def sha256: String = java.security.MessageDigest.getInstance("SHA-256")
    .digest(html.getBytes("UTF-8")).map("%02x".format(_)).mkString
}

/** Injectable transport: returns (statusCode, body). */
trait HttpTransport extends Serializable {
  def get(url: String, ua: String, timeoutMs: Int): (Int, String)
  /** robots.txt body for a host, None if the fetch failed. */
  def robots(host: String, ua: String): Option[String] = None
}

/** Live HTTP transport over the JDK's `java.net.http.HttpClient` — the
  * real-network implementation of [[HttpTransport]] (reference
  * `net.py:135-169` uses `requests` the same way: one GET, UA header,
  * wall-clock timeout, transport errors surfaced as network errors).
  *
  * Deliberately kept OUT of every CI/test path, exactly as the reference
  * never fetches in its own CI (`tests/test_smoke_sources.py:42-52`):
  * specs exercise it only against loopback addresses. Selected at the CLI
  * with `--live` (sandbox-inert here: this build environment has no
  * egress, so a live run fails fast with a NetworkError — the wiring is
  * what this class provides).
  *
  * One instance per fetch-task partition (it is built executor-side
  * inside `mapPartitions` in [[graft.sources.DistributedFetch]]-style
  * flows); HttpClient keeps a small connection pool per instance, which
  * co-located per-host partitions reuse across a partition's URLs. */
final class JdkHttpTransport(followRedirects: Boolean = true,
    robotsScheme: String = "https")
    extends HttpTransport {
  @transient private lazy val client = {
    val b = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
    (if (followRedirects)
      b.followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    else b).build()
  }

  override def get(url: String, ua: String, timeoutMs: Int): (Int, String) =
    try {
      val req = java.net.http.HttpRequest.newBuilder(URI.create(url))
        .header("User-Agent", ua)
        .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    } catch {
      case e: java.io.IOException =>
        throw new NetworkError(s"transport error fetching $url: ${e.getMessage}",
          Map("url" -> url, "cause" -> e.getClass.getSimpleName))
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw new NetworkError(s"interrupted fetching $url", Map("url" -> url))
    }

  /** robots.txt for the host; any failure ⇒ None ⇒ permissive, matching
    * the reference's robots semantics (`net.py:56-72`). */
  override def robots(host: String, ua: String): Option[String] =
    try {
      val (status, body) = get(s"$robotsScheme://$host/robots.txt", ua, 10000)
      if (status == 200) Some(body) else None
    } catch { case _: NetworkError => None }
}

/** Retrying fetcher with robots gate + per-host rate limit.
  * All side-effects injected; pure-deterministic under test. */
final class Fetcher(
    transport: HttpTransport,
    retries: Int = 3,
    backoffFactor: Double = 30.0,
    timeoutMs: Int = 20000,
    rateLimiter: Option[HostRateLimiter] = None,
    random: () => Double = () => scala.util.Random.nextDouble(),
    sleeper: Long => Unit = Thread.sleep,
    clock: () => Long = System.currentTimeMillis) {

  def fetch(url: String, ua: String): FetchResult = {
    // authority, not bare host: robots.txt scope and politeness are per
    // netloc (host:port) — urlparse().netloc semantics, `net.py:56-72`
    val host = Option(new URI(url).getAuthority).getOrElse("")
    val path = Option(new URI(url).getPath).filter(_.nonEmpty).getOrElse("/")
    if (!Robots.allowed(transport.robots(host, ua), ua, path))
      throw new RobotsDisallowedError("Robots policy forbids fetching URL",
        Map("url" -> url, "ua" -> ua))

    @tailrec def attempt(n: Int): FetchResult = {
      rateLimiter.foreach(_.acquire(host))
      val (status, body) = transport.get(url, ua, timeoutMs)
      if (status == 200) FetchResult(url, ua, clock(), body)
      else if (status == 429 && n < retries) {
        sleeper((Backoff.delay(n, backoffFactor, random()) * 1000).toLong)
        attempt(n + 1)
      } else throw new NetworkError(s"HTTP $status fetching $url",
        Map("url" -> url, "status" -> status.toString, "attempts" -> n.toString))
    }
    attempt(1)
  }
}
