package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import graft.NetworkError
import graft.ops.Publish

/** Live Google-Sheets wire: OAuth2 service-account token exchange plus
  * the values REST surface, both over the JDK `HttpClient` — the
  * production implementation of [[graft.ops.Publish.SheetsClient]]
  * (reference `polla_app/publish.py:24-46` resolves the credential,
  * `publish.py:287-294` opens the gspread client; gspread speaks exactly
  * these endpoints underneath).
  *
  * Like [[JdkHttpTransport]], this class never runs against the real
  * network in CI — the build sandbox has no egress, and the reference's
  * own CI stubs gspread the same way. SheetSeamSpec exercises the FULL
  * code path (PEM parse → RS256 JWT → token POST → authorized
  * clear/update/get with JSON bodies) against an in-process loopback
  * HTTP server, so nothing here is dead wiring.
  */
object SheetsOAuth {

  private val JwtHeader = b64url("""{"alg":"RS256","typ":"JWT"}""".getBytes(UTF_8))

  private def b64url(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  /** PKCS#8 private key from the `private_key` PEM payload of a
    * service-account JSON (literal `\n` escapes already decoded by the
    * JSON parser). */
  def parsePrivateKey(pem: String): java.security.PrivateKey = {
    val body = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.isEmpty).mkString
    val der = Base64.getDecoder.decode(body)
    java.security.KeyFactory.getInstance("RSA")
      .generatePrivate(new java.security.spec.PKCS8EncodedKeySpec(der))
  }

  /** Signed JWT assertion for the service-account grant
    * (RFC 7523 §2.1; what `google-auth` builds from the same JSON). */
  def assertion(clientEmail: String, key: java.security.PrivateKey,
      scope: String, audience: String, nowSec: Long): String = {
    val claims = s"""{"iss":"$clientEmail","scope":"$scope","aud":"$audience",""" +
      s""""iat":$nowSec,"exp":${nowSec + 3600}}"""
    val signingInput = JwtHeader + "." + b64url(claims.getBytes(UTF_8))
    val sig = java.security.Signature.getInstance("SHA256withRSA")
    sig.initSign(key)
    sig.update(signingInput.getBytes(UTF_8))
    signingInput + "." + b64url(sig.sign())
  }

  /** Exchange service-account credentials for a bearer token: parse the
    * JSON (same jackson the credential resolver uses), sign the JWT,
    * POST the grant to the credential's own `token_uri`. */
  def accessToken(credentialsJson: String,
      scope: String = "https://www.googleapis.com/auth/spreadsheets",
      nowSec: Long = System.currentTimeMillis() / 1000): String = {
    val tree = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(credentialsJson)
    def field(name: String): String = {
      val n = tree.get(name)
      if (n == null || n.asText.isEmpty)
        throw new graft.ConfigError(s"service-account JSON missing '$name'")
      n.asText
    }
    val tokenUri = field("token_uri")
    val jwt = assertion(field("client_email"),
      parsePrivateKey(field("private_key")), scope, tokenUri, nowSec)
    val form = "grant_type=" + java.net.URLEncoder.encode(
      "urn:ietf:params:oauth:grant-type:jwt-bearer", "UTF-8") +
      "&assertion=" + java.net.URLEncoder.encode(jwt, "UTF-8")
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(tokenUri))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .timeout(java.time.Duration.ofSeconds(10))
        .POST(HttpRequest.BodyPublishers.ofString(form)).build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new NetworkError(s"token exchange failed: HTTP ${resp.statusCode()}",
        Map("status" -> resp.statusCode().toString))
    val tok = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(resp.body()).get("access_token")
    if (tok == null) throw new NetworkError("token response missing access_token",
      Map.empty)
    tok.asText
  }
}

/** `values` REST surface of one spreadsheet, authorized with a bearer
  * token. A write is clear + update, the reference's exact sink contract
  * (`publish.py:161-171`); reads serve the dry-run diff. `baseUrl` is
  * `https://sheets.googleapis.com` in production and a loopback stub in
  * tests. */
final class RestSheets(baseUrl: String, spreadsheetId: String, token: String,
    timeoutMs: Int = 10000) extends Publish.SheetsClient {

  private lazy val client = HttpClient.newHttpClient()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def range(worksheet: String): String =
    java.net.URLEncoder.encode(worksheet, "UTF-8")

  private def send(method: String, pathAndQuery: String,
      jsonBody: Option[String]): String = {
    val b = HttpRequest.newBuilder(URI.create(baseUrl + pathAndQuery))
      .header("Authorization", s"Bearer $token")
      .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
    val req = (jsonBody match {
      case Some(j) => b.header("Content-Type", "application/json")
        .method(method, HttpRequest.BodyPublishers.ofString(j))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new NetworkError(
        s"sheets API HTTP ${resp.statusCode()} for $method $pathAndQuery",
        Map("status" -> resp.statusCode().toString, "method" -> method))
    resp.body()
  }

  private def valuesJson(values: Seq[Seq[String]]): String = {
    val node = mapper.createObjectNode()
    val rows = node.putArray("values")
    values.foreach { r => val row = rows.addArray(); r.foreach(row.add) }
    mapper.writeValueAsString(node)
  }

  override def getAllValues(worksheet: String): Seq[Seq[String]] = {
    val body = send("GET",
      s"/v4/spreadsheets/$spreadsheetId/values/${range(worksheet)}", None)
    val vals = mapper.readTree(body).get("values")
    if (vals == null) Seq.empty
    else (0 until vals.size).map { i =>
      val row = vals.get(i)
      (0 until row.size).map(j => row.get(j).asText)
    }
  }

  override def clearAndUpdate(worksheet: String,
      values: Seq[Seq[String]]): Int = {
    send("POST",
      s"/v4/spreadsheets/$spreadsheetId/values/${range(worksheet)}:clear",
      Some("{}"))
    send("PUT",
      s"/v4/spreadsheets/$spreadsheetId/values/${range(worksheet)}" +
        "?valueInputOption=RAW",
      Some(valuesJson(values)))
    values.length
  }
}
