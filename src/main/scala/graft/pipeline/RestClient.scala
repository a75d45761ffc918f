package graft.pipeline

import java.io.IOException
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

/** Transport abstraction over the slice of the Firebase REST surface the
  * reference uses (via FirebaseLib — BackupProcessor.php:172 `get`,
  * RestoreProcessor.php:80 `update`):
  *
  *   GET   <base><path>.json?orderBy="$key"&limitToFirst=N[&startAt="k"]
  *   GET   <base><path>.json?shallow=true
  *   PATCH <base><path>.json   (merge-update of direct children)
  *
  * A trait so the pagination/restore logic is testable against an
  * in-process stub server (no network in CI) and fault-injectable;
  * Serializable so executor tasks can carry a client per partition in
  * the distributed export (LiveExport.export).
  */
/** Exponential retry pacing shared by the live walker's shallow-retry
  * loop and the restore drain. The reference retries back-to-back
  * (BackupProcessor.php:80-87, RestoreProcessor.php:82-94) — against a
  * real rate-limited database that burns the whole retry budget inside
  * the same quota window; pacing 100ms → 200 → 400 → ... capped at 10s
  * is the one deliberate production-shaped divergence. `attempt` is
  * 0-based (the delay BEFORE retry attempt+2). */
object Backoff {
  val BaseMs = 100L
  val CapMs = 10000L
  def delayMs(attempt: Int): Long =
    math.min(CapMs, BaseMs << math.min(attempt, 16))
}

/** One GET's outcome: HTTP status + raw body. Firebase signals real
  * errors (auth, size limits) with 4xx statuses AND an
  * `{"error": ...}` body; the status is what disambiguates them from
  * legitimate user data whose child KEY happens to be "error" — a page
  * read of such a node answers `{"error": <value>}` with 200, which is
  * indistinguishable from an error payload by shape alone. */
final case class RestResponse(status: Int, body: String)

trait RestClient extends Serializable {

  /** GET `path` with query params; returns the raw JSON body (Firebase
    * reports in-band errors like `{"error":"Payload is too large"}` in
    * the body, which callers inspect — BackupProcessor.php:174). Throws
    * IOException only on transport failure. */
  def get(path: String, query: Map[String, String]): String =
    getR(path, query).body

  /** As [[get]], but with the HTTP status (see [[RestResponse]]). The
    * reference's PHP lib discards the status, which is why it must
    * classify errors by body shape; the walker here uses the status
    * when the transport provides one. Implementations that cannot
    * report a status answer 200. */
  def getR(path: String, query: Map[String, String]): RestResponse

  /** PATCH `path` with a JSON object body (Firebase `update` — merge of
    * direct children). True on 2xx. The restore drain interprets false
    * as "shrink the batch" (RestoreProcessor.php:82). */
  def patch(path: String, bodyJson: String): Boolean
}

/** `java.net.HttpURLConnection`-based client (JDK-only, no extra
  * dependencies). Stateless per call, so a single instance is safe to
  * share across partition tasks; all fields are plain Strings so the
  * instance serializes into closures.
  *
  * @param baseUrl   e.g. `https://<project>.firebaseio.com` (or a test
  *                  stub's `http://localhost:<port>`)
  * @param authToken Firebase database secret / ID token, sent as the
  *                  `auth` query param exactly like the reference's
  *                  FirebaseLib (frdbackup config `project_key`)
  */
final class HttpRestClient(baseUrl: String,
                           authToken: Option[String] = None,
                           connectTimeoutMs: Int = 10000,
                           readTimeoutMs: Int = 120000) extends RestClient {

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8.name())

  // Firebase keys may contain URI-illegal characters (spaces, unicode —
  // only . $ # [ ] / are forbidden): each path SEGMENT percent-encodes
  // (URLEncoder is form-encoding, so its '+' must become '%20' in a
  // path), else `new URI` throws URISyntaxException mid-export
  private def encPath(path: String): String =
    path.split("/", -1).map(seg =>
      enc(seg).replace("+", "%20")).mkString("/")

  private def urlFor(path: String, query: Map[String, String]): URI = {
    val p = if (path == "/" || path.isEmpty) "/" else encPath(path)
    val q = (query ++ authToken.map("auth" -> _))
      .map { case (k, v) => enc(k) + "=" + enc(v) }.mkString("&")
    new URI(baseUrl.stripSuffix("/") + p + ".json" +
      (if (q.isEmpty) "" else "?" + q))
  }

  private def readAll(conn: HttpURLConnection): String = {
    val is = if (conn.getResponseCode < 400) conn.getInputStream
             else conn.getErrorStream
    if (is == null) ""
    else try new String(is.readAllBytes(), StandardCharsets.UTF_8)
    finally is.close()
  }

  override def getR(path: String,
                    query: Map[String, String]): RestResponse = {
    val conn = urlFor(path, query).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("GET")
    try RestResponse(conn.getResponseCode, readAll(conn))
    finally conn.disconnect()
  }

  override def patch(path: String, bodyJson: String): Boolean = {
    val conn = urlFor(path, Map.empty).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    // HttpURLConnection rejects PATCH as a method; the standard
    // workaround Firebase itself documents is POST + X-HTTP-Method-
    // Override (REST docs, "Conditional requests" / method override).
    conn.setRequestMethod("POST")
    conn.setRequestProperty("X-HTTP-Method-Override", "PATCH")
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setDoOutput(true)
    try {
      val os = conn.getOutputStream
      try os.write(bodyJson.getBytes(StandardCharsets.UTF_8))
      finally os.close()
      val code = conn.getResponseCode
      readAll(conn) // drain so the connection is reusable
      code >= 200 && code < 300
    } catch {
      case _: IOException => false // transport failure == failed batch
    } finally conn.disconnect()
  }
}
