package graft.delta

import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient => JHttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path

/** JSON-over-HTTP commit-coordination protocol for catalog-managed
  * tables — the process boundary the reference's catalog REST client
  * crosses (unity-catalog-delta-rest-client/src/clients/commits.rs:33-55
  * posts ratification requests; the catalog, not the writer, arbitrates
  * version conflicts, and "retries belong in the transaction layer").
  *
  * The wire surface is exactly [[CatalogClient]], one route per method:
  *
  *   GET  /catalog/v1/tables/{key}/version   → {"maxRatifiedVersion":N|null}
  *   GET  /catalog/v1/tables/{key}/log-tail  → {"commits":[{"version":N,"location":"…"},…]}
  *   POST /catalog/v1/tables/{key}/ratify    {"version":N,"location":"…"} → {"ratified":bool}
  *   POST /catalog/v1/tables/{key}/published {"upTo":N} → {} (409 when unratified)
  *
  * `{key}` is the URL-safe-Base64 of the table id (table ids are paths;
  * they do not URL-escape cleanly). Ratification losers get a clean
  * `{"ratified":false}` — a lost race is a normal outcome the
  * transaction layer rebases through, not a transport error.
  *
  * Scale note: the log tail is bounded by publish cadence (publishing
  * shrinks it), so every payload here is small and O(tail), never
  * O(table history) — the same reason the reference ships log-tail
  * locations rather than commit contents over its wire.
  */
object HttpCatalogProtocol {
  val BASE = "/catalog/v1/tables/"

  def key(table: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(table.getBytes(UTF_8))
  def unkey(k: String): String =
    new String(java.util.Base64.getUrlDecoder.decode(k), UTF_8)
}

/** Serves any [[CatalogClient]] over loopback HTTP (JDK built-in
  * `com.sun.net.httpserver`, single-threaded executor — the backing
  * clients are already synchronized/atomic, and one arbitration thread
  * mirrors the transactional serialization point a production catalog
  * provides). Bind port 0 for an ephemeral port; read it from [[port]].
  */
class HttpCatalogServer(backing: CatalogClient, bindPort: Int = 0) {
  import HttpCatalogProtocol._

  private val mapper = new ObjectMapper()
  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)

  def port: Int = server.getAddress.getPort
  def baseUri: String = s"http://127.0.0.1:$port"

  server.createContext(BASE, (x: HttpExchange) => handle(x))
  server.setExecutor(null) // serve on the dispatcher thread: serialized

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)

  private def handle(x: HttpExchange): Unit = {
    try {
      val rel = x.getRequestURI.getPath.stripPrefix(BASE)
      val (table, action) = rel.split("/", 2) match {
        case Array(k, a) => (unkey(k), a)
        case _ => (null, null)
      }
      (x.getRequestMethod, action) match {
        case ("GET", "version") =>
          val v = backing.maxRatifiedVersion(table)
          respond(x, 200,
            s"""{"maxRatifiedVersion":${v.map(_.toString).getOrElse("null")}}""")
        case ("GET", "log-tail") =>
          val commits = backing.logTail(table).map { c =>
            s"""{"version":${c.version},"location":""" +
              mapper.writeValueAsString(c.location.toString) + "}"
          }
          respond(x, 200, commits.mkString("""{"commits":[""", ",", "]}"))
        case ("POST", "ratify") =>
          val node = mapper.readTree(body(x))
          val ok = backing.ratify(table, CatalogCommit(
            node.get("version").asLong,
            new Path(node.get("location").asText)))
          respond(x, 200, s"""{"ratified":$ok}""")
        case ("POST", "published") =>
          val node = mapper.readTree(body(x))
          try { backing.markPublished(table, node.get("upTo").asLong)
                respond(x, 200, "{}") }
          catch { case e: IllegalArgumentException =>
            respond(x, 409, s"""{"error":""" +
              mapper.writeValueAsString(e.getMessage) + "}") }
        case _ => respond(x, 404, """{"error":"no such route"}""")
      }
    } catch { case e: Exception =>
      respond(x, 500, s"""{"error":"${e.getClass.getName}"}""")
    } finally x.close()
  }

  private def body(x: HttpExchange): String =
    new String(x.getRequestBody.readAllBytes(), UTF_8)

  private def respond(x: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length)
    x.getResponseBody.write(bytes)
  }
}

/** [[CatalogClient]] over the wire: every catalog decision crosses a
  * real serialization boundary, so nothing in the commit path can lean
  * on shared process memory. Plugs into [[CatalogCommitter]] and
  * `DeltaTable.forPath(spark, dir, client)` unchanged — the write/read
  * paths cannot tell a remote catalog from a local one, which is the
  * abstraction the reference's `UpdateTableClient` trait pins.
  */
class HttpCatalogClient(base: String) extends CatalogClient {
  import HttpCatalogProtocol._

  private val mapper = new ObjectMapper()
  // bounded waits: a wedged catalog must surface as an ERROR the
  // transaction layer can retry, never an indefinitely hung commit
  private val http = JHttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  private val requestTimeout = java.time.Duration.ofSeconds(60)

  private def get(table: String, action: String): String =
    send(HttpRequest.newBuilder(
      URI.create(s"$base$BASE${key(table)}/$action"))
      .timeout(requestTimeout).GET().build())

  private def post(table: String, action: String, json: String): String =
    send(HttpRequest.newBuilder(
      URI.create(s"$base$BASE${key(table)}/$action"))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json, UTF_8)).build())

  private def send(req: HttpRequest): String = {
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode == 409)
      throw new IllegalArgumentException(
        mapper.readTree(resp.body).get("error").asText)
    require(resp.statusCode == 200,
      s"catalog HTTP ${resp.statusCode}: ${resp.body}")
    resp.body
  }

  override def maxRatifiedVersion(table: String): Option[Long] = {
    val node = mapper.readTree(get(table, "version"))
      .get("maxRatifiedVersion")
    if (node == null || node.isNull) None else Some(node.asLong)
  }

  override def logTail(table: String): Seq[CatalogCommit] = {
    val arr = mapper.readTree(get(table, "log-tail")).get("commits")
    (0 until arr.size).map { i =>
      val c = arr.get(i)
      CatalogCommit(c.get("version").asLong,
        new Path(c.get("location").asText))
    }
  }

  override def ratify(table: String, commit: CatalogCommit): Boolean = {
    val json = s"""{"version":${commit.version},"location":""" +
      mapper.writeValueAsString(commit.location.toString) + "}"
    mapper.readTree(post(table, "ratify", json)).get("ratified").asBoolean
  }

  override def markPublished(table: String, upTo: Long): Unit = {
    post(table, "published", s"""{"upTo":$upTo}""")
    ()
  }
}

/** Standalone catalog-server process: serves a [[FileCatalog]] rooted
  * at `args(0)` over loopback HTTP and prints `PORT=<n>` once bound —
  * lets a test (or a second engine) coordinate commits with a catalog
  * living in a DIFFERENT JVM, completing the process separation the
  * directory catalog alone only simulates.
  */
object HttpCatalogServerMain {
  def main(args: Array[String]): Unit = {
    val dir = new Path(args(0))
    val fs = Storage.fs(dir, new org.apache.hadoop.conf.Configuration())
    val server =
      new HttpCatalogServer(new FileCatalog(fs, dir)).start()
    // handshake line the launcher waits for
    println(s"PORT=${server.port}")
    Console.flush()
    Thread.currentThread.join() // serve until killed
  }
}
