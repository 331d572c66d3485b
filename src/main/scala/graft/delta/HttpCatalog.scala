package graft.delta

import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient => JHttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path

/** UC-shaped JSON-over-HTTP commit-coordination protocol for
  * catalog-managed tables — the wire surface mirrors the reference's
  * Unity Catalog client API (unity-catalog-delta-client-api/src/
  * models.rs, credentials.rs; unity-catalog-delta-rest-client/src/
  * clients/commits.rs), typed onto the loopback server:
  *
  *   POST /delta/v1/tables/{key}/credentials
  *        {"operation":"READ"|"READ_WRITE"}
  *     → {"storage-credentials":[{"prefix":…,"operation":…,
  *        "expiration-time-ms":N,"config":{"token":…}}]}
  *     (credential vending; models.rs CreateStagingTableResponse
  *      .storage_credentials / credentials.rs CredentialsResponse)
  *
  *   GET  /delta/v1/tables/{key}?max-results=N&page-token=T
  *     → {"metadata":{"etag":…,"table-type":"MANAGED","table-uuid":…,
  *        "location":…},
  *        "commits":[{"version":N,"timestamp":T,"file-name":…,
  *          "file-size":S,"file-modification-timestamp":M},…],
  *        "latest-table-version":N|null,
  *        "next-page-token":"…"? }
  *     (load_table; models.rs LoadTableResponse — unpublished commits
  *      newest-first, descending; paginated here by a version cursor)
  *
  *   POST /delta/v1/tables/{key}
  *        {"requirements":[{"type":"assert-table-uuid","uuid":…}|
  *                         {"type":"assert-etag","etag":…}],
  *         "updates":[{"action":"add-commit","commit":{…}}|
  *                    {"action":"set-latest-backfilled-version",
  *                     "latest-published-version":N}]}
  *     → 200 {} | 409 {"error-code":…,"message":…}
  *     (update_table; models.rs UpdateTableRequest — at most one of
  *      each singleton, commit conflicts are catalog decisions the
  *      transaction layer rebases through, never transport errors)
  *
  * `{key}` is the URL-safe-Base64 of the table id (table ids are
  * paths; they do not URL-escape cleanly). Commits travel by
  * `file-name` only — the staged location is derived as
  * `<table>/_delta_log/_staged_commits/<file-name>`, the protocol's
  * canonical staging directory (reference log_path.rs), so the wire
  * never carries engine-local absolute paths.
  *
  * GET and update routes require a Bearer token from a vended
  * credential; an expired or unknown token gets 401 and the client
  * transparently re-vends — temporary-credential renewal mid-stream
  * is part of the protocol, not an error path.
  *
  * Scale note: the log tail is bounded by publish cadence (publishing
  * shrinks it) and paginated on top of that, so every payload here is
  * small and O(page), never O(table history).
  */
object HttpCatalogProtocol {
  val BASE = "/delta/v1/tables/"

  def key(table: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(table.getBytes(UTF_8))
  def unkey(k: String): String =
    new String(java.util.Base64.getUrlDecoder.decode(k), UTF_8)

  /** Staged-commit location a wire `file-name` denotes (the canonical
    * `_staged_commits` directory of the table's log).
    */
  def stagedLocation(table: String, fileName: String): Path =
    new Path(new Path(FileNames.logDir(new Path(table)),
      FileNames.STAGED_COMMITS_DIR), fileName)

  /** Server etag: changes whenever the ratified history advances —
    * the optimistic-concurrency handle `assert-etag` checks.
    */
  def etag(maxRatified: Option[Long]): String =
    "v" + maxRatified.map(_.toString).getOrElse("none")
}

/** A vended temporary storage credential (reference credentials.rs
  * `StorageCredential`). `config` holds live secrets — `toString`
  * redacts it, mirroring the reference's manual Debug impl.
  */
case class StorageCredential(
    prefix: String,
    operation: String,
    expirationTimeMs: Option[Long],
    config: Map[String, String]) {
  override def toString: String =
    s"StorageCredential($prefix,$operation,$expirationTimeMs," +
      s"<${config.size} redacted entries>)"
}

/** Serves any [[CatalogClient]] over loopback HTTP (JDK built-in
  * `com.sun.net.httpserver`, single-threaded executor — the backing
  * clients are already synchronized/atomic, and one arbitration thread
  * mirrors the transactional serialization point a production catalog
  * provides). Bind port 0 for an ephemeral port; read it from [[port]].
  *
  * `credTtlMs` bounds the lifetime of vended credentials (tests
  * shrink it to force mid-stream renewal).
  */
class HttpCatalogServer(backing: CatalogClient, bindPort: Int = 0,
    credTtlMs: Long = 3600L * 1000) {
  import HttpCatalogProtocol._

  private val mapper = new ObjectMapper()
  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
  /** token → expiry epoch-ms; pruned lazily on auth checks. */
  private val tokens = new ConcurrentHashMap[String, Long]()

  def port: Int = server.getAddress.getPort
  def baseUri: String = s"http://127.0.0.1:$port"
  /** Credentials vended over this server's lifetime (expiry/renewal
    * observability for tests).
    */
  @volatile var credentialsVended: Int = 0

  server.createContext(BASE, (x: HttpExchange) => handle(x))
  server.setExecutor(null) // serve on the dispatcher thread: serialized

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)

  private def handle(x: HttpExchange): Unit = {
    try {
      val rel = x.getRequestURI.getPath.stripPrefix(BASE)
      val (table, action) = rel.split("/", 2) match {
        case Array(k, a) => (unkey(k), a)
        case Array(k) if k.nonEmpty => (unkey(k), "")
        case _ => (null, null)
      }
      (x.getRequestMethod, action) match {
        case ("POST", "credentials") => vendCredential(x, table)
        case ("GET", "") if authed(x) => loadTable(x, table)
        case ("POST", "") if authed(x) => updateTable(x, table)
        case (_, "") =>
          respond(x, 401, err("credential-expired",
            "missing, unknown, or expired temporary credential"))
        case _ => respond(x, 404, err("not-found", "no such route"))
      }
    } catch {
      // malformed client input is the CLIENT's fault: typed 400, not a
      // generic 500 that reads as a server fault
      case e @ (_: IllegalArgumentException | _: NumberFormatException) =>
        respond(x, 400, err("invalid-argument",
          Option(e.getMessage).getOrElse(e.getClass.getName)))
      case e: Exception =>
        respond(x, 500, err("internal", e.getClass.getName))
    } finally x.close()
  }

  /** Bearer-token gate: vended, unexpired tokens only. */
  private def authed(x: HttpExchange): Boolean = {
    val h = Option(x.getRequestHeaders.getFirst("Authorization"))
    h.filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer "))
      .exists { t =>
        val exp = tokens.getOrDefault(t, Long.MinValue)
        if (exp < System.currentTimeMillis()) { tokens.remove(t); false }
        else true
      }
  }

  /** Temporary-credential vending (credentials.rs): a fresh token
    * scoped to the table's storage prefix with an absolute expiry.
    */
  private def vendCredential(x: HttpExchange, table: String): Unit = {
    val node = mapper.readTree(body(x))
    val op = Option(node.get("operation")).map(_.asText)
      .getOrElse("READ")
    require(op == "READ" || op == "READ_WRITE", s"bad operation $op")
    val token = java.util.UUID.randomUUID().toString
    val now = System.currentTimeMillis()
    // prune EVERY expired token here — under transparent renewal a
    // stale token is never re-presented, so auth-time pruning alone
    // would leak one map entry per renewal forever
    tokens.entrySet().removeIf(e => e.getValue < now)
    val expiry = now + credTtlMs
    tokens.put(token, expiry)
    credentialsVended += 1
    val cred = mapper.createObjectNode()
    cred.put("prefix", table + "/")
    cred.put("operation", op)
    cred.put("expiration-time-ms", expiry)
    cred.putObject("config").put("token", token)
    val resp = mapper.createObjectNode()
    resp.putArray("storage-credentials").add(cred)
    respond(x, 200, mapper.writeValueAsString(resp))
  }

  /** load_table (models.rs LoadTableResponse): typed metadata +
    * unpublished commits newest-first, paginated by a version cursor.
    */
  private def loadTable(x: HttpExchange, table: String): Unit = {
    val params = query(x)
    val maxResults = params.get("max-results").map(_.toInt).getOrElse(1000)
    require(maxResults > 0, "max-results must be positive")
    val before: Option[Long] = params.get("page-token").map(_.toLong)

    val maxRatified = backing.maxRatifiedVersion(table)
    // newest-first, as the reference's LoadTableResponse documents
    // (the CatalogClient contract returns the tail ascending)
    val tail = backing.logTail(table).reverse
    val window = before.map(b => tail.filter(_.version < b)).getOrElse(tail)
    val page = window.take(maxResults)

    val resp = mapper.createObjectNode()
    val meta = resp.putObject("metadata")
    meta.put("etag", etag(maxRatified))
    meta.put("table-type", "MANAGED")
    meta.put("table-uuid", key(table))
    meta.put("location", table)
    val commits = resp.putArray("commits")
    page.foreach { c =>
      val n = commits.addObject()
      n.put("version", c.version)
      n.put("timestamp", 0L)
      n.put("file-name", c.location.getName)
      n.put("file-size", 0L)
      n.put("file-modification-timestamp", 0L)
    }
    maxRatified match {
      case Some(v) => resp.put("latest-table-version", v)
      case None => resp.putNull("latest-table-version")
    }
    if (window.size > maxResults)
      resp.put("next-page-token", page.last.version.toString)
    respond(x, 200, mapper.writeValueAsString(resp))
  }

  /** update_table (models.rs UpdateTableRequest): validate the
    * singleton rules and requirements, then apply updates atomically
    * in order. Commit-version conflicts and failed requirements are
    * 409s — catalog decisions, not transport errors.
    */
  private def updateTable(x: HttpExchange, table: String): Unit = {
    val node = mapper.readTree(body(x))
    val reqs = arr(node, "requirements")
    val updates = arr(node, "updates")

    // singleton rules (models.rs UpdateTableRequest::new)
    def countT(ns: Seq[JsonNode], field: String, v: String) =
      ns.count(n => Option(n.get(field)).exists(_.asText == v))
    if (countT(reqs, "type", "assert-table-uuid") > 1 ||
        countT(reqs, "type", "assert-etag") > 1 ||
        countT(updates, "action", "add-commit") > 1 ||
        countT(updates, "action", "set-latest-backfilled-version") > 1) {
      respond(x, 400, err("bad-request",
        "at most one of each requirement/update type per request"))
      return
    }

    // requirements first: all must hold before any update applies
    for (r <- reqs) r.get("type").asText match {
      case "assert-table-uuid" =>
        if (r.get("uuid").asText != key(table)) {
          respond(x, 409, err("requirement-failed",
            "table uuid mismatch: table was dropped or recreated"))
          return
        }
      case "assert-etag" =>
        if (r.get("etag").asText != etag(backing.maxRatifiedVersion(table))) {
          respond(x, 409, err("requirement-failed", "etag mismatch"))
          return
        }
      case other =>
        respond(x, 400, err("bad-request", s"unknown requirement $other"))
        return
    }

    // pre-validate the WHOLE batch before applying anything: a 409 on
    // a later update must not leave an earlier one permanently applied
    // (the singleton rules above make this a closed set of cases)
    val unknown = updates.map(_.get("action").asText).find(a =>
      a != "add-commit" && a != "set-latest-backfilled-version")
    unknown.foreach { other =>
      respond(x, 400, err("bad-request", s"unknown update $other"))
      return
    }
    val addCommitU = updates.find(_.get("action").asText == "add-commit")
    updates.find(_.get("action").asText == "set-latest-backfilled-version")
      .foreach { u =>
        val upTo = u.get("latest-published-version").asLong
        // valid iff upTo will be ratified AFTER this request's own
        // add-commit (if any) lands — mirrors markPublished's guard
        val maxAfter = math.max(
          backing.maxRatifiedVersion(table).getOrElse(-1L),
          addCommitU.map(_.get("commit").get("version").asLong)
            .getOrElse(-1L))
        if (upTo > maxAfter) {
          respond(x, 409, err("invalid-backfill",
            s"cannot mark unratified version $upTo published"))
          return
        }
      }

    for (u <- updates) u.get("action").asText match {
      case "add-commit" =>
        val c = u.get("commit")
        val version = c.get("version").asLong
        val fileName = c.get("file-name").asText
        val ok = backing.ratify(table,
          CatalogCommit(version, stagedLocation(table, fileName)))
        if (!ok) {
          respond(x, 409, err("commit-version-conflict",
            s"version $version is already ratified or out of order"))
          return
        }
      case "set-latest-backfilled-version" =>
        val upTo = u.get("latest-published-version").asLong
        try backing.markPublished(table, upTo)
        catch { case e: IllegalArgumentException =>
          respond(x, 409, err("invalid-backfill", e.getMessage))
          return
        }
      case _ => () // validated above
    }
    respond(x, 200, "{}")
  }

  private def arr(node: JsonNode, field: String): Seq[JsonNode] = {
    val a = node.get(field)
    if (a == null || !a.isArray) Nil
    else (0 until a.size).map(a.get)
  }

  private def query(x: HttpExchange): Map[String, String] =
    Option(x.getRequestURI.getQuery).map(_.split("&").toSeq
      .flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k ->
          java.net.URLDecoder.decode(v, UTF_8))
        case _ => None
      }).toMap).getOrElse(Map.empty)

  private def err(code: String, message: String): String = {
    val n = mapper.createObjectNode()
    n.put("error-code", code)
    n.put("message", message)
    mapper.writeValueAsString(n)
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

/** [[CatalogClient]] over the UC-shaped wire: every catalog decision
  * crosses a real serialization boundary, so nothing in the commit
  * path can lean on shared process memory. Plugs into
  * [[CatalogCommitter]] and `DeltaTable.forPath(spark, dir, client)`
  * unchanged — the write/read paths cannot tell a remote catalog from
  * a local one, which is the abstraction the reference's
  * `UpdateTableClient` trait pins.
  *
  * Credential lifecycle: the client vends a temporary credential
  * before its first call, renews proactively at expiry, and renews
  * reactively on a 401 — a long-running stream crosses credential
  * expirations without surfacing them to the caller.
  *
  * `pageSize` caps commits per load_table page; [[logTail]] follows
  * `next-page-token` until the tail is complete.
  */
class HttpCatalogClient(base: String, pageSize: Int = 1000)
    extends CatalogClient {
  import HttpCatalogProtocol._

  private val mapper = new ObjectMapper()
  // bounded waits: a wedged catalog must surface as an ERROR the
  // transaction layer can retry, never an indefinitely hung commit
  private val http = JHttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  private val requestTimeout = java.time.Duration.ofSeconds(60)

  /** (token, expiryMs) of the current temporary credential. */
  @volatile private var cred: Option[(String, Long)] = None
  /** How many credentials this client has vended (tests assert
    * mid-stream renewal happened).
    */
  @volatile var credentialRenewals: Int = 0

  /** A 409 payload, surfaced as a typed outcome, never an exception
    * for commit conflicts.
    */
  private case class Conflict(code: String, message: String)
    extends RuntimeException(message)

  private def vend(table: String): (String, Long) = {
    val req = HttpRequest.newBuilder(
      URI.create(s"$base$BASE${key(table)}/credentials"))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        """{"operation":"READ_WRITE"}""", UTF_8)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode == 200,
      s"credential vending failed: HTTP ${resp.statusCode}: ${resp.body}")
    val c = mapper.readTree(resp.body).get("storage-credentials").get(0)
    val token = c.get("config").get("token").asText
    val expiry = Option(c.get("expiration-time-ms"))
      .filterNot(_.isNull).map(_.asLong).getOrElse(Long.MaxValue)
    credentialRenewals += 1
    val v = (token, expiry)
    cred = Some(v)
    v
  }

  private def currentToken(table: String): String = cred match {
    case Some((t, exp)) if exp > System.currentTimeMillis() => t
    case _ => vend(table)._1
  }

  /** Send with auth; on 401 renew the credential once and retry —
    * expiry mid-stream is a normal protocol event.
    */
  private def send(table: String,
      build: String => HttpRequest): String = {
    def once(token: String): HttpResponse[String] =
      http.send(build(token), HttpResponse.BodyHandlers.ofString())
    var resp = once(currentToken(table))
    if (resp.statusCode == 401) resp = once(vend(table)._1)
    if (resp.statusCode == 409) {
      val n = mapper.readTree(resp.body)
      throw Conflict(n.get("error-code").asText, n.get("message").asText)
    }
    require(resp.statusCode == 200,
      s"catalog HTTP ${resp.statusCode}: ${resp.body}")
    resp.body
  }

  private def get(table: String, queryString: String): String =
    send(table, token => HttpRequest.newBuilder(
      URI.create(s"$base$BASE${key(table)}$queryString"))
      .timeout(requestTimeout)
      .header("Authorization", s"Bearer $token")
      .GET().build())

  private def postUpdate(table: String, json: String): String =
    send(table, token => HttpRequest.newBuilder(
      URI.create(s"$base$BASE${key(table)}"))
      .timeout(requestTimeout)
      .header("Authorization", s"Bearer $token")
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json, UTF_8)).build())

  override def maxRatifiedVersion(table: String): Option[Long] = {
    val node = mapper.readTree(get(table, "?max-results=1"))
      .get("latest-table-version")
    if (node == null || node.isNull) None else Some(node.asLong)
  }

  /** Page through load_table until the unpublished tail is complete;
    * returned ascending as [[CatalogClient]] specifies.
    */
  override def logTail(table: String): Seq[CatalogCommit] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[CatalogCommit]
    var pageToken: Option[String] = None
    var more = true
    while (more) {
      val q = s"?max-results=$pageSize" +
        pageToken.map(t => s"&page-token=$t").getOrElse("")
      val node = mapper.readTree(get(table, q))
      val arr = node.get("commits")
      (0 until arr.size).foreach { i =>
        val c = arr.get(i)
        out += CatalogCommit(c.get("version").asLong,
          stagedLocation(table, c.get("file-name").asText))
      }
      val next = node.get("next-page-token")
      if (next == null || next.isNull) more = false
      else pageToken = Some(next.asText)
    }
    out.sortBy(_.version).toSeq
  }

  override def ratify(table: String, commit: CatalogCommit): Boolean = {
    val c = mapper.createObjectNode()
    c.put("version", commit.version)
    c.put("timestamp", System.currentTimeMillis())
    c.put("file-name", commit.location.getName)
    c.put("file-size", 0L)
    c.put("file-modification-timestamp", 0L)
    val u = mapper.createObjectNode()
    u.put("action", "add-commit")
    u.set[ObjectNode]("commit", c)
    val req = mapper.createObjectNode()
    req.putArray("requirements")
    req.putArray("updates").add(u)
    try { postUpdate(table, mapper.writeValueAsString(req)); true }
    catch {
      case Conflict("commit-version-conflict", _) => false
    }
  }

  override def markPublished(table: String, upTo: Long): Unit = {
    val u = mapper.createObjectNode()
    u.put("action", "set-latest-backfilled-version")
    u.put("latest-published-version", upTo)
    val req = mapper.createObjectNode()
    req.putArray("requirements")
    req.putArray("updates").add(u)
    try { postUpdate(table, mapper.writeValueAsString(req)); () }
    catch {
      case Conflict(_, message) =>
        throw new IllegalArgumentException(message)
    }
  }
}

/** Standalone catalog-server process: serves a [[FileCatalog]] rooted
  * at `args(0)` over loopback HTTP and prints `PORT=<n>` once bound —
  * lets a test (or a second engine) coordinate commits with a catalog
  * living in a DIFFERENT JVM, completing the process separation the
  * directory catalog alone only simulates. `args(1)`, when present,
  * overrides the credential TTL in ms.
  */
object HttpCatalogServerMain {
  def main(args: Array[String]): Unit = {
    val dir = new Path(args(0))
    val ttl = if (args.length > 1) args(1).toLong else 3600L * 1000
    val fs = Storage.fs(dir, new org.apache.hadoop.conf.Configuration())
    val server =
      new HttpCatalogServer(new FileCatalog(fs, dir), 0, ttl).start()
    // handshake line the launcher waits for
    println(s"PORT=${server.port}")
    Console.flush()
    Thread.currentThread.join() // serve until killed
  }
}
