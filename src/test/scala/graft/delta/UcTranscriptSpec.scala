package graft.delta

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Golden-transcript validation of the UC wire client: a vendored
  * Unity Catalog commit/list/credentials exchange — authored from the
  * wire shapes the reference pins in its serde golden tests
  * (unity-catalog-delta-client-api/src/models.rs:423-510) and its live
  * integration suite (unity-catalog-delta-rest-client/tests/
  * integration_live_server.rs) — is replayed VERBATIM through
  * [[HttpCatalogClient]] by a strict-order replay server.
  *
  * Both directions are validated: every request the client sends must
  * match the recorded exchange (method, encoded path, query, auth
  * header, JSON body up to declared-nondeterministic fields), and the
  * client must correctly consume the recorded responses untouched —
  * including real-server fields it has no use for (`uniform`, unknown
  * extensions), which a lenient parser must ignore. The transcript
  * crosses a storage-credential expiry mid-stream, so the proactive
  * re-vend (credentials.rs `expiration-time-ms` lifecycle) is part of
  * the recorded flow, not a separate unit test.
  */
class UcTranscriptSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** One recorded wire exchange: the request the client is expected to
    * send next, and the verbatim response the server returned. Expected
    * bodies may mark engine-nondeterministic values (commit wall-clock
    * timestamps, file mtimes) with the string `"«any»"`.
    */
  private case class Exchange(
      method: String,
      pathAndQuery: String,
      expectedBody: Option[String],
      status: Int,
      response: Option[String])

  /** First structural mismatch between an expected JSON tree (with
    * `"«any»"` wildcards) and the actual one, if any. Exact field sets
    * are required — an extra or missing request field is a protocol
    * drift even when a lenient server would accept it.
    */
  private def jsonDiff(exp: JsonNode, act: JsonNode,
      at: String): Option[String] = {
    if (exp.isTextual && exp.asText == "«any»") return None
    if (exp.getNodeType != act.getNodeType)
      return Some(s"$at: ${exp.getNodeType} vs ${act.getNodeType}")
    if (exp.isObject) {
      val ek = exp.fieldNames().asScala.toSet
      val ak = act.fieldNames().asScala.toSet
      if (ek != ak)
        return Some(s"$at: fields ${ak.diff(ek).mkString(",")} unexpected" +
          s" / ${ek.diff(ak).mkString(",")} missing")
      ek.iterator.flatMap(k =>
        jsonDiff(exp.get(k), act.get(k), s"$at.$k")).nextOption()
    } else if (exp.isArray) {
      if (exp.size != act.size)
        return Some(s"$at: array size ${exp.size} vs ${act.size}")
      (0 until exp.size).iterator.flatMap(i =>
        jsonDiff(exp.get(i), act.get(i), s"$at[$i]")).nextOption()
    } else if (exp != act) Some(s"$at: $exp vs $act")
    else None
  }

  /** Replays a transcript in strict order: request `i` must match
    * exchange `i` exactly, then receives exchange `i`'s recorded
    * response verbatim. Any deviation is collected in [[mismatches]]
    * (and answered 412 so the client-side failure is loud too).
    */
  private class ReplayServer(transcript: Seq[Exchange], pat: String) {
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    private var next = 0
    val mismatches = scala.collection.mutable.ArrayBuffer.empty[String]

    def baseUri: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def consumed: Int = next

    server.createContext("/", (x: HttpExchange) => handle(x))
    server.setExecutor(null)
    def start(): this.type = { server.start(); this }
    def stop(): Unit = server.stop(0)

    private def handle(x: HttpExchange): Unit = try {
      val got = x.getRequestURI.getRawPath +
        Option(x.getRequestURI.getRawQuery).map("?" + _).getOrElse("")
      val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
      if (next >= transcript.size) {
        mismatches += s"unexpected extra request: ${x.getRequestMethod} $got"
        x.sendResponseHeaders(412, -1); return
      }
      val e = transcript(next); next += 1
      if (x.getRequestMethod != e.method || got != e.pathAndQuery)
        mismatches += s"request ${next - 1}: ${x.getRequestMethod} $got" +
          s" != recorded ${e.method} ${e.pathAndQuery}"
      // every route of a real workspace sits behind the gateway PAT
      // (reference http.rs installs it as a default header)
      val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains(s"Bearer $pat"))
        mismatches += s"request ${next - 1}: Authorization $auth"
      e.expectedBody match {
        case Some(exp) =>
          jsonDiff(mapper.readTree(exp), mapper.readTree(body), "$")
            .foreach(d => mismatches += s"request ${next - 1} body: $d")
        case None =>
          if (body.nonEmpty)
            mismatches += s"request ${next - 1}: unexpected body $body"
      }
      if (mismatches.nonEmpty) { x.sendResponseHeaders(412, -1); return }
      e.response match {
        case Some(r) =>
          val bytes = r.getBytes(UTF_8)
          x.getResponseHeaders.set("Content-Type", "application/json")
          x.sendResponseHeaders(e.status, bytes.length)
          x.getResponseBody.write(bytes)
        case None => x.sendResponseHeaders(e.status, -1)
      }
    } finally x.close()
  }

  test("golden UC transcript: config, credential vending, load/list, " +
      "add-commit, backfill, metrics — verbatim replay with a " +
      "mid-stream credential-expiry re-vend") {
    val loc = TestSpark.tmpDir("uc-transcript")
    val pat = "dapi4f9c2e7a1b8d"
    val tableUuid = "3f1c2b5a-9d4e-4a67-8b21-0c9d7e6f5a43"
    val fn1 = "00000000000000000001.8c2f4b1d-5e3a-4f67-9a0b-1c2d3e4f5a6b.json"
    val fn2 = "00000000000000000002.7b1e3d5f-4a2c-4e68-8b9a-0d1c2e3f4a5b.json"
    val fn3 = "00000000000000000003.6a0d2c4e-3b1f-4d59-7a8b-9c0b1d2e3f4a.json"

    // the staged v3 commit the transcript ratifies: real bytes on disk
    // so the client's pre-ratify stat reports a deterministic size
    val stagedDir = new java.io.File(loc, "_delta_log/_staged_commits")
    assert(stagedDir.mkdirs())
    val v3Bytes = ("""{"commitInfo":{"engineInfo":"graft",""" +
      """"operation":"WRITE"}}""" + "\n").getBytes(UTF_8)
    java.nio.file.Files.write(new java.io.File(stagedDir, fn3).toPath,
      v3Bytes)

    val tPath = "/delta/v1/catalogs/main/schemas/default/tables/" +
      HttpCatalogProtocol.encodeSegment(loc)
    val now = System.currentTimeMillis()
    val expiry1 = now + 3000 // crossed mid-transcript → re-vend
    val expiry2 = now + 3600L * 1000

    // recorded server responses, served verbatim. Shapes follow the
    // reference's pinned wire bodies (models.rs golden tests); the
    // load_table bodies carry `uniform` and an unknown extension field
    // a real server may add, which the client must ignore.
    def credResponse(expiry: Long, keySeed: String) =
      s"""{"storage-credentials":[{"prefix":"file://$loc/",
         |"operation":"READ_WRITE","expiration-time-ms":$expiry,
         |"config":{"s3.access-key-id":"ASIA$keySeed",
         |"s3.secret-access-key":"sk-$keySeed",
         |"s3.session-token":"st-$keySeed"}}]}""".stripMargin
    val metadata =
      s""""metadata":{"etag":"v2","table-type":"MANAGED",
         |"table-uuid":"$tableUuid","location":"file://$loc",
         |"created-time":1749830870000,"updated-time":1749830881799,
         |"columns":{"type":"struct","fields":[
         |{"name":"id","type":"integer","nullable":true,"metadata":{}},
         |{"name":"name","type":"string","nullable":true,"metadata":{}}]},
         |"partition-columns":[],"properties":{
         |"io.unitycatalog.tableId":"$tableUuid",
         |"delta.enableInCommitTimestamps":"true"},
         |"last-commit-version":2,"last-commit-timestamp-ms":1749830881799,
         |"uniform":null,"owner":"analytics"}""".stripMargin
    val commit2 =
      s"""{"version":2,"timestamp":1749830881799,"file-name":"$fn2",
         |"file-size":891,"file-modification-timestamp":1749830881779}"""
        .stripMargin
    val commit1 =
      s"""{"version":1,"timestamp":1749830871085,"file-name":"$fn1",
         |"file-size":889,"file-modification-timestamp":1749830870833}"""
        .stripMargin

    val transcript = Seq(
      Exchange("GET", "/delta/v1/config?catalog=main&protocol-versions=1.0",
        None, 200,
        Some("""{"endpoints":[
          |"GET /delta/v1/catalogs/{catalog}/schemas/{schema}/tables/{table}",
          |"POST /delta/v1/catalogs/{catalog}/schemas/{schema}/tables/{table}",
          |"GET /delta/v1/catalogs/{catalog}/schemas/{schema}/tables/{table}/credentials",
          |"POST /delta/v1/catalogs/{catalog}/schemas/{schema}/tables/{table}/metrics"],
          |"protocol-version":"1.0"}""".stripMargin)),
      Exchange("GET", s"$tPath/credentials?operation=READ_WRITE",
        None, 200, Some(credResponse(expiry1, "JQJ5NXYPD3EXAMPLE"))),
      Exchange("GET", s"$tPath?max-results=1", None, 200,
        Some(s"""{$metadata,"commits":[$commit2],
             |"latest-table-version":2}""".stripMargin)),
      // full unpublished tail, newest-first as LoadTableResponse pins
      Exchange("GET", s"$tPath?max-results=1000", None, 200,
        Some(s"""{$metadata,"commits":[$commit2,$commit1],
             |"latest-table-version":2}""".stripMargin)),
      // the first credential has expired by now: proactive re-vend
      Exchange("GET", s"$tPath/credentials?operation=READ_WRITE",
        None, 200, Some(credResponse(expiry2, "K2M6OYZQE4EXAMPLE"))),
      Exchange("POST", tPath,
        Some(s"""{"requirements":[
             |{"type":"assert-table-uuid","uuid":"$tableUuid"}],
             |"updates":[{"action":"add-commit","commit":{
             |"version":3,"timestamp":"«any»","file-name":"$fn3",
             |"file-size":${v3Bytes.length},
             |"file-modification-timestamp":"«any»"}}]}""".stripMargin),
        200, None),
      Exchange("POST", tPath,
        Some("""{"requirements":[],"updates":[
             |{"action":"set-latest-backfilled-version",
             |"latest-published-version":3}]}""".stripMargin),
        200, None),
      Exchange("POST", s"$tPath/metrics",
        Some(s"""{"table-id":"$tableUuid","report":{"commit-report":{
             |"num-files-added":1,"num-bytes-added":${v3Bytes.length},
             |"num-files-removed":0,"num-bytes-removed":0,
             |"num-rows-inserted":10,
             |"file-size-histogram":{"sorted-bin-boundaries":[0,1024],
             |"file-counts":[1,0],"total-bytes":[${v3Bytes.length},0],
             |"commit-version":3}}}}""".stripMargin),
        200, None))

    val server = new ReplayServer(transcript, pat).start()
    try {
      val client = new HttpCatalogClient(server.baseUri,
        tableId = Some(tableUuid), workspaceToken = Some(pat))

      val (endpoints, version) = client.getConfig()
      assert(version == "1.0" && endpoints.size == 4)

      assert(client.maxRatifiedVersion(loc).contains(2L))
      // the vended credential is fully typed and its secrets redacted
      val cred = client.lastCredential.get
      assert(cred.operation == "READ_WRITE" &&
        cred.expirationTimeMs.contains(expiry1) &&
        cred.config.contains("s3.session-token"))
      assert(!cred.toString.contains("EXAMPLE") &&
        cred.toString.contains("redacted"))

      val tail = client.logTail(loc)
      assert(tail.map(_.version) == Seq(1L, 2L))
      assert(tail.map(_.location) == Seq(fn1, fn2).map(f =>
        HttpCatalogProtocol.stagedLocation(loc, f)))

      // cross the recorded credential expiry, then commit v3: the
      // client must re-vend BEFORE posting (exchange 5 precedes 6)
      Thread.sleep(math.max(0L, expiry1 - System.currentTimeMillis() + 150))
      assert(client.ratify(loc,
        CatalogCommit(3L, HttpCatalogProtocol.stagedLocation(loc, fn3))))
      assert(client.credentialRenewals == 2)
      assert(client.lastCredential.get.expirationTimeMs.contains(expiry2))

      client.markPublished(loc, 3L)

      val report = mapper.createObjectNode()
      report.put("num-files-added", 1L)
      report.put("num-bytes-added", v3Bytes.length.toLong)
      report.put("num-files-removed", 0L)
      report.put("num-bytes-removed", 0L)
      report.put("num-rows-inserted", 10L)
      val h = report.putObject("file-size-histogram")
      h.putArray("sorted-bin-boundaries").add(0L).add(1024L)
      h.putArray("file-counts").add(1L).add(0L)
      h.putArray("total-bytes").add(v3Bytes.length.toLong).add(0L)
      h.put("commit-version", 3L)
      client.reportMetrics(loc, tableUuid, report)

      assert(server.mismatches.isEmpty,
        s"wire drift vs recorded transcript:\n  " +
          server.mismatches.mkString("\n  "))
      assert(server.consumed == transcript.size,
        s"transcript not fully replayed: ${server.consumed}/" +
          transcript.size)
    } finally server.stop()
  }
}
