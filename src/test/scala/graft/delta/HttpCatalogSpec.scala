package graft.delta

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Catalog-managed commits coordinated across a REAL process boundary
  * (reference: unity-catalog-delta-rest-client — the engine talks to
  * its commit authority over HTTP; version conflicts are catalog
  * decisions, transport errors are not conflicts). Covers the in-JVM
  * wire (client+server over loopback, state only reachable through
  * HTTP) and a second-JVM server (nothing shared but the socket).
  */
class HttpCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def src(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"v$i")).toDF("k", "s")

  private def fs(dir: String) = Storage.fs(new Path(dir),
    spark.sessionState.newHadoopConf())

  private def publishedCommits(dir: String): Seq[Long] =
    Storage.listSorted(fs(dir), FileNames.logDir(new Path(dir)))
      .flatMap(st => FileNames.parse(st.getPath))
      .collect { case c: FileNames.CommitFile => c.version }

  private def withServer(catDir: String, credTtlMs: Long = 3600L * 1000)
      (f: HttpCatalogServer => Unit): Unit = {
    val server = new HttpCatalogServer(
      new FileCatalog(fs(catDir), new Path(catDir)), 0, credTtlMs).start()
    try f(server) finally server.stop()
  }

  test("HTTP catalog: create/append/read/publish round trip, all " +
      "coordination over the wire") {
    val dir = TestSpark.tmpDir("http-cat")
    val catDir = TestSpark.tmpDir("http-cat-store")
    withServer(catDir) { server =>
      val cat = new HttpCatalogClient(server.baseUri)
      DeltaTable.create(spark, dir, src(1, 1).schema, catalog = Some(cat))
      val t = DeltaTable.forPath(spark, dir, cat)
      t.append(src(1, 10))   // v1
      t.append(src(11, 20))  // v2

      assert(publishedCommits(dir).isEmpty)
      assert(cat.maxRatifiedVersion(dir).contains(2L))
      assert(cat.logTail(dir).map(_.version) == Seq(0L, 1L, 2L))
      assert(t.toDF.select("k").as[Long].collect().toSet ==
        (1L to 20L).toSet)

      // an independent client against the same server converges
      val cat2 = new HttpCatalogClient(server.baseUri)
      val t2 = DeltaTable.forPath(spark, dir, cat2)
      assert(t2.toDF.count() == 20)
      assert(t2.snapshot(Some(1L)).toDF.count() == 10)

      // partial publish through one client is visible through the other
      assert(t.publish(Some(1L)) == 1L)
      assert(publishedCommits(dir) == Seq(0L, 1L))
      assert(cat2.logTail(dir).map(_.version) == Seq(2L))
      assert(t2.toDF.count() == 20)

      // publish-past-ratified surfaces the catalog's 409 as the same
      // IllegalArgumentException the local clients throw
      val e = intercept[IllegalArgumentException] {
        cat.markPublished(dir, 99L)
      }
      assert(e.getMessage.contains("unratified"))
    }
  }

  test("UC wire: paginated log tail — client pages through " +
      "next-page-token and reassembles the full ascending tail") {
    val dir = TestSpark.tmpDir("http-page")
    val catDir = TestSpark.tmpDir("http-page-store")
    withServer(catDir) { server =>
      // writer ratifies 7 commits through a default-page-size client
      val writer = new HttpCatalogClient(server.baseUri)
      DeltaTable.create(spark, dir, src(1, 1).schema,
        catalog = Some(writer))
      val t = DeltaTable.forPath(spark, dir, writer)
      (1 to 6).foreach(i => t.append(src(i * 10, i * 10 + 4)))
      assert(writer.maxRatifiedVersion(dir).contains(6L))

      // a page-size-2 reader must follow 4 pages (7 commits, newest
      // first: [6,5],[4,3],[2,1],[0]) and still reassemble the tail
      val pagedReader = new HttpCatalogClient(server.baseUri, pageSize = 2)
      val tail = pagedReader.logTail(dir)
      assert(tail.map(_.version) == (0L to 6L))
      // locations resolve to the canonical staged-commits dir
      assert(tail.forall(_.location.toString.contains(
        FileNames.STAGED_COMMITS_DIR)))
      // and a snapshot through the paginated client reads everything
      val tPaged = DeltaTable.forPath(spark, dir, pagedReader)
      assert(tPaged.toDF.count() == 30)

      // publishing shrinks what pagination has to cover
      assert(t.publish(Some(4L)) == 4L)
      assert(pagedReader.logTail(dir).map(_.version) == Seq(5L, 6L))
    }
  }

  test("UC wire: temporary credential expires mid-stream; client " +
      "renews transparently and work completes") {
    val dir = TestSpark.tmpDir("http-cred")
    val catDir = TestSpark.tmpDir("http-cred-store")
    withServer(catDir, credTtlMs = 300) { server =>
      val cat = new HttpCatalogClient(server.baseUri)
      DeltaTable.create(spark, dir, src(1, 1).schema, catalog = Some(cat))
      val t = DeltaTable.forPath(spark, dir, cat)
      t.append(src(1, 10))
      val renewalsBefore = cat.credentialRenewals
      assert(renewalsBefore >= 1) // bootstrap vend happened

      // outlive the TTL so the cached token is stale, then keep working
      Thread.sleep(400)
      t.append(src(11, 20))
      assert(cat.maxRatifiedVersion(dir).contains(2L))
      assert(t.toDF.count() == 20)
      assert(cat.credentialRenewals > renewalsBefore,
        "client should have re-vended after expiry")
      assert(server.credentialsVended >= cat.credentialRenewals)

      // a fresh client starting after many expirations still works
      Thread.sleep(400)
      val late = new HttpCatalogClient(server.baseUri)
      assert(late.logTail(dir).map(_.version) == (0L to 2L))
    }
  }

  test("UC wire: update_table requirements — assert-table-uuid and " +
      "assert-etag gate the update; singleton rule enforced") {
    val dir = TestSpark.tmpDir("http-req")
    val catDir = TestSpark.tmpDir("http-req-store")
    withServer(catDir) { server =>
      val cat = new HttpCatalogClient(server.baseUri)
      DeltaTable.create(spark, dir, src(1, 1).schema, catalog = Some(cat))

      // raw wire probe: POST an update with a failing requirement
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val http = java.net.http.HttpClient.newHttpClient()
      def post(bodyJson: String, token: String): java.net.http.HttpResponse[String] =
        http.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(server.baseUri +
            HttpCatalogProtocol.BASE + HttpCatalogProtocol.key(dir)))
          .header("Authorization", s"Bearer $token")
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(bodyJson))
          .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      def vendToken(): String = {
        val r = http.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(server.baseUri + HttpCatalogProtocol.BASE +
            HttpCatalogProtocol.key(dir) + "/credentials"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            """{"operation":"READ_WRITE"}""")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        mapper.readTree(r.body).get("storage-credentials").get(0)
          .get("config").get("token").asText
      }
      val token = vendToken()

      // wrong uuid → 409 requirement-failed, nothing applied
      val bad = post("""{"requirements":[{"type":"assert-table-uuid",
        "uuid":"nope"}],"updates":[{"action":"set-latest-backfilled-version",
        "latest-published-version":0}]}""".replaceAll("\n\\s*", ""), token)
      assert(bad.statusCode == 409)
      assert(mapper.readTree(bad.body).get("error-code").asText ==
        "requirement-failed")

      // right uuid + right etag → applied
      val etag = HttpCatalogProtocol.etag(cat.maxRatifiedVersion(dir))
      val uuid = HttpCatalogProtocol.key(dir)
      val good = post(
        s"""{"requirements":[{"type":"assert-table-uuid","uuid":"$uuid"},
           |{"type":"assert-etag","etag":"$etag"}],
           |"updates":[]}""".stripMargin.replaceAll("\n", ""), token)
      assert(good.statusCode == 200)

      // stale etag → 409
      val stale = post(s"""{"requirements":[{"type":"assert-etag",
        "etag":"v999"}],"updates":[]}""".replaceAll("\n\\s*", ""), token)
      assert(stale.statusCode == 409)

      // duplicate singleton → 400
      val dup = post(s"""{"requirements":[{"type":"assert-etag",
        "etag":"$etag"},{"type":"assert-etag","etag":"$etag"}],
        "updates":[]}""".replaceAll("\n\\s*", ""), token)
      assert(dup.statusCode == 400)

      // no/expired token → 401
      val noAuth = post("""{"requirements":[],"updates":[]}""", "bogus")
      assert(noAuth.statusCode == 401)
    }
  }

  test("HTTP catalog: two-writer race — server arbitrates one winner " +
      "per version; loser rebases") {
    val dir = TestSpark.tmpDir("http-race")
    val catDir = TestSpark.tmpDir("http-race-store")
    withServer(catDir) { server =>
      val catA = new HttpCatalogClient(server.baseUri)
      val catB = new HttpCatalogClient(server.baseUri)
      DeltaTable.create(spark, dir, src(1, 1).schema, catalog = Some(catA))
      val a = DeltaTable.forPath(spark, dir, catA)
      val b = DeltaTable.forPath(spark, dir, catB)

      val staleA = a.snapshot()        // A reads v0
      b.append(src(1, 10))             // B ratifies v1 first
      val v = a.appendFrom(staleA, src(11, 20)) // A: conflict → rebase
      assert(v == 2L)
      assert(catB.maxRatifiedVersion(dir).contains(2L))
      assert(a.toDF.select("k").as[Long].collect().toSet ==
        (1L to 20L).toSet)

      // raw arbitration over the wire: a taken version loses cleanly
      val taken = catA.logTail(dir).head
      assert(!catB.ratify(dir,
        CatalogCommit(taken.version, taken.location)))
      // … and out-of-order ratification is refused
      assert(!catB.ratify(dir, CatalogCommit(99L, taken.location)))
    }
  }

  test("HTTP catalog: ratification races from concurrent threads " +
      "yield exactly one winner per version") {
    val dir = TestSpark.tmpDir("http-threads")
    val catDir = TestSpark.tmpDir("http-threads-store")
    withServer(catDir) { server =>
      val cat = new HttpCatalogClient(server.baseUri)
      DeltaTable.create(spark, dir, src(1, 1).schema, catalog = Some(cat))
      // 8 clients race to ratify version 1 with distinct locations
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val gate = new java.util.concurrent.CountDownLatch(1)
      val futures = Future.sequence((1 to 8).map { i =>
        Future {
          gate.await() // all 8 fire together
          new HttpCatalogClient(server.baseUri).ratify(dir,
            CatalogCommit(1L, new Path(s"/staged/loc-$i.json")))
        }
      })
      gate.countDown()
      val results = Await.result(futures, 30.seconds)
      assert(results.count(identity) == 1)
      assert(cat.maxRatifiedVersion(dir).contains(1L))
    }
  }

  test("HTTP catalog served from a SEPARATE JVM: round trip + race " +
      "with nothing shared but the socket") {
    val dir = TestSpark.tmpDir("http-jvm")
    val catDir = TestSpark.tmpDir("http-jvm-store")

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val opens = Seq("java.base/java.lang", "java.base/java.util",
      "java.base/java.net", "java.base/java.io", "java.base/sun.nio.ch",
      "java.base/java.util.concurrent")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ opens ++ Seq("-cp",
      System.getProperty("java.class.path"),
      "graft.delta.HttpCatalogServerMain", catDir)
    val proc = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).start()
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      // wait for the PORT= handshake (skip any log noise)
      val port = Iterator.continually(reader.readLine())
        .takeWhile(_ != null).collectFirst {
          case l if l.startsWith("PORT=") => l.stripPrefix("PORT=").toInt
        }.getOrElse(fail("catalog server never printed PORT="))

      val catA = new HttpCatalogClient(s"http://127.0.0.1:$port")
      val catB = new HttpCatalogClient(s"http://127.0.0.1:$port")
      DeltaTable.create(spark, dir, src(1, 1).schema, catalog = Some(catA))
      val a = DeltaTable.forPath(spark, dir, catA)
      val b = DeltaTable.forPath(spark, dir, catB)
      a.append(src(1, 10))
      val staleB = b.snapshot()
      a.append(src(11, 20))             // A wins v2
      val v = b.appendFrom(staleB, src(21, 30)) // B rebases to v3
      assert(v == 3L)
      assert(catA.maxRatifiedVersion(dir).contains(3L))
      assert(b.toDF.select("k").as[Long].collect().toSet ==
        (1L to 30L).toSet)

      // publish through the remote catalog, then verify on-disk state
      assert(a.publish() == 3L)
      assert(publishedCommits(dir) == Seq(0L, 1L, 2L, 3L))
      assert(catB.logTail(dir).isEmpty)
    } finally proc.destroyForcibly()
  }
}
