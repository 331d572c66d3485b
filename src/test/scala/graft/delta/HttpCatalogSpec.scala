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

  private def withServer(catDir: String)(f: HttpCatalogServer => Unit)
      : Unit = {
    val server = new HttpCatalogServer(
      new FileCatalog(fs(catDir), new Path(catDir))).start()
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
