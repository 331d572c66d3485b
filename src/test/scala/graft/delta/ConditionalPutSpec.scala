package graft.delta

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Conditional-put committer contract (reference
  * committer/filesystem.rs:31-115 over the StorageHandler
  * put(overwrite=false) contract, kernel/src/lib.rs:636-642): one
  * atomic single-shot PUT per commit, exactly one winner per version,
  * losers observe Conflict with the winner's content intact.
  */
class ConditionalPutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def b(s: String) = s.getBytes(UTF_8)

  test("putIfAbsent: first writer wins, second loses, content is the " +
      "winner's") {
    val store = new InMemoryObjectStore
    assert(store.putIfAbsent("k", b("first")))
    assert(!store.putIfAbsent("k", b("second")))
    assert(store.get("k").map(new String(_, UTF_8)) == Some("first"))
  }

  test("N threads racing one key produce exactly one winner") {
    val store = new InMemoryObjectStore
    val won = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 16).map { i =>
      new Thread(() => {
        if (store.putIfAbsent("race", b(s"writer-$i"))) won.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(won.get() == 1)
    // the stored content is the winner's full object, never a torn mix
    val content = new String(store.get("race").get, UTF_8)
    assert(content.matches("writer-\\d+"))
  }

  test("delete is idempotent; list is lexicographic under a prefix") {
    val store = new InMemoryObjectStore
    Seq("a/2", "a/10", "a/1", "b/1").foreach(k => store.putIfAbsent(k, b(k)))
    assert(store.list("a/") == Seq("a/1", "a/10", "a/2")) // UTF-8 order
    store.delete("a/1"); store.delete("a/1") // second delete: no-op
    assert(store.list("a/") == Seq("a/10", "a/2"))
    assert(store.get("a/1").isEmpty)
  }

  test("commit: fresh version Committed, taken version Conflict with " +
      "the winner intact and fs-visible") {
    val store = new InMemoryObjectStore
    val committer = new ObjectStoreCommitter(store)
    val dir = new Path(TestSpark.tmpDir("cput"))
    val logDir = FileNames.logDir(dir)
    val fs = Storage.fs(dir, spark.sessionState.newHadoopConf())
    fs.mkdirs(logDir)
    committer.commit(fs, logDir, 0L, "{\"win\":0}\n") match {
      case CommitResponse.Committed(v, p) =>
        assert(v == 0L && fs.exists(p))
      case other => fail(s"expected Committed, got $other")
    }
    committer.commit(fs, logDir, 0L, "{\"lose\":0}\n") match {
      case CommitResponse.Conflict(v) =>
        assert(v == 0L)
        // loser must be able to read the WINNER's commit afterwards
        val lines = Storage.readLines(fs, FileNames.commitFile(logDir, 0L))
        assert(lines.exists(_.contains("\"win\"")))
      case other => fail(s"expected Conflict, got $other")
    }
  }

  test("publish of catalog commits is refused (filesystem-style " +
      "committers never publish)") {
    val committer = new ObjectStoreCommitter(new InMemoryObjectStore)
    val dir = new Path(TestSpark.tmpDir("cput-pub"))
    val fs = Storage.fs(dir, spark.sessionState.newHadoopConf())
    committer.publish(fs, FileNames.logDir(dir), Nil) // empty: fine
    intercept[IllegalArgumentException] {
      committer.publish(fs, FileNames.logDir(dir),
        Seq(CatalogCommit(1L, new Path(dir, "staged.json"))))
    }
  }

  test("concurrent appends + DV delete all committing via conditional " +
      "puts converge to the deterministic result") {
    val dir = TestSpark.tmpDir("cput-conc")
    val src = (0 until 400).map(i => (i.toLong, (i % 20).toLong))
      .toDF("k", "bucket")
    DeltaTable.create(spark, dir, src.schema)
    val store = new InMemoryObjectStore
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    // 6 disjoint-slice appends + 1 DV delete race for version slots,
    // every commit one conditional PUT against the SAME store
    val appends = (0 until 6).map { i =>
      Future {
        val h = DeltaTable.forPath(spark, dir,
          new ObjectStoreCommitter(store))
        h.append(src.filter($"bucket" >= i * 3 && $"bucket" < (i + 1) * 3))
      }
    }
    val del = Future {
      val h = DeltaTable.forPath(spark, dir,
        new ObjectStoreCommitter(store))
      // retry until some appends landed rows to delete; predicate is
      // disjoint from nothing — it overlaps every slice, so it must
      // rebase or conflict-retry like any real DML
      var done = false
      while (!done) {
        try { h.deleteWhereDV("k % 2 = 1"); done = true }
        catch { case _: ConcurrentWriteException => Thread.sleep(10) }
      }
    }
    Await.result(Future.sequence(appends :+ del), 120.seconds)
    val t = DeltaTable.forPath(spark, dir)
    // slices cover buckets 0..17; delete dropped odd k of whatever was
    // present when it won — re-delete to a deterministic final state
    t.deleteWhereDV("k % 2 = 1")
    val got = t.toDF.select($"k").as[Long].collect().toSet
    val expect = (0 until 400)
      .filter(i => i % 20 < 18 && i % 2 == 0).map(_.toLong).toSet
    assert(got == expect)
    // every commit object in the store matches its published file
    val fs = Storage.fs(new Path(dir), spark.sessionState.newHadoopConf())
    store.list("").foreach { key =>
      val fileBytes = Storage.readLines(fs, new Path(key))
        .mkString("", "\n", "\n")
      assert(new String(store.get(key).get, UTF_8) == fileBytes,
        s"store object and published file diverge for $key")
    }
  }
}
