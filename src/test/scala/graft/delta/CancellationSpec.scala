package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cooperative cancellation (reference kernel/src/cancellation.rs):
  * pre-cancelled work never starts, mid-stream cancellation surfaces
  * as QueryCancelledException (never a partial result), and cancelling
  * the token kills in-flight distributed jobs via the job group.
  */
/** Shared-JVM task→test signal (local mode only; closure capture
  * would serialize a copy).
  */
object CancellationSpecState {
  @volatile var started = false
}

class CancellationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("cancel").toString

  private def makeTable(n: Int): String = {
    val dir = tmp()
    val df = spark.range(n).select(col("id"),
      (col("id") % 10).cast("string").as("p"))
    DeltaTable.create(spark, dir, df.schema)
    val t = DeltaTable.forPath(spark, dir)
    (0 until 3).foreach(_ => t.append(df))
    dir
  }

  test("pre-cancelled token: work is not begun, Cancelled is raised") {
    val dir = makeTable(100)
    val token = CancellationToken.manual()
    token.cancel()
    intercept[QueryCancelledException] {
      Cancellation.withToken(spark, token) {
        Snapshot.forTable(spark, dir)
      }
    }
  }

  test("cancel mid-handoff: iterator raises, never exhausts normally") {
    val dir = makeTable(2000)
    val snap = Snapshot.forTable(spark, dir)
    val token = CancellationToken.manual()
    var consumed = 0
    intercept[QueryCancelledException] {
      Cancellation.withToken(spark, token) {
        val it = new DeltaScan(snap, None).addFileIterator()
        it.foreach { _ =>
          consumed += 1
          if (consumed == 2) token.cancel()
        }
      }
    }
    assert(consumed >= 2) // some progress, then Cancelled — not silence
  }

  test("outside a token scope, check() is a no-op") {
    Cancellation.check() // must not throw
    val dir = makeTable(50)
    val n = Snapshot.forTable(spark, dir).toDF.count()
    assert(n == 150)
  }

  test("scopes do not leak across operations on the same thread") {
    val dir = makeTable(50)
    val token = CancellationToken.manual()
    Cancellation.withToken(spark, token) {
      // create + 3 appends = version 3
      assert(Snapshot.forTable(spark, dir).version == 3L)
    }
    token.cancel()
    // token cancelled AFTER its scope closed: next op unaffected
    assert(Snapshot.forTable(spark, dir).toDF.count() == 150)
  }

  test("cancelling the token kills an in-flight distributed job") {
    CancellationSpecState.started = false
    val token = CancellationToken.manual()
    val result = new java.util.concurrent.atomic.AtomicReference[String]()
    val worker = new Thread(() => {
      try {
        Cancellation.withToken(spark, token) {
          // a job that would run ~forever without the job-group kill:
          // tasks signal start through the shared-JVM spec state (a
          // closure-captured latch would not survive task serialization)
          spark.range(0, 1000000, 1, 4).mapPartitions { it =>
            CancellationSpecState.started = true
            it.map { i => Thread.sleep(20); i }
          }.count()
        }
        result.set("completed")
      } catch {
        case _: QueryCancelledException => result.set("cancelled")
        case e: Throwable => result.set(s"other: ${e.getClass.getName}")
      }
    })
    worker.start()
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (!CancellationSpecState.started && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(CancellationSpecState.started, "job never started")
    Thread.sleep(200)
    val t0 = System.nanoTime()
    token.cancel()
    worker.join(60000)
    assert(!worker.isAlive, "worker did not finish after cancel")
    val tookMs = (System.nanoTime() - t0) / 1e6
    assert(result.get() == "cancelled", s"got ${result.get()}")
    // 1M rows x 20ms would be ~5.5h of work; the kill must be prompt
    assert(tookMs < 30000, s"cancel took ${tookMs}ms")
  }
}
