package graft.queries

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

class FixtureCacheSpec extends AnyFunSuite {

  test("builds once, copies per invocation, and wipes a half-built base") {
    val key = s"fcspec-${java.util.UUID.randomUUID().toString.take(8)}"
    val sf = s"/tmp/$key-sf"
    var builds = 0
    def dest() = Files.createTempDirectory("fcspec-dest").toString
    val d1 = dest()
    val base = FixtureCache.cachedBase(key, sf, d1) { b =>
      builds += 1
      Files.createDirectories(Paths.get(b))
      Files.write(Paths.get(b, "payload.txt"), "x".getBytes("UTF-8"))
    }
    val d2 = dest()
    FixtureCache.cachedBase(key, sf, d2) { _ => builds += 1 }
    assert(builds == 1, "second invocation must reuse the built base")
    assert(Files.exists(Paths.get(d1, "payload.txt")))
    assert(Files.exists(Paths.get(d2, "payload.txt")))
    // a missing completeness marker (crashed builder) forces a wipe +
    // rebuild — stale payload from the torn build must not survive
    Files.delete(base.resolve("_base_complete.marker"))
    Files.write(base.resolve("stale.txt"), "y".getBytes("UTF-8"))
    val d3 = dest()
    FixtureCache.cachedBase(key, sf, d3) { b =>
      builds += 1
      Files.createDirectories(Paths.get(b))
      Files.write(Paths.get(b, "payload.txt"), "z".getBytes("UTF-8"))
    }
    assert(builds == 2, "a marker-less base must rebuild")
    assert(!Files.exists(Paths.get(d3, "stale.txt")),
      "torn-build leftovers must be wiped before rebuild")
    // build-time registry: exactly the two builds above were recorded
    assert(FixtureCache.buildSecs.get(key).exists(_ >= 0.0))
    FixtureCache.buildSecs.remove(key)
    FixtureCache.rmTree(base)
    Seq(d1, d2, d3).foreach(p => FixtureCache.rmTree(Paths.get(p)))
    // the cross-process FileLock file is cleanup too, not a leak
    Files.deleteIfExists(
      base.getParent.resolve(s"${base.getFileName}.lock"))
  }

  test("recipe revision forks the base dir") {
    val key = s"fcspec-${java.util.UUID.randomUUID().toString.take(8)}"
    val sf = s"/tmp/$key-sf"
    def dest() = Files.createTempDirectory("fcspec-dest").toString
    val (d1, d2) = (dest(), dest())
    var b1 = 0; var b2 = 0
    val base1 = FixtureCache.cachedBase(key, sf, d1) { b =>
      b1 += 1
      Files.createDirectories(Paths.get(b))
    }
    // a bumped rev must NOT serve the rev-1 base: the recipe changed
    val base2 = FixtureCache.cachedBase(key, sf, d2, rev = 2) { b =>
      b2 += 1
      Files.createDirectories(Paths.get(b))
    }
    assert(b1 == 1 && b2 == 1, "rev=2 must rebuild, not reuse rev=1")
    assert(base1 != base2)
    FixtureCache.buildSecs.remove(key)
    (Seq(base1, base2) ++ Seq(d1, d2).map(Paths.get(_)))
      .foreach(FixtureCache.rmTree)
    Files.deleteIfExists(
      base1.getParent.resolve(s"${base1.getFileName}.lock"))
  }
}
