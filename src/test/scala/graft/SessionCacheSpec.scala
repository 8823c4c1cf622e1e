package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cache-hygiene contract: per-(session, key) memoization while the
  * session lives, full eviction when its context stops — a JVM that
  * cycles sessions (test suites, long-lived services) must not retain
  * stopped sessions or their cached frames.
  */
class SessionCacheSpec extends AnyFunSuite {

  test("memoizes per key and evicts everything when the context stops") {
    val spark = GraftSession.builder("local[2]", 2).getOrCreate()
    val sc = spark.sparkContext
    try {
      assert(SessionCache.getOrCompute(spark, "k")("first") == "first")
      // memoized: the second computation must NOT run
      assert(SessionCache.getOrCompute(spark, "k")("second") == "first")
      assert(SessionCache.entriesFor(sc) == 1)
    } finally spark.stop()
    // the eviction listener fires asynchronously on the bus
    val deadline = System.nanoTime() + 10_000_000_000L
    while (SessionCache.entriesFor(sc) != 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(SessionCache.entriesFor(sc) == 0,
      "stopped context still strongly retained by the cache")
  }
}
