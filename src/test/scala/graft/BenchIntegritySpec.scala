package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-integrity helpers (r19): the outlier rule the
  * re-measure/tagging machinery keys on, and the prior-artifact parsers
  * against the real committed artifacts in the repo root.
  */
class BenchIntegritySpec extends AnyFunSuite {

  private val repo = new java.io.File("/root/repo")

  test("outlier: >2x AND >1s absolute, either direction") {
    assert(BenchIntegrity.outlier(8.5, 3.7))
    assert(BenchIntegrity.outlier(3.7, 8.5))
    assert(!BenchIntegrity.outlier(1.9, 1.0)) // under 2x
    assert(!BenchIntegrity.outlier(0.9, 0.3)) // 3x but sub-second delta
    assert(!BenchIntegrity.outlier(5.0, 5.0))
  }

  test("priorQueries reads the latest committed same-SF board") {
    val qs = BenchIntegrity.priorQueries(repo, "/root/testdata/sf0.1")
    assert(qs.nonEmpty, "expected a committed bench_full artifact")
    assert(qs.contains("q1_agg"))
    assert(qs.values.forall(_ > 0))
    // SF mismatch must yield empty — a cross-scale compare would flag
    // every line
    assert(BenchIntegrity.priorQueries(repo, "/root/testdata/sf0.001").isEmpty)
  }

  test("priorLadders reads the latest committed scale artifact") {
    val ls = BenchIntegrity.priorLadders(repo)
    assert(ls.nonEmpty, "expected a committed bench_sf1 artifact")
    assert(ls.keys.exists(_._1 == "deep_ladder"))
    assert(ls.keys.exists(_._1 == "quadratic_ladder"))
    assert(ls.keys.forall(_._3.matches("t[0-9]+")))
    assert(ls.values.forall(_ > 0))
  }

  test("parsers degrade to empty on a repo without artifacts") {
    val empty = java.nio.file.Files.createTempDirectory("graft_bi").toFile
    assert(BenchIntegrity.priorQueries(empty, "x").isEmpty)
    assert(BenchIntegrity.priorLadders(empty).isEmpty)
  }
}
