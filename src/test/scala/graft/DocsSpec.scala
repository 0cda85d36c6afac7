package graft

import org.scalatest.funsuite.AnyFunSuite

/** Documentation ↔ code contract: the query counts quoted in
  * README.md and the verify skill are DERIVED from `SparkEntry` by
  * this spec — they drifted twice when hand-maintained. If a query is
  * added or removed, these assertions name exactly which doc to
  * update. */
class DocsSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8")

  private val nQueries = SparkEntry.queries.size
  private val nOracle = SparkEntry.oracleSql.size

  test("every registered query has an oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // ZERO rows-only queries since r18 — a new query silently missing
    // its oracle must fail here, not pass with a weaker rows-only
    // check. The last exception (the HLL sketch, whose estimate is
    // implementation-defined by design) became oracle-arbitrated via
    // the q_approx_err bound pattern: the query ships the exact count
    // plus the 5% bound as a boolean the oracle asserts. Every
    // iterative fixpoint — the k-means family, the Lloyd-fitted IVF,
    // IVF-PQ, the BPE trainer — gained a full hash oracle in r17 via
    // integer-lattice recurrences unrolled as DuckDB CTEs.
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
      == Set.empty[String])
  }

  test("README query counts match SparkEntry") {
    val readme = read("README.md")
    assert(readme.contains(s"$nQueries registered queries"),
      s"README.md drifted: expected '$nQueries registered queries'")
    assert(readme.contains(s"$nQueries queries: $nOracle"),
      s"README.md drifted: expected '$nQueries queries: $nOracle'")
  }

  test("SURVEY hash-checkable ratio matches SparkEntry") {
    val survey = read("SURVEY.md")
    assert(survey.contains(s"$nOracle/$nQueries queries hash-checkable"),
      s"SURVEY.md drifted: expected '$nOracle/$nQueries queries hash-checkable'")
  }

  test("verify skill query count matches SparkEntry") {
    val skill = read(".claude/skills/verify/SKILL.md")
    assert(skill.contains(s"$nQueries queries"),
      s"SKILL.md drifted: expected '$nQueries queries'")
  }
}
