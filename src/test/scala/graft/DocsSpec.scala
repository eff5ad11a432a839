package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins README.md's battery/oracle counts to the actual `SparkEntry`
  * maps: the counts drifted silently across rounds 3-5, so they are now
  * test-gated — adding a query without touching the README (or vice
  * versa) fails the suite and names the stale sentence.
  */
class DocsSpec extends AnyFunSuite {

  private lazy val readme = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
    java.nio.charset.StandardCharsets.UTF_8)

  test("README battery and oracle counts match SparkEntry") {
    val nQueries = SparkEntry.queries.size
    val nOracles = SparkEntry.oracleSql.size
    assert(readme.contains(s"the $nQueries-query battery"),
      s"README must describe 'the $nQueries-query battery' (SparkEntry.queries.size)")
    assert(readme.contains(s"($nOracles/$nQueries;"),
      s"README must cite '($nOracles/$nQueries;' oracle coverage (SparkEntry.oracleSql.size)")
    assert(readme.contains(s"All $nOracles oracle-checked queries"),
      s"README verification status must say 'All $nOracles oracle-checked queries'")
    assert(raw"The other ${nQueries - 1}\s+queries".r.findFirstIn(readme).isDefined,
      s"README baseline section must say 'The other ${nQueries - 1} queries' (all but q44)")
  }

  test("every oracle key names a real query; rows-only set is the documented one") {
    val stray = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stray.isEmpty, s"oracles without a query: $stray")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Every query carries an oracle: the last rows-only entry (q26)
    // graduated to an empty-diff exactness gate in round 8 (q33/q82/q47
    // graduated the same way in round 7).
    assert(rowsOnly === Set.empty[String],
      s"oracle-less queries appeared: $rowsOnly")
  }
}
