package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical enforcement of the repo's per-query convention (round-13
  * rule, after rounds 10 and 12 both ended with snapshot-commit queries
  * outside it): a query may not enter `SparkEntry.queries` without its
  * documentation rows. This spec fails the SUITE for any query id whose
  * short id (q07, x231, …) appears in neither SURVEY.md nor PLANS.md —
  * so an undocumented query cannot ship green.
  *
  * Range mentions count: "q26-q29" or "x81-x85" in the docs covers every
  * id inside the range (the historical §8 family notation).
  */
class ConventionSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  test("every SparkEntry query id is documented in SURVEY.md or PLANS.md " +
      "(short id or covering range)") {
    val docs = read("SURVEY.md") + "\n" + read("PLANS.md")
    // direct short-id mentions: q7 / x231 followed by a non-digit
    val direct = "([qx])(\\d+)(?=\\D|$)".r.findAllMatchIn(docs)
      .map(m => (m.group(1), m.group(2).toInt)).toSet
    // range mentions: q26-q29, x81-x85, x81-85
    val ranges = "([qx])(\\d+)-(?:([qx]))?(\\d+)".r.findAllMatchIn(docs)
      .flatMap { m =>
        val p = m.group(1)
        if (m.group(3) != null && m.group(3) != p) Iterator.empty
        else (m.group(2).toInt to m.group(4).toInt).iterator.map((p, _))
      }.toSet
    val covered = direct ++ ranges
    val missing = SparkEntry.queries.keys.toSeq.sorted.filterNot { name =>
      val m = "^([qx])0*(\\d+)_".r.findFirstMatchIn(name)
      m.exists(x => covered((x.group(1), x.group(2).toInt)))
    }
    assert(missing.isEmpty,
      s"queries without a SURVEY.md/PLANS.md row (add the doc rows in " +
        s"the SAME commit as the query — the round-10/12 lesson): $missing")
  }

  test("every oracle-less query is deliberate: queries minus oracleSql " +
      "stays empty (driver records only a weak rows-only check otherwise)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle SQL: $noOracle — add the oracle or " +
        s"document the exception here")
  }
}
