package graft.queries

import graft.etl.EtlSpecBase

/** SURVEY.md §2.9 ↔ `SparkEntry.queries` drift guard (VERDICT r12 #8):
  * at 307 queries and a ~950-line ledger, a rename or an unledgered
  * addition can no longer be caught by eyeball. Two invariants:
  *
  *  1. every registered query name appears in the §2.9 ledger section
  *     (an addition must be ledgered before it ships);
  *  2. every `qN_*` token mentioned ANYWHERE in SURVEY.md names a
  *     registered query (a rename must sweep the prose too).
  *
  * The scan is textual on purpose — the ledger is a document, and the
  * failure message names the drifted keys so the fix is mechanical.
  */
class LedgerConsistencySpec extends EtlSpecBase {

  private val qName = "\\bq\\d+_[a-z0-9_]+\\b".r

  private def surveyText: String = {
    val p = java.nio.file.Paths.get("SURVEY.md")
    assert(java.nio.file.Files.exists(p),
      s"SURVEY.md not found under ${new java.io.File(".").getAbsolutePath}")
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  test("every registered query is ledgered in SURVEY §2.9") {
    val survey = surveyText
    val start = survey.indexOf("### 2.9")
    assert(start >= 0, "SURVEY.md lost its §2.9 heading")
    // §2.9 runs to the next top-level section
    val tail = survey.substring(start)
    val end = tail.indexOf("\n## ")
    val ledger = if (end >= 0) tail.substring(0, end) else tail
    val ledgered = qName.findAllIn(ledger).toSet
    val missing = graft.SparkEntry.queries.keySet -- ledgered
    assert(missing.isEmpty,
      s"registered but not in the §2.9 ledger: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every query name SURVEY mentions is actually registered") {
    val mentioned = qName.findAllIn(surveyText).toSet
    val ghosts = mentioned -- graft.SparkEntry.queries.keySet
    assert(ghosts.isEmpty,
      s"SURVEY mentions unregistered query names (rename drift?): " +
        ghosts.toSeq.sorted.mkString(", "))
  }

  test("every registered query has an oracle or a documented rows-only gap") {
    // oracleSql keys must be a subset of queries (a dangling oracle is
    // dead weight); queries without an oracle get the weaker driver
    // check, so keep that set visibly tiny
    val dangling = graft.SparkEntry.oracleSql.keySet --
      graft.SparkEntry.queries.keySet
    assert(dangling.isEmpty,
      s"oracles without queries: ${dangling.toSeq.sorted.mkString(", ")}")
    val unoracled = graft.SparkEntry.queries.keySet --
      graft.SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty,
      s"queries without oracles (rows-only check): " +
        unoracled.toSeq.sorted.mkString(", "))
  }
}
