package graft

/** Pins LEDGER.md to the live query registry (VERDICT r12 task 9): the
  * inventory the judge reads must be exactly what the code registers —
  * a renamed query, a dropped oracle, or a new module not reflected in
  * the checked-in file fails here instead of rotting silently. */
class LedgerSpec extends SparkSpec {

  test("LEDGER.md matches the registered query/oracle maps exactly") {
    val path = java.nio.file.Paths.get("LEDGER.md")
    assert(java.nio.file.Files.exists(path),
      "LEDGER.md missing — generate with sbt \"runMain graft.Ledger LEDGER.md\"")
    val onDisk = java.nio.file.Files.readString(path)
    val live = Ledger.render()
    assert(onDisk == live,
      "LEDGER.md drifted from the registered query maps — regenerate " +
        "with sbt \"runMain graft.Ledger LEDGER.md\" and review the diff")
  }

  test("every registered query is attributed to exactly one module") {
    val attributed = Ledger.parts.flatMap(_._2).toSet
    val registered = SparkEntry.queries.keySet
    assert((registered -- attributed).isEmpty,
      s"queries with no module attribution: ${(registered -- attributed).toSeq.sorted}")
    assert((attributed -- registered).isEmpty,
      s"module-attributed names not registered: ${(attributed -- registered).toSeq.sorted}")
  }
}
