package graft

/** The driver contract itself: the flagship entry returns rows, every
  * registry entry is uniquely named, and every oracle key names a
  * registered query — the three shapes that fail a round before any
  * operator logic gets a chance to.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry (the driver's smoke check) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracle keys all resolve") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // every oracle ends with a total ORDER BY unless it is single-row
    // by construction — the driver compares row order
    assert(names.forall(_.matches("q[0-9]+[a-z]?_[a-z0-9_]+")),
      "query name broke the qN_snake_case convention")
  }
}
