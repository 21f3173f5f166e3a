package graft

/** Driver-contract regressions: the exact surface the driver consumes.
  * Breakage here zeroes a whole round, so it gets its own spec. */
class SparkEntrySpec extends graft.olhovivo.SparkTestBase {

  test("entry: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are stable identifiers") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    q.foreach(n => assert(n.matches("q[0-9]{2,3}_[a-z0-9_]+"), s"bad name: $n"))
    // every entry is oracle-checked — the approx sketches expose their
    // error bound as a compared within_tolerance boolean (exact twin +
    // literal TRUE on the DuckDB side)
    assert((q -- o).isEmpty, s"unexpected oracle-less: ${q -- o}")
  }

  test("all queries analyze against sf0.001 (schema-level contract)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, s"$name produced no schema")
      // column names must be lowercase stable identifiers for the
      // driver's sorted-by-name hash compare
      df.columns.foreach(c =>
        assert(c.matches("[a-z][a-z0-9_]*"), s"$name has unstable column name '$c'"))
    }
  }
}
