package graft

/** Contract smoke tests: every declared query runs at sf0.001 and returns
  * rows; every oracle key exists in queries. (Value-level parity vs DuckDB
  * is the driver's t2 check; tools/check.py replicates it locally.) */
class SparkEntrySpec extends SparkSuite {

  test("entry (flagship pipeline) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("every declared query has an oracle (no rows-only fallbacks)") {
    // the driver downgrades an oracle-less query to a weaker rows>0 check;
    // this inventory keeps the full-strength gate on EVERY query
    val weak = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(weak.isEmpty, s"queries without an oracle: $weak")
  }

  test("query names are globally unique across inventory modules") {
    // SparkEntry.queries is a Map ++ of six module maps — a name collision
    // would silently drop one module's query (and its oracle row) from
    // the declared inventory; fail loudly instead
    import graft.queries._
    val names = Seq(ReferenceParity.defs, Relational.defs, SqlSurface.defs,
      TpchShapes.defs, NorthStar.defs, Pipelines.defs).flatMap(_.keys)
    val dups = names.groupBy(identity).filter(_._2.sizeIs > 1).keys
    assert(dups.isEmpty, s"duplicate query names across modules: $dups")
    assert(names.size === SparkEntry.queries.size)
  }

  test("every declared query executes and returns rows at sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sf001).count()
      if (n == 0 && name != "q_anti_join") Some(name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }
}
