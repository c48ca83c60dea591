package graft

class EntrySpec extends SparkSpec {

  test("driver contract: entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** SURVEY §2's declared driver-key count. A key silently vanishing from
    * `queries` (a module dropped from the ++ chain, a duplicate key
    * collapsing the map) shrank CORRECTNESS_r09 without any test failing —
    * this pins the inventory so the suite fails before the driver does.
    * Bump this number together with SURVEY §2 when adding keys.
    */
  val declaredKeys = 240

  test(s"driver contract: SparkEntry.queries matches SURVEY §2 ($declaredKeys keys)") {
    assert(
      SparkEntry.queries.size == declaredKeys,
      s"SparkEntry.queries has ${SparkEntry.queries.size} keys but SURVEY §2 declares $declaredKeys — " +
        "either a module fell out of the ++ chain / two modules collide on a key name (silent map collapse), " +
        "or a key was added without bumping declaredKeys + SURVEY §2."
    )
    // a colliding key would collapse silently in the ++ chain; count the
    // per-module totals too so the failure names the overlap
    val perModule = Seq(
      graft.operators.Relational.queries, graft.operators.History.queries,
      graft.operators.Changesets.queries, graft.operators.Replication.queries,
      graft.operators.Geometry.queries, graft.operators.Contributions.queries,
      graft.operators.Dedup.queries, graft.operators.TextOps.queries,
      graft.operators.Ann.queries, graft.operators.Multimodal.queries,
      graft.operators.Skew.queries, graft.operators.Temporal.queries,
      graft.operators.Sampling.queries, graft.operators.ChangesetCatchup.queries,
      graft.operators.Events.queries, graft.operators.Sketches.queries,
      graft.operators.Graph.queries)
    val flat = perModule.flatMap(_.keys)
    val dupes = flat.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate driver keys across modules: ${dupes.mkString(", ")}")
    assert(flat.size == SparkEntry.queries.size)
  }

  test("driver contract: every oracle key has a query; all queries run at sf0.001") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    // ...and the converse: every query key carries an oracle. A key whose
    // oracle silently vanishes (dropped map entry, module fell out of the
    // oracles ++ chain) would downgrade to the driver's weaker rows-only
    // check without any test noticing — the same silent-shrink failure
    // mode as the r9 key drop, on the oracle side.
    val missing = qs.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"driver keys without a DuckDB oracle: ${missing.toSeq.sorted.mkString(", ")}")
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
