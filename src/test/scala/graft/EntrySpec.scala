package graft

/** Every registered query must at least ANALYZE and physically plan
  * against the fixture tables. `Verify` logs per-query failures to
  * stderr and carries on, and the driver's correctness compare only
  * scores queries that produced a dump — so a query whose
  * construction throws (the r12 find: a fixture-schema drift turned
  * `ts.cast("long")` into an analysis error in the as-of join and
  * sessionization) can vanish from the gate without any test going
  * red. This spec closes that class: resolution + optimization +
  * physical planning for all of `SparkEntry.queries`, no execution. */
class EntrySpec extends SparkSpec {

  test("every registered query analyzes and plans at sf0.001 within budget") {
    // Per-query time budget: a plan-TIME hang (the r15 find: two chained
    // FixLog2 ladders sent CollapseProject combinatorial, so `sbt test`
    // and the driver's Verify both stalled forever instead of going red)
    // must be a NAMED red test, never an eternal wait. 60 s is ~100x the
    // slowest legitimate planning time observed (q_entropy_mix ~0.6 s).
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val res = new java.util.concurrent.atomic.AtomicReference[Option[String]](
          Some(s"$name: did not finish planning within 60s"))
        val t = new Thread(() => {
          try {
            fn(spark, sf0001).queryExecution.executedPlan
            res.set(None)
          } catch { case e: Throwable =>
            res.set(Some(
              s"$name: ${Option(e.getMessage).getOrElse(e.toString).take(300)}"))
          }
        }, s"entry-plan-$name")
        t.setDaemon(true)
        t.start()
        t.join(60000L)
        res.get()
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail to plan:\n${failures.mkString("\n")}")
  }

  test("the query registry never shrinks (bump the floor when adding queries)") {
    // EntrySpec above catches queries that fail to *construct*; this
    // catches accidental deregistration — together they close the r11
    // silent-shrink class (92 -> 90 with no red test).
    assert(SparkEntry.queries.size >= 197,
      s"query registry shrank: ${SparkEntry.queries.size} < 197")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "oracleSql keys must all be registered queries")
  }

  test("the flagship entry returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }
}
