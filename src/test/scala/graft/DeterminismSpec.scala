package graft

/** Every SparkEntry query must be run-to-run deterministic at a fixed scale
  * factor — the driver hash-compares results, so ANY nondeterminism
  * (unordered collect_list, ties broken by partition order, rand) is a
  * correctness failure waiting for a different partition count.
  */
class DeterminismSpec extends GraftSparkSpec {

  test("all queries produce identical results across different partition counts") {
    // the second snapshot runs under a DIFFERENT shuffle partition count:
    // partition-order tie-breaks (unsorted collect_list, first() on dup
    // keys) survive a same-layout rerun but not a re-partitioned one —
    // and the driver's oracle compare runs at a different parallelism
    val flaky = try {
      SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        // an exception must FAIL the suite, not compare equal across runs
        def snap(): Seq[String] = fn(spark, sfDir).collect().map(_.toString).toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        val a = snap()
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val b = snap()
        if (a == b) None else Some(name)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert(flaky.isEmpty, s"nondeterministic queries: $flaky")
  }
}
