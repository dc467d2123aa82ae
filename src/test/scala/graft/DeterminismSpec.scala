package graft

/** Every SparkEntry query must be run-to-run deterministic at a fixed scale
  * factor — the driver hash-compares results, so ANY nondeterminism
  * (unordered collect_list, ties broken by partition order, rand) is a
  * correctness failure waiting for a different partition count.
  */
class DeterminismSpec extends GraftSparkSpec {

  test("all queries produce identical results on a second run") {
    val flaky = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // an exception must FAIL the suite, not compare equal across runs
      def snap(): Seq[String] = fn(spark, sfDir).collect().map(_.toString).toSeq
      val a = snap()
      val b = snap()
      if (a == b) None else Some(name)
    }
    assert(flaky.isEmpty, s"nondeterministic queries: $flaky")
  }
}
