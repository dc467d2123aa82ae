package graft

import org.apache.spark.sql.functions._

/** Round-18 operator hardening: explicit missing-hint semantics in the
  * fetch scheduler (ADVICE r17) and the round's new components.
  */
class Round18OpsSpec extends GraftSparkSpec {

  test("scheduler: missing lastmod/changefreq are data, not damage") {
    import spark.implicits._
    val frontier = Seq(
      // (host, loc, priority_ppm, lastmod, changefreq)
      ("h1", "http://h1/a", 500000L, "2026-02-01", "daily"),
      ("h1", "http://h1/b", 900000L, null, "daily"), // never fetched
      ("h1", "http://h1/c", 900000L, "2026-02-01", null), // no hint
      ("h1", "http://h1/d", 100000L, "2026-02-01", "hourly"), // unknown
      ("h1", "http://h1/e", 100000L, "not-a-date", "daily") // unparseable
    ).toDF("host", "loc", "priority_ppm", "lastmod", "changefreq")
    val delays = Seq(("h1", 2000L)).toDF("host", "delay_ms")
    val rows = graft.sources.Sitemap
      .fetchSchedule(frontier, delays, "2026-02-15")
      .orderBy("seq").collect()
    assert(rows.length === 5) // nothing raised, nothing dropped
    val bySeq = rows.map(r => r.getString(1))
    // never-fetched (null/unparseable lastmod) schedules FIRST via the
    // sentinel; /b before /e on the loc tiebreak (equal overdue+priority
    // would tie-break priority first: /b 900000 > /e 100000)
    assert(bySeq.take(2).toSeq === Seq("http://h1/b", "http://h1/e"))
    val overdue = rows.map(r => (r.getString(1), r.getLong(3))).toMap
    assert(overdue("http://h1/b") === graft.sources.Sitemap.NeverFetchedPpm)
    assert(overdue("http://h1/e") === graft.sources.Sitemap.NeverFetchedPpm)
    // 14 days on a daily period
    assert(overdue("http://h1/a") === 14000000L)
    // NULL and unknown changefreq both fall back to the weekly period
    assert(overdue("http://h1/c") === 2000000L)
    assert(overdue("http://h1/d") === 2000000L)
    // spacing still applies to every row (nothing unscheduled)
    assert(rows.map(r => r.getLong(5)).toSeq === Seq(0L, 2000L, 4000L,
      6000L, 8000L))
  }
}
