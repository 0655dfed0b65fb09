package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Funnel — greedy ordered-step conversion counts. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  private def counts(rows: Seq[(Long, Long, String)],
      steps: Seq[String]): Map[String, Long] = {
    val df = rows.map { case (u, sec, et) => (u, ts(sec), sec, et) }
      .toDF("user_id", "ts", "event_id", "event_type")
    Funnel.reachedCounts(df, steps)
      .as[(Int, String, Long)].collect().map(r => r._2 -> r._3).toMap
  }

  test("greedy order matters: steps must occur IN sequence, interleaved " +
    "noise ignored; counts are non-increasing") {
    val got = counts(Seq(
      // u1: full funnel with noise between steps
      (1L, 0L, "view"), (1L, 1L, "error"), (1L, 2L, "click"),
      (1L, 3L, "signup"), (1L, 4L, "purchase"),
      // u2: purchase BEFORE click: view -> (click after view) but no
      // purchase after the click
      (2L, 0L, "view"), (2L, 1L, "purchase"), (2L, 2L, "click"),
      // u3: starts at click — never enters the funnel
      (3L, 0L, "click"), (3L, 1L, "purchase")
    ), Seq("view", "click", "purchase"))
    assert(got == Map("view" -> 2L, "click" -> 2L, "purchase" -> 1L))
  }

  test("greedy uses the EARLIEST match: a later first-step event cannot " +
    "steal a better suffix") {
    // view@0, click@1, view@2, purchase@3: greedy matches view@0 ->
    // click@1 -> purchase@3 (full reach)
    val got = counts(Seq(
      (1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "view"),
      (1L, 3L, "purchase")
    ), Seq("view", "click", "purchase"))
    assert(got == Map("view" -> 1L, "click" -> 1L, "purchase" -> 1L))
  }

  test("equal timestamps break ties by event id — deterministic") {
    // both events at t=0; event ids order click(id 0) before view(id 1):
    // the funnel view->click must NOT complete (view sorts second)
    val df = Seq((1L, ts(0), 0L, "click"), (1L, ts(0), 1L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.reachedCounts(df, Seq("view", "click"))
      .as[(Int, String, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(got == Map("view" -> 1L, "click" -> 0L))
  }

  test("null event types are ignored; repeated steps rejected; empty " +
    "steps rejected") {
    val df = Seq((1L, ts(0), 0L, Option.empty[String]),
      (1L, ts(1), 1L, Some("view")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.reachedCounts(df, Seq("view"))
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 1L)))
    intercept[IllegalArgumentException](
      Funnel.reachedCounts(df, Seq("a", "a")))
    intercept[IllegalArgumentException](
      Funnel.reachedCounts(df, Nil))
  }

  test("NULL users are dropped — anonymous events must not fold into one " +
    "phantom user that completes the funnel (review find)") {
    val df = Seq((Option.empty[Long], ts(0), 0L, "view"),
      (Option.empty[Long], ts(1), 1L, "click"),
      (Some(1L), ts(2), 2L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.reachedCounts(df, Seq("view", "click"))
      .as[(Int, String, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(got == Map("view" -> 1L, "click" -> 0L))
  }

  test("empty input yields 0 per step, never NULL (review find)") {
    val df = Seq.empty[(Long, Timestamp, Long, String)]
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.reachedCounts(df, Seq("view", "click"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "view", 0L), (2, "click", 0L)))
  }

  test("step names with quotes/backslashes/newlines survive verbatim " +
    "(typed output construction, no SQL string assembly)") {
    val weird = Seq("a'b", "c\\d\ne")
    val df = Seq((1L, ts(0), 0L, "a'b"), (1L, ts(1), 1L, "c\\d\ne"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.reachedCounts(df, weird)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "a'b", 1L), (2, "c\\d\ne", 1L)))
  }

  test("non-step events are pruned BEFORE the shuffle (the filter sits " +
    "under the aggregate) without changing counts") {
    val df = Seq((1L, ts(0), 0L, "view"), (1L, ts(1), 1L, "noise"),
      (1L, ts(2), 2L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val q = Funnel.reachedCounts(df, Seq("view", "click"))
    val got = q.as[(Int, String, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got == Map("view" -> 1L, "click" -> 1L))
    // on a LocalRelation fixture the optimizer evaluates the filter at
    // planning (ConvertToLocalRelation), so gate it in the ANALYZED plan:
    // the step-set IN filter must sit below the collect_list aggregate
    val plan = q.queryExecution.analyzed.toString
    val aggAt = plan.indexOf("collect_list")
    val filterAt = plan.indexOf(" IN (")
    assert(aggAt >= 0 && filterAt > aggAt,
      s"expected the step-set IN filter under the aggregate:\n$plan")
  }

  test("one data shuffle: the per-user fold happens above a single " +
    "user-key exchange (plus the scalar reduce)") {
    val df = Seq((1L, ts(0), 0L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val plan = Funnel.reachedCounts(df, Seq("view", "click"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected ONE hash exchange:\n${plan.take(2000)}")
  }
}
