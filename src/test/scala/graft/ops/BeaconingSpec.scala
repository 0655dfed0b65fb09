package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Beaconing — integer median/MAD gap regularity. */
class BeaconingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(sec: Long) =
    new java.sql.Timestamp(sec * 1000L)

  private def detect(rows: Seq[(String, Long, Long)]) =
    Beaconing.detect(
      rows.map { case (k, s, i) => (k, ts(s), i) }.toDF("k", "ts", "i"),
      Seq("k"), "ts", "i")
      .select("k", "n_gaps", "median_gap_us", "mad_gap_us", "is_beacon")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)

  test("an exact-period key flags; an irregular key does not") {
    // beacon: events at 0,60,120,180 s -> gaps 60,60,60 s: med 60e6,
    // mad 0 -> 0 <= 60e6*200/1000 and n_gaps 3 >= 3 -> beacon.
    val beacon = Seq(("b", 0L, 0L), ("b", 60L, 1L), ("b", 120L, 2L),
      ("b", 180L, 3L))
    // noise: events at 0,10,1010,1040,6040 s -> gaps 10,1000,30,5000 s.
    // sorted 10,30,1000,5000, n=4, rank (500*4+999)//1000=2 -> med 30e6;
    // devs 20,970,0,4970 -> sorted 0,20,970,4970, rank 2 -> mad 20e6;
    // 20e6*1000 > 30e6*200 -> not a beacon.
    val noise = Seq(("n", 0L, 0L), ("n", 10L, 1L), ("n", 1010L, 2L),
      ("n", 1040L, 3L), ("n", 6040L, 4L))
    assert(detect(beacon ++ noise) == Seq(
      ("b", 3L, 60000000L, 0L, true),
      ("n", 4L, 30000000L, 20000000L, false)))
  }

  test("jitter within the permille bound still flags; beyond it does not") {
    // period 100 s with +-10 s jitter: arrivals 0,110,190,300,410 ->
    // gaps 110,80,110,110 s: med 110e6, devs 0,30,0,0 -> mad 0 -> beacon
    val within = Seq(("w", 0L, 0L), ("w", 110L, 1L), ("w", 190L, 2L),
      ("w", 300L, 3L), ("w", 410L, 4L))
    // same arrivals but spread devs: gaps 100,40,160,100 -> med 100e6
    // (sorted 40,100,100,160 rank 2), devs 0,60,60,0 -> mad 0? sorted
    // 0,0,60,60 rank 2 -> 0 -> flags. push harder: gaps 40,160,40,160
    // -> med 40e6? sorted 40,40,160,160 rank 2 -> 40e6; devs
    // 0,120,0,120 -> sorted rank 2 -> 0 ... MAD needs a MAJORITY of
    // spread: gaps 40,100,160,220,280 (arrivals 0,40,140,300,520,800):
    // med 160e6, devs 120,60,0,60,120 -> sorted 0,60,60,120,120 rank 3
    // -> mad 60e6; 60e6*1000 > 160e6*200 -> not a beacon.
    val beyond = Seq(("x", 0L, 0L), ("x", 40L, 1L), ("x", 140L, 2L),
      ("x", 300L, 3L), ("x", 520L, 4L), ("x", 800L, 5L))
    assert(detect(within ++ beyond) == Seq(
      ("w", 4L, 110000000L, 0L, true),
      ("x", 5L, 160000000L, 60000000L, false)))
  }

  test("a same-timestamp burst never flags (median gap 0) and a key " +
    "below minGaps reports stats with is_beacon=false") {
    val burst = Seq(("u", 5L, 0L), ("u", 5L, 1L), ("u", 5L, 2L),
      ("u", 5L, 3L), ("u", 5L, 4L))
    // regular but only 2 gaps < minGaps=3 -> reported, not flagged
    val short = Seq(("s", 0L, 0L), ("s", 60L, 1L), ("s", 120L, 2L))
    assert(detect(burst ++ short) == Seq(
      ("s", 2L, 60000000L, 0L, false),
      ("u", 4L, 0L, 0L, false)))
  }

  test("keys with < 2 timestamped events are absent; NULL timestamps " +
    "carry no arrival information") {
    val df = Seq(
      ("one", Some(ts(0L)), 0L),
      ("nul", None, 0L), ("nul", None, 1L),
      ("mix", Some(ts(0L)), 0L), ("mix", None, 1L),
      ("mix", Some(ts(60L)), 2L), ("mix", Some(ts(120L)), 3L),
      ("mix", Some(ts(180L)), 4L))
      .toDF("k", "ts", "i")
    val got = Beaconing.detect(df, Seq("k"), "ts", "i")
      .select("k", "n_gaps", "is_beacon")
      .as[(String, Long, Boolean)].collect().toSeq.sortBy(_._1)
    // "one" has no gap, "nul" no timestamps at all; "mix" ignores the
    // NULL row and beacons on 0/60/120/180
    assert(got == Seq(("mix", 3L, true)))
  }

  test("timestamp ties: the gap multiset is tie-order independent, so " +
    "stats are deterministic") {
    // two rows share t=60: sorted arrivals 0,60,60,120 -> gaps 60,0,60
    // regardless of which tied row the lag visits first. med = rank 2 of
    // [0,60e6,60e6] = 60e6; devs [60e6,0,0] -> mad 0 -> flags (a doubled
    // heartbeat packet does not unflag the beacon).
    val df = Seq(("t", 0L, 3L), ("t", 60L, 1L), ("t", 60L, 2L),
      ("t", 120L, 0L))
    val got = detect(df)
    assert(got == Seq(("t", 3L, 60000000L, 0L, true)))
  }

  test("one hash exchange: lag, both median passes, and the fold reuse " +
    "the key partitioning") {
    val df = Seq(("a", ts(0L), 0L)).toDF("k", "ts", "i")
    val plan = Beaconing.detect(df, Seq("k"), "ts", "i")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected ONE hash exchange, got $exchanges:\n" + plan.take(3000))
  }

  test("parameter validation") {
    val df = Seq(("a", ts(0L), 0L)).toDF("k", "ts", "i")
    intercept[IllegalArgumentException] {
      Beaconing.detect(df, Seq.empty, "ts", "i")
    }
    intercept[IllegalArgumentException] {
      Beaconing.detect(df, Seq("k"), "ts", "i", minGaps = 0)
    }
    intercept[IllegalArgumentException] {
      Beaconing.detect(df, Seq("k"), "ts", "i", madPermille = 1001)
    }
  }
}
