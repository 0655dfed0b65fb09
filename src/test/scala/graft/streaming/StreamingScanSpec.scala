package graft.streaming

import graft.SparkTestBase
import graft.intel.IntelDb
import graft.model.IntelEntry
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class StreamingScanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Every streaming test is wall-clock bounded: a query that fails to
    * drain within the timeout fails the test instead of hanging the gate. */
  private def awaitOrFail(q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long = 180000L): Unit = {
    val done = q.awaitTermination(timeoutMs)
    if (!done) {
      q.stop()
      fail(s"streaming query did not terminate within ${timeoutMs}ms")
    }
  }

  private def turnJson(conv: String, idx: Int, text: String): String =
    s"""{"conv_id":"$conv","turn_idx":$idx,"role":"user","text":"$text","tool":"","ts":"2024-01-01T00:00:0$idx.000Z"}"""

  test("S4 follow-mode analog: micro-batches append to the matched sink") {
    val inDir = Files.createTempDirectory("stream-in").toString
    val outDir = Files.createTempDirectory("stream-out").toString
    val dbs = () => Seq(IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "f", 90),
      IntelEntry("evil.example.com", "high", "phishing", "f", 95))))

    Files.writeString(java.nio.file.Paths.get(inDir, "batch1.json"),
      turnJson("c1", 0, "hit 192.0.2.55 here") + "\n" +
        turnJson("c1", 1, "all clean") + "\n")

    val q1 = StreamingScan.start(spark, inDir, outDir, dbs)
    awaitOrFail(q1)

    val m1 = spark.read.parquet(s"$outDir/matched_stream")
    assert(m1.count() == 1)
    assert(m1.select("value").head().getString(0) == "192.0.2.55")

    // append a second file -> only the new data is processed (checkpoint)
    Files.writeString(java.nio.file.Paths.get(inDir, "batch2.json"),
      turnJson("c2", 0, "see evil.example.com now") + "\n")
    val q2 = StreamingScan.start(spark, inDir, outDir, dbs)
    awaitOrFail(q2)

    val m2 = spark.read.parquet(s"$outDir/matched_stream")
    assert(m2.count() == 2)
    assert(m2.where("indicator_type = 'domain'").count() == 1)
  }

  test("routed streaming fan-out: matched+clean from one pass per batch") {
    val inDir = Files.createTempDirectory("stream-r-in").toString
    val outDir = Files.createTempDirectory("stream-r-out").toString
    val dbs = () => Seq(IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "f", 90))))
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      turnJson("c1", 0, "hit 192.0.2.55 here") + "\n" +
        turnJson("c1", 1, "all clean") + "\n" +
        turnJson("c2", 0, "also clean") + "\n")
    val q = StreamingScan.startRouted(spark, inDir, outDir, dbs)
    awaitOrFail(q)
    val routed = spark.read.parquet(s"$outDir/routed_stream")
    assert(routed.where("sink = 'matched'").count() == 1)
    assert(routed.where("sink = 'clean'").count() == 2)
    // clean rows keep the turn text; matched rows carry the value
    assert(routed.where("sink = 'clean' AND text IS NULL").count() == 0)
    assert(routed.where("sink = 'matched'")
      .select("value").head().getString(0) == "192.0.2.55")
    // second batch appends incrementally (checkpointed)
    Files.writeString(java.nio.file.Paths.get(inDir, "b2.json"),
      turnJson("c3", 0, "new 192.0.2.77 match") + "\n")
    val q2 = StreamingScan.startRouted(spark, inDir, outDir, dbs)
    awaitOrFail(q2)
    val routed2 = spark.read.parquet(s"$outDir/routed_stream")
    assert(routed2.where("sink = 'matched'").count() == 2)
    assert(routed2.where("sink = 'clean'").count() == 2)
  }

  test("true follow mode: ProcessingTime trigger picks up files appended " +
    "mid-stream; graceful stop") {
    val inDir = Files.createTempDirectory("stream-f-in").toString
    val outDir = Files.createTempDirectory("stream-f-out").toString
    val dbs = () => Seq(IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "f", 90))))
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      turnJson("c1", 0, "hit 192.0.2.55 here") + "\n")
    val q = StreamingScan.startRouted(spark, inDir, outDir, dbs, buckets = 4,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("500 milliseconds"))
    try {
      // bounded poll until the continuously-running query lands the rows
      def matchedCount(): Long =
        try spark.read.parquet(s"$outDir/routed_stream")
          .where("sink = 'matched'").count()
        catch { case _: Throwable => -1L } // sink dir not created yet
      def awaitCount(n: Long): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (matchedCount() < n) {
          if (System.nanoTime() > deadline)
            fail(s"follow mode did not reach $n matched rows in time " +
              s"(at ${matchedCount()})")
          Thread.sleep(250)
        }
      }
      awaitCount(1)
      // the tail -f moment: append new files while the query is RUNNING
      Files.writeString(java.nio.file.Paths.get(inDir, "b2.json"),
        turnJson("c2", 0, "and 192.0.2.77 too") + "\n" +
          turnJson("c2", 1, "clean line") + "\n")
      awaitCount(2)
    } finally {
      // graceful shutdown (the reference's Ctrl-C flag, follow.rs:20-60)
      q.stop()
    }
    assert(q.awaitTermination(60000), "query did not stop gracefully")
    val routed = spark.read.parquet(s"$outDir/routed_stream")
    assert(routed.where("sink = 'matched'").count() == 2)
    assert(routed.where("sink = 'clean'").count() == 1)
  }

  test("event-time timeout finalizes idle conversations against the " +
    "watermark") {
    val inDir = Files.createTempDirectory("stream-et-in").toString
    val outDir = Files.createTempDirectory("stream-et-out").toString
    def turnAt(conv: String, idx: Int, ts: String, text: String): String =
      s"""{"conv_id":"$conv","turn_idx":$idx,"role":"user","text":"$text","tool":"","ts":"$ts"}"""
    def drain(): Unit = awaitOrFail(
      StreamingScan.conversationStateEventTime(spark, inDir, outDir,
        watermarkDelay = "5 seconds", idleGapMs = 10000L))
    def finals(): Map[String, Long] =
      try spark.read.parquet(s"$outDir/conv_state_final")
        .collect().map(r => r.getAs[String]("conv_id") ->
          r.getAs[Long]("turns")).toMap
      // ONLY the sink-not-created-yet case may read as empty: a blanket
      // Throwable catch made "nothing finalized yet" vacuously satisfiable
      // by schema drift or corrupt output (round-5 test-review find)
      catch { case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => Map.empty }

    // wave 1: two conversations near T0 — nothing can time out yet
    Files.writeString(java.nio.file.Paths.get(inDir, "w1.json"),
      turnAt("c1", 0, "2024-01-01T00:00:01.000Z", "hit 192.0.2.5 x") + "\n" +
        turnAt("c1", 1, "2024-01-01T00:00:03.000Z", "clean") + "\n" +
        turnAt("c2", 0, "2024-01-01T00:00:02.000Z", "clean too") + "\n")
    drain()
    assert(finals().isEmpty, "nothing should finalize in the first drain")

    // wave 2: a far-future turn advances the watermark past c1/c2 + gap
    // (the timeout check uses the watermark as of the PREVIOUS batch, so
    // the advance lands in this drain and the timeouts fire in the next)
    Files.writeString(java.nio.file.Paths.get(inDir, "w2.json"),
      turnAt("c9", 0, "2024-01-01T00:10:00.000Z", "later era") + "\n")
    drain()
    // wave 3: any batch whose STARTING watermark is past the idle gap
    // delivers the pending timeouts
    Files.writeString(java.nio.file.Paths.get(inDir, "w3.json"),
      turnAt("c9", 1, "2024-01-01T00:10:01.000Z", "tick") + "\n")
    drain()
    val f = finals()
    assert(f.get("c1").contains(2L), s"c1 should be finalized with 2 turns: $f")
    assert(f.get("c2").contains(1L), s"c2 should be finalized with 1 turn: $f")
    assert(!f.contains("c9"), s"c9 is still active: $f")
  }

  test("in-batch idle gaps split sessions (round-5 find: sessionization " +
    "must not depend on micro-batch boundaries)") {
    val inDir = Files.createTempDirectory("stream-gap-in").toString
    val outDir = Files.createTempDirectory("stream-gap-out").toString
    def turnAt(conv: String, idx: Int, ts: String, text: String): String =
      s"""{"conv_id":"$conv","turn_idx":$idx,"role":"user","text":"$text","tool":"","ts":"$ts"}"""
    def drain(): Unit = awaitOrFail(
      StreamingScan.conversationStateEventTime(spark, inDir, outDir,
        watermarkDelay = "5 seconds", idleGapMs = 10000L))
    def sessions(): Seq[(String, Long)] =
      try spark.read.parquet(s"$outDir/conv_state_final")
        .collect().map(r => r.getAs[String]("conv_id") ->
          r.getAs[Long]("turns")).toSeq.sorted
      catch { case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => Seq.empty }

    // ONE drain delivers turns of the same conversation separated by five
    // minutes (idleGap = 10 s): a continuous deployment would emit two
    // sessions, so the AvailableNow drain must too — the first session
    // finalizes IN this batch
    Files.writeString(java.nio.file.Paths.get(inDir, "g1.json"),
      turnAt("c1", 0, "2024-01-01T00:00:01.000Z", "one") + "\n" +
        turnAt("c1", 1, "2024-01-01T00:00:02.000Z", "two") + "\n" +
        turnAt("c1", 2, "2024-01-01T00:05:00.000Z", "much later") + "\n")
    drain()
    assert(sessions() == Seq("c1" -> 2L),
      s"gap-split first session must finalize in-batch: ${sessions()}")

    // watermark advance finalizes the still-open second session
    Files.writeString(java.nio.file.Paths.get(inDir, "g2.json"),
      turnAt("c9", 0, "2024-01-01T00:20:00.000Z", "later era") + "\n")
    drain()
    Files.writeString(java.nio.file.Paths.get(inDir, "g3.json"),
      turnAt("c9", 1, "2024-01-01T00:20:01.000Z", "tick") + "\n")
    drain()
    // EXACT equality (round-5 test-review find: counting only the two
    // expected rows let spurious extra finalized sessions pass): c9's gap
    // is 1 s < idleGap and nothing advances the watermark past it, so the
    // full finalized set is exactly the two c1 sessions
    assert(sessions() == Seq("c1" -> 1L, "c1" -> 2L),
      s"expected exactly two finalized c1 sessions: ${sessions()}")
  }

  test("streaming exact dedup: first fingerprint wins across micro-batches") {
    val inDir = Files.createTempDirectory("stream-d-in").toString
    val outDir = Files.createTempDirectory("stream-d-out").toString
    def doc(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text"}"""
    // batch 1: in-batch dup (1 vs 2 — formatting variant, same
    // fingerprint) + two uniques
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      doc(2, "The quick  brown fox") + "\n" + // variant of doc 1, larger id
        doc(1, "the quick brown fox") + "\n" +
        doc(3, "something else entirely") + "\n")
    awaitOrFail(StreamingDedup.start(spark, inDir, outDir))
    def ids(): Seq[Long] = spark.read.parquet(s"$outDir/deduped")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids() == Seq(1L, 3L)) // smallest id survives the in-batch dup
    // batch 2: repeats batch-1 text (dropped via state) + one new doc
    Files.writeString(java.nio.file.Paths.get(inDir, "b2.json"),
      doc(9, "THE QUICK BROWN FOX") + "\n" + // dup across batches
        doc(10, "genuinely new content") + "\n")
    awaitOrFail(StreamingDedup.start(spark, inDir, outDir))
    assert(ids() == Seq(1L, 3L, 10L), s"cross-batch dup not dropped: ${ids()}")
  }

  test("streaming dedup TTL: duplicate dropped inside the window, " +
    "fingerprint re-admitted only after TTL passes the watermark") {
    val inDir = Files.createTempDirectory("stream-dttl-in").toString
    val outDir = Files.createTempDirectory("stream-dttl-out").toString
    def doc(id: Long, text: String, ts: String): String =
      s"""{"doc_id":$id,"text":"$text","ts":"$ts"}"""
    def drain(): Unit = awaitOrFail(
      StreamingDedup.startTtl(spark, inDir, outDir, ttlMs = 60000L,
        watermarkDelay = "10 seconds"))
    def ids(): Seq[Long] = spark.read.parquet(s"$outDir/deduped")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // drain 1: fingerprint X admitted at 00:00:00 (TTL expires 00:01:00)
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      doc(1, "the quick brown fox", "2024-01-01T00:00:00.000Z") + "\n")
    drain()
    assert(ids() == Seq(1L))
    // drain 2: X again 30s later — inside the TTL window, dropped
    Files.writeString(java.nio.file.Paths.get(inDir, "b2.json"),
      doc(2, "THE QUICK  BROWN FOX", "2024-01-01T00:00:30.000Z") + "\n")
    drain()
    assert(ids() == Seq(1L), s"duplicate inside TTL not dropped: ${ids()}")
    // drain 3: unrelated doc far ahead advances the watermark past
    // 00:01:00 (timeout checks use the PREVIOUS batch's watermark, so the
    // expiry lands in the NEXT drain)
    Files.writeString(java.nio.file.Paths.get(inDir, "b3.json"),
      doc(5, "watermark mover one", "2024-01-01T00:05:00.000Z") + "\n")
    drain()
    // drain 4: another mover — X had no data this batch and its timeout is
    // behind the watermark now, so its state is removed here
    Files.writeString(java.nio.file.Paths.get(inDir, "b4.json"),
      doc(6, "watermark mover two", "2024-01-01T00:05:10.000Z") + "\n")
    drain()
    assert(ids() == Seq(1L, 5L, 6L))
    // drain 5: X re-appears AFTER expiry — re-admitted
    Files.writeString(java.nio.file.Paths.get(inDir, "b5.json"),
      doc(9, "the quick brown fox", "2024-01-01T00:05:20.000Z") + "\n")
    drain()
    assert(ids() == Seq(1L, 5L, 6L, 9L),
      s"fingerprint not re-admitted after TTL: ${ids()}")
  }

  test("streaming near-dup: LSH bucket claims drop near-duplicates " +
    "within and across micro-batches") {
    val inDir = Files.createTempDirectory("stream-nd-in").toString
    val outDir = Files.createTempDirectory("stream-nd-out").toString
    def doc(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text"}"""
    val textA = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val textB = "completely different content about winter mountains here"
    val textC = "a third corpus entry that resembles neither of the others"
    def drain(): Unit =
      awaitOrFail(StreamingDedup.startNearDup(spark, inDir, outDir))
    def ids(): Seq[Long] = spark.read.parquet(s"$outDir/deduped")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // batch 1: docs 5 and 2 identical (full band collision — every bucket
    // shared): smallest id 2 wins; doc 7 distinct
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      doc(5, textA) + "\n" + doc(2, textA) + "\n" + doc(7, textB) + "\n")
    drain()
    assert(ids() == Seq(2L, 7L), s"in-batch near-dup not collapsed: ${ids()}")
    // batch 2: doc 9 repeats A (cross-batch: all its buckets are claimed),
    // doc 12 repeats B, doc 11 is new
    Files.writeString(java.nio.file.Paths.get(inDir, "b2.json"),
      doc(9, textA) + "\n" + doc(11, textC) + "\n" + doc(12, textB) + "\n")
    drain()
    assert(ids() == Seq(2L, 7L, 11L),
      s"cross-batch near-dup not dropped: ${ids()}")
  }

  test("streaming near-dup: docs too short to shingle are KEPT (solo " +
    "bucket), and an exact doc_id replay of one is dropped") {
    val inDir = Files.createTempDirectory("stream-ndshort-in").toString
    val outDir = Files.createTempDirectory("stream-ndshort-out").toString
    def doc(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text"}"""
    def drain(): Unit =
      awaitOrFail(StreamingDedup.startNearDup(spark, inDir, outDir))
    def ids(): Seq[Long] = spark.read.parquet(s"$outDir/deduped")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // docs 1 and 3 have < k=5 tokens (no word-5-gram shingles): both must
    // appear in the output via their per-doc solo buckets — before the
    // solo row they were silently absent (neither kept nor marked dup)
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      doc(1, "hello world") + "\n" + doc(3, "tiny doc") + "\n" +
        doc(4, "a full length document with plenty of words to shingle") + "\n")
    drain()
    assert(ids() == Seq(1L, 3L, 4L), s"short docs lost: ${ids()}")
    // replaying doc_id 1 finds its solo bucket claimed -> dropped
    Files.writeString(java.nio.file.Paths.get(inDir, "b2.json"),
      doc(1, "hello world") + "\n" + doc(8, "brand new") + "\n")
    drain()
    assert(ids() == Seq(1L, 3L, 4L, 8L),
      s"solo-bucket replay/keep wrong: ${ids()}")
  }

  test("streaming near-dup TTL: bucket claims drop near-dups inside the " +
    "window, buckets re-claimable after TTL passes the watermark") {
    val inDir = Files.createTempDirectory("stream-ndttl-in").toString
    val outDir = Files.createTempDirectory("stream-ndttl-out").toString
    def doc(id: Long, text: String, ts: String): String =
      s"""{"doc_id":$id,"text":"$text","ts":"$ts"}"""
    val textA = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val mover1 = "completely different content about winter mountains here"
    val mover2 = "a third corpus entry that resembles neither of the others"
    def drain(): Unit = awaitOrFail(
      StreamingDedup.startNearDupTtl(spark, inDir, outDir, ttlMs = 60000L,
        watermarkDelay = "10 seconds"))
    def ids(): Seq[Long] = spark.read.parquet(s"$outDir/deduped")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // drain 1: identical docs 5 and 2 (full band collision) at 00:00:00 —
    // smallest id 2 claims every bucket (TTL expires 00:01:00)
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      doc(5, textA, "2024-01-01T00:00:00.000Z") + "\n" +
        doc(2, textA, "2024-01-01T00:00:00.000Z") + "\n")
    drain()
    assert(ids() == Seq(2L), s"in-batch near-dup not collapsed: ${ids()}")
    // drain 2: doc 9 repeats textA 30s later — inside the TTL, dropped
    Files.writeString(java.nio.file.Paths.get(inDir, "b2.json"),
      doc(9, textA, "2024-01-01T00:00:30.000Z") + "\n")
    drain()
    assert(ids() == Seq(2L), s"near-dup inside TTL not dropped: ${ids()}")
    // drains 3-4: dissimilar movers advance the watermark past 00:01:00
    // (timeouts check the PREVIOUS batch's watermark)
    Files.writeString(java.nio.file.Paths.get(inDir, "b3.json"),
      doc(11, mover1, "2024-01-01T00:05:00.000Z") + "\n")
    drain()
    Files.writeString(java.nio.file.Paths.get(inDir, "b4.json"),
      doc(12, mover2, "2024-01-01T00:05:10.000Z") + "\n")
    drain()
    assert(ids() == Seq(2L, 11L, 12L))
    // drain 5: textA again AFTER its buckets expired — re-admitted
    Files.writeString(java.nio.file.Paths.get(inDir, "b5.json"),
      doc(19, textA, "2024-01-01T00:05:20.000Z") + "\n")
    drain()
    assert(ids() == Seq(2L, 11L, 12L, 19L),
      s"bucket claims not released after TTL: ${ids()}")
  }

  test("watermarked windowed match counts (streaming A10 analog)") {
    val inDir = Files.createTempDirectory("stream-w-in").toString
    val outDir = Files.createTempDirectory("stream-w-out").toString
    val dbs = Seq(IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "f", 90))))
    // two matches in minute 0, one in minute 1
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      turnJson("c1", 0, "x 192.0.2.4 y") + "\n" +
        turnJson("c1", 1, "x 192.0.2.5 y") + "\n" +
        s"""{"conv_id":"c2","turn_idx":0,"role":"user","text":"x 192.0.2.6 y","tool":"","ts":"2024-01-01T00:01:30.000Z"}""" + "\n" +
        // a far-future row advances the watermark past both windows
        s"""{"conv_id":"c9","turn_idx":0,"role":"user","text":"x 192.0.2.7 y","tool":"","ts":"2024-01-01T01:00:00.000Z"}""" + "\n")
    val q = StreamingScan.windowedMatchCounts(spark, inDir, outDir, dbs)
    awaitOrFail(q)
    val counts = spark.read.parquet(s"$outDir/windowed_counts")
      .orderBy("window_start")
      .select("indicator_type", "matches")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(counts == Seq(("ipv4", 2L), ("ipv4", 1L)))
  }

  test("per-conversation state via mapGroupsWithState") {
    val inDir = Files.createTempDirectory("stream-s-in").toString
    val outDir = Files.createTempDirectory("stream-s-out").toString
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      turnJson("c1", 0, "hit 192.0.2.55 here") + "\n" +
        turnJson("c1", 1, "all clean here") + "\n" +
        turnJson("c2", 0, "nothing to see") + "\n")
    val q = StreamingScan.conversationState(spark, inDir, outDir)
    awaitOrFail(q)
    val st = spark.read.parquet(s"$outDir/conv_state")
      .collect().map(r => r.getAs[String]("conv_id") ->
        (r.getAs[Long]("turns"), r.getAs[Long]("turnsWithCandidates"))).toMap
    assert(st("c1") == ((2L, 1L)))
    assert(st("c2") == ((1L, 0L)))
    // incremental batch updates existing state
    Files.writeString(java.nio.file.Paths.get(inDir, "b2.json"),
      turnJson("c1", 2, "another 192.0.2.56 seen") + "\n")
    val q2 = StreamingScan.conversationState(spark, inDir, outDir)
    awaitOrFail(q2)
    // the sink is an update LOG (one row per state update per batch), so
    // the latest state per conversation is the max-turns row. Assert the
    // FULL latest-state map, not just the updated head row: loss of c2's
    // state across the restart must fail (round-5 test-review find; the
    // first exact-map form was flaky — toMap collapsed the legitimate
    // per-batch update rows in undefined order)
    val st2 = spark.read.parquet(s"$outDir/conv_state")
      .collect().map(r => r.getAs[String]("conv_id") ->
        (r.getAs[Long]("turns"), r.getAs[Long]("turnsWithCandidates")))
    val latest = st2.groupBy(_._1).view
      .mapValues(_.map(_._2).maxBy(_._1)).toMap
    assert(latest == Map("c1" -> ((3L, 2L)), "c2" -> ((1L, 0L))),
      s"latest state across restart: $latest (rows: ${st2.toSeq})")
  }

  test("poison-pill immunity: malformed JSON lines and null fields do not " +
      "kill the queries (round-5 hardening)") {
    // StreamingDedup: a garbage line (all-null PERMISSIVE row) + a valid
    // line missing doc_id + a null-text doc, mixed with real docs — the
    // query must drain and keep the real docs (and the null-text doc,
    // which fingerprints under the null key)
    val dIn = Files.createTempDirectory("stream-pp-d-in").toString
    val dOut = Files.createTempDirectory("stream-pp-d-out").toString
    Files.writeString(java.nio.file.Paths.get(dIn, "b1.json"),
      """not json at all {{{""" + "\n" +
        """{"text":"no doc id here"}""" + "\n" +
        """{"doc_id":7,"text":null}""" + "\n" +
        """{"doc_id":1,"text":"a real document"}""" + "\n" +
        """{"doc_id":2,"text":"another real document"}""" + "\n")
    awaitOrFail(StreamingDedup.start(spark, dIn, dOut))
    val kept = spark.read.parquet(s"$dOut/deduped")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 7L), kept.toString)

    // near-dup variant: the null-text doc must be KEPT via its solo
    // bucket, not silently absent
    val nIn = Files.createTempDirectory("stream-pp-n-in").toString
    val nOut = Files.createTempDirectory("stream-pp-n-out").toString
    Files.writeString(java.nio.file.Paths.get(nIn, "b1.json"),
      """garbage {{{""" + "\n" +
        """{"doc_id":5,"text":null}""" + "\n" +
        """{"doc_id":6,"text":"one two three four five six seven"}""" + "\n")
    awaitOrFail(StreamingDedup.startNearDup(spark, nIn, nOut))
    val keptN = spark.read.parquet(s"$nOut/deduped")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptN == Seq(5L, 6L), keptN.toString)

    // conversationState: null ts and null text rows must not kill the
    // query; the valid turn still counts
    val cIn = Files.createTempDirectory("stream-pp-c-in").toString
    val cOut = Files.createTempDirectory("stream-pp-c-out").toString
    Files.writeString(java.nio.file.Paths.get(cIn, "b1.json"),
      """{"conv_id":"x","turn_idx":0,"role":"user","text":"no ts"}""" +
        "\n" +
        """{"conv_id":"x","turn_idx":1,"role":"user","text":null,""" +
        """"ts":"2024-01-01T00:00:01.000Z"}""" + "\n" +
        turnJson("x", 2, "hit 192.0.2.55") + "\n")
    awaitOrFail(StreamingScan.conversationState(spark, cIn, cOut))
    val st = spark.read.parquet(s"$cOut/conv_state").collect()
      .map(r => (r.getAs[Long]("turns"),
        r.getAs[Long]("turnsWithCandidates")))
    // null-ts turn filtered; null-text turn counted with no candidates
    assert(st.toSeq == Seq((2L, 1L)), st.mkString(","))
  }
}
