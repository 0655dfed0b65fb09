package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the session-5 telemetry/log operators (sessionize is
  * covered by the flagship path; this drives the NEW family) far beyond
  * the sf fixtures: a spark.range-generated event stream of `n` rows —
  * ~n/1000 users, 5 event types, a month of synthetic timestamps, and a
  * structured log line per event (1-in-50 garbage for the dead-letter
  * path). Prints wall-clock + output rows + events/s per op; does not
  * touch bench artifacts.
  *
  * Usage: runMain graft.TelemetryScaleProbe [nEvents] [op-substring]
  */
object TelemetryScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val only = if (args.length > 1) args(1) else ""
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val users = math.max(1L, n / 1000)
    val types = array(lit("view"), lit("click"), lit("purchase"),
      lit("signup"), lit("error"))
    // xxhash64 scatter, not multiplicative hashing: a 64-bit multiply
    // overflows and Spark 4's ANSI mode makes that an ArithmeticException
    val events = spark.range(n).toDF("event_id")
      .withColumn("user_id",
        pmod(xxhash64(lit(1), col("event_id")), lit(users)))
      // ~a month of microsecond timestamps, deterministic scatter
      .withColumn("ts", timestamp_micros(lit(1704067200000000L) +
        pmod(xxhash64(lit(2), col("event_id")), lit(2592000000000L))))
      .withColumn("event_type", element_at(types,
        (pmod(xxhash64(lit(3), col("event_id")), lit(5)) + 1).cast("int")))
      .withColumn("value",
        (pmod(col("event_id") * 31L, lit(10000)) / lit(100.0)))
      .localCheckpoint() // time the OPERATOR, not the generator

    def probe(name: String)(f: => Long): Unit =
      if (only.isEmpty || name.contains(only)) {
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"TELEMPROBE $name n=$n rows=$rows $sec%.1f s " +
          f"${n / sec}%.0f events/s")
      }

    probe("sliding_rates") {
      graft.ops.Windows.slidingAgg(events, 3600, 900, "ts",
        Seq("event_type"), Seq(count(lit(1)).as("cnt"))).count()
    }
    probe("anomaly_mad") {
      graft.ops.Anomaly.madOutliers(events, Seq("event_type"), "value")
        .count()
    }
    probe("funnel") {
      graft.ops.Funnel.reachedCounts(events,
        Seq("view", "click", "purchase")).count()
    }
    probe("retention") {
      graft.ops.Retention.matrix(events).count()
    }
    probe("asof_join") {
      val build = events.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"),
          (col("event_id") % 5).as("tier"))
      graft.ops.AsofJoin.asofJoin(
        events.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        build, keys = Seq("user_id"), carry = Seq("tier")).count()
    }
    probe("interval_join") {
      val intervals = events.where(col("event_type") === "purchase")
        .select(col("event_id").as("interval_id"), col("user_id"),
          col("ts").as("start"),
          (col("ts") + expr("interval 2 hours")).as("end"))
      graft.ops.IntervalJoin.pointInInterval(
        events.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        intervals, keys = Seq("user_id")).count()
    }
    probe("transitions") {
      graft.ops.Transitions.bigramCounts(events).count()
    }
    probe("growth") {
      graft.ops.Growth.newVsReturning(events).count()
    }
    probe("distinct_rollup") {
      graft.ops.Rollups.distinctRollup(events,
        keys = Seq(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("epoch_day")),
        entityCol = col("user_id"),
        innerAggs = Seq(
          sum(round(col("value") * 100, 0).cast("bigint")).as("cents")),
        outerAggs = Seq(sum("cents").as("cents"),
          max("cents").as("max_user_cents"))).count()
    }
    probe("topk_per_group") {
      graft.ops.Rollups.topKPerGroup(events, Seq("event_type"), "user_id",
        sum(round(col("value") * 100, 0).cast("bigint")), k = 10).count()
    }
    probe("grok_parse") {
      val lines = events.select(concat(
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit(" "),
        when(col("event_id") % 50 === 0, "GARBAGE").otherwise("INFO"),
        lit(" user="), col("user_id"),
        lit(" type="), col("event_type"),
        lit(" msg=\"evt-"), col("event_id"), lit("\"")).as("line"))
      val pat = "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} " +
        "user=%{INT:user} type=%{WORD:type} msg=%{QUOTEDSTRING:msg}"
      graft.ops.LogParse.parse(lines, "line", pat)
        .groupBy("level", "_grok_matched").count().count()
    }
    probe("fuzzy_join") {
      // ~n/10 distinct observed domains (typo families over a 1k-brand
      // namespace) against a 1k-entry watchlist
      val probes = events.select(concat(
        when(col("event_id") % 3 === 0, lit("brand"))
          .when(col("event_id") % 3 === 1, lit("brend"))
          .otherwise(lit("brnd")),
        pmod(xxhash64(lit(4), col("event_id")), lit(1000)).cast("string"),
        lit(".com")).as("domain"))
      val watch = spark.range(1000).select(
        concat(lit("brand"), col("id").cast("string"), lit(".com"))
          .as("domain"))
      graft.ops.FuzzyJoin.editDistance1Join(probes, "domain",
        watch, "domain").count()
    }
    probe("cooccurrence") {
      graft.ops.Cooccurrence.pairCounts(events,
        entityCol = col("user_id") * 100000 +
          expr("unix_micros(ts) div 86400000000"),
        itemCol = col("event_type")).count()
    }
    probe("log_templates") {
      val msgs = events.select(concat(
        when(col("event_id") % 3 === 0, lit("api"))
          .when(col("event_id") % 3 === 1, lit("svc"))
          .otherwise(lit("db")),
        when(col("event_id") % 2 === 0,
          concat(lit(" request user="), col("user_id").cast("string"),
            lit(" type="), col("event_type"), lit(" status=200")))
          .otherwise(lit(" heartbeat ok"))).as("msg"))
      graft.ops.LogTemplates.mine(msgs, col("msg")).count()
    }
    probe("beaconing") {
      graft.ops.Beaconing.detect(events, Seq("user_id"), "ts",
        "event_id").count()
    }
    probe("indicator_timeline") {
      // matched-shaped stream: ~1 hit per 3 events, value namespace of
      // ~2k indicators, conv = user (so n_convs aggregates are real)
      val matched = events.where(col("event_id") % 3 === 0).select(
        concat(lit("conv-"), col("user_id")).as("conv_id"),
        col("event_id").cast("int").as("turn_idx"),
        lit("threats").as("database_id"),
        lit("domain").as("indicator_type"),
        concat(lit("evil"),
          pmod(xxhash64(lit(5), col("event_id")), lit(2000)),
          lit(".example.com")).as("value"))
      val turns = events.select(
        concat(lit("conv-"), col("user_id")).as("conv_id"),
        col("event_id").cast("int").as("turn_idx"), col("ts"))
      graft.ops.IndicatorTimeline.timeline(matched, turns).count()
    }
    probe("reconcile") {
      // the q85 shape at scale: 64 sinks, one sink loses rows, one is
      // corrupted, the rest must fold to 'equal'
      val base = events.select((col("event_id") % 64).as("sink"),
        col("event_id"), col("event_type"), col("user_id"))
      val right = base
        .where(!(col("sink") === 0 && col("event_id") % 997 === 0))
        .withColumn("event_type",
          when(col("sink") === 1 && col("event_id") % 499 === 0,
            lit("corrupted")).otherwise(col("event_type")))
      graft.ops.Reconcile.diff(base, right, Seq("sink"),
        Seq("event_id", "event_type", "user_id")).count()
    }
    probe("dga_score") {
      // half human-word labels, half hex noise — both rule paths hot
      val doms = events.select(
        when(col("event_id") % 2 === 0,
          concat(col("event_type"), lit(".example.com")))
          .otherwise(concat(
            substring(md5(col("event_id").cast("string")), 1, 14),
            lit(".biz"))).as("domain"))
      graft.ops.DgaScore.score(doms, "domain").count()
    }
    probe("risk_score") {
      val levels = array(lit("critical"), lit("high"), lit("medium"),
        lit("low"))
      val matched = events.select(
        concat(lit("conv-"), col("user_id")).as("conv_id"),
        concat(lit("ioc"),
          pmod(xxhash64(lit(6), col("event_id")), lit(5000)))
          .as("value"),
        element_at(levels, (pmod(xxhash64(lit(7), col("event_id")),
          lit(4)) + 1).cast("int")).as("threat_level"))
      graft.pipeline.RiskScore.conversationRisk(matched).count()
    }
    probe("conv_audit") {
      val turns = events.select(
        concat(lit("conv-"), col("user_id")).as("conv_id"),
        col("event_id").cast("int").as("turn_idx"),
        col("event_type").as("role"),
        when(col("event_id") % 97 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("turn text "),
            col("event_id").cast("string"))).as("text"))
      graft.ops.ConvValidate.audit(turns).count()
    }
    probe("pack_sequences") {
      // per-shard ~50k sequences: shard count scales with the corpus
      val shards = math.max(32, (n / 50000L).toInt)
      val seqs = events.select(col("event_id").as("doc_id"),
        (pmod(xxhash64(lit(8), col("event_id")), lit(500)) + 1)
          .as("n_tokens"))
      graft.ops.Packing.packSequences(seqs, budget = 4096L,
        numShards = shards).count()
    }
    probe("truncate_tail") {
      val turns = events.select(
        concat(lit("conv-"), col("user_id")).as("conv_id"),
        col("event_id").cast("int").as("turn_idx"),
        col("event_type").as("role"),
        concat(lit("some words here for "),
          col("event_id").cast("string")).as("text"))
      graft.ops.Packing.truncateTail(turns, budget = 50L).count()
    }
    probe("confusables") {
      val probes = events.select(concat(
        when(col("event_id") % 3 === 0, lit("brand"))
          .when(col("event_id") % 3 === 1, lit("br@nd"))
          .otherwise(lit("brand-")),
        pmod(xxhash64(lit(9), col("event_id")), lit(1000)).cast("string"),
        when(col("event_id") % 2 === 0, lit(".com"))
          .otherwise(lit(".c0m"))).as("domain"))
      val watch = spark.range(1000).select(
        concat(lit("brand"), col("id").cast("string"), lit(".com"))
          .as("domain"))
      graft.ops.Confusables.matchWatchlist(probes, "domain",
        watch, "domain").count()
    }
    probe("cusum") {
      val daily = events.groupBy(
        pmod(col("user_id"), lit(1000)).as("key"),
        expr("unix_micros(ts) div 86400000000").as("period"))
        .agg(count(lit(1)).as("value"))
      // ~n/30000 events per (key, day); drift pinned just above it
      graft.ops.ChangePoint.cusum(daily,
        drift = math.max(1L, n / 30000L), threshold = 10L).count()
    }
    probe("inverted_index") {
      // zipfish vocab: 8 hot terms per doc + one rare tail term —
      // the hot postings hit the cap, the tail stays full
      val docs = events.select(col("event_id").as("doc_id"),
        concat(lit("alpha beta gamma delta epsilon zeta eta theta rare"),
          pmod(xxhash64(lit(10), col("event_id")), lit(n / 10))
            .cast("string")).as("text"))
      graft.ops.InvertedIndex.postings(docs).count()
    }
    probe("heavy_hitters") {
      // 5 hot items at ~1/10 of the corpus each + a singleton tail: the
      // candidate stage must stay bounded while the tail cardinality is
      // ~n/2
      val items = events.select(
        when(col("event_id") % 2 === 0,
          concat(lit("hot"), (col("event_id") % 5).cast("string")))
          .otherwise(concat(lit("tail-"), col("event_id").cast("string")))
          .as("item"))
      graft.ops.HeavyHitters.frequentItems(items, "item", k = 12).count()
    }
    probe("chunking") {
      // ~52 tokens per doc -> 5 overlapping 24/12 chunks each: the
      // explode fan-out is the cost being measured
      val docs = events.select(col("event_id").as("doc_id"),
        concat(lit("alpha beta gamma delta "),
          repeat(concat(lit("w"),
            pmod(xxhash64(lit(11), col("event_id")), lit(100))
              .cast("string"), lit(" ")), 48)).as("text"))
      graft.ops.Chunking.slidingChunks(docs, 24, 12).count()
    }
    probe("set_join") {
      // clone families of 4 (planted near-dups) over a mostly-unique
      // token space: the prefix filter must keep candidates ~clone-sized
      // while the naive token self-join would be corpus-quadratic on the
      // shared family tokens
      val docs = events.select(col("event_id").as("doc_id"),
        concat(
          lit("fam"), (col("event_id") / 4).cast("long").cast("string"),
          lit("a fam"), (col("event_id") / 4).cast("long").cast("string"),
          lit("b uniq"), col("event_id").cast("string"),
          lit(" w"), pmod(xxhash64(lit(13), col("event_id")), lit(50))
            .cast("string")).as("text"))
      graft.ops.SetJoin.jaccardJoin(docs, minJaccardPermille = 500)
        .count()
    }
    probe("bpe_merges") {
      val docs = events.select(col("event_id").as("doc_id"),
        concat(lit("alpha beta gamma tok"),
          pmod(xxhash64(lit(14), col("event_id")), lit(10000))
            .cast("string")).as("text"))
      graft.ops.Vocab.bpeMergeCounts(docs, topK = 30).count()
    }
    probe("text_clean") {
      val docs = events.select(col("event_id").as("doc_id"),
        concat(lit("  lineone  "), col("event_id").cast("string"),
          lit("\ttail  ")).as("text"))
      graft.ops.TextClean.normalize(docs).count()
    }
    probe("budget_per_key") {
      val docs = events.select(col("event_id").as("doc_id"),
        col("user_id").as("key"),
        (pmod(xxhash64(lit(12), col("event_id")), lit(500)) + 1)
          .as("n_tokens"))
      graft.ops.Sampling.budgetPerKey(docs, "key", budget = 100000L)
        .count()
    }
    // session-11 families
    probe("quantiles_bucketed") {
      val m = events.select(col("event_type"),
        pmod(xxhash64(lit(15), col("event_id")), lit(5000000L))
          .as("latency_us"))
      graft.ops.Quantiles.bucketedNearestRank(m, Seq("event_type"),
        "latency_us", Seq(("50", 500), ("99", 990)),
        bucketWidth = 10000L).count()
    }
    probe("quantiles_direct") { // the full-sort baseline to beat
      val m = events.select(col("event_type"),
        pmod(xxhash64(lit(15), col("event_id")), lit(5000000L))
          .as("latency_us"))
      graft.ops.Percentiles.nearestRank(m, Seq("event_type"),
        "latency_us", Seq(("50", 500), ("99", 990))).count()
    }
    probe("triangles") {
      // sparse social-graph density: avg degree 2m/nodes = 6
      val nodes = math.max(100L, n / 3)
      val edges = events.select(
        pmod(xxhash64(lit(16), col("event_id")), lit(nodes)).as("x"),
        pmod(xxhash64(lit(17), col("event_id")), lit(nodes)).as("y"))
      graft.ops.Triangles.triangleCount(edges, "x", "y").count()
    }
    probe("skew_join") {
      val dim = events.groupBy("event_type")
        .agg(count(lit(1)).as("type_total"))
      graft.ops.SkewJoin.saltedJoin(
        events.select("event_type", "user_id"), dim,
        Seq("event_type"), salts = 16).count()
    }
    probe("url_normalize") {
      val urls = events.select(col("event_id"), concat(
        lit("HTTP://Host"), pmod(col("event_id"), lit(1000)),
        lit(".COM:80/p/"), col("event_type"),
        lit("?utm_source=x&b=2&a="), col("user_id"), lit("#f"))
        .as("url"))
      graft.ops.UrlNormalize.normalize(urls, "url").count()
    }
    probe("zorder") {
      graft.ops.Zorder.withZkey(events.select(
        pmod(col("user_id"), lit(65536L)).as("x"),
        pmod(col("event_id"), lit(65536L)).as("y")), "x", "y").count()
    }
    probe("anonymize") {
      graft.ops.Anonymize.collisionAudit(events, "user_id", "s1")
        .count()
    }
    probe("rollup_hierarchy") {
      graft.ops.Rollups.hierarchicalRollup(
        events.select(col("event_type"),
          pmod(col("user_id"), lit(7)).as("ubucket"), col("user_id"),
          col("event_id")),
        Seq("event_type", "ubucket"),
        Seq(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("event_id")).as("sum_ids"))).count()
    }
    probe("rolling_active") {
      graft.ops.RollingDistinct.rollingActive(events, "ts", "user_id",
        7, 1).count()
    }
    probe("rolling_active_naive") { // countDistinct through the raw expand
      events.filter(col("ts").isNotNull && col("user_id").isNotNull)
        .groupBy(window(date_trunc("DAY", col("ts")),
          "7 days", "1 day"))
        .agg(countDistinct(col("user_id"))).count()
    }
    probe("max_gap_bucketed") {
      graft.ops.Freshness.maxGapAudit(events, "ts", Seq("event_type"),
        3600000000L).count()
    }
    probe("max_gap_naive") { // full per-key sort: 5 keys, n/5 rows each
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type")
        .orderBy("__graft_us")
      events.withColumn("__graft_us",
          unix_micros(col("ts").cast("timestamp")))
        .withColumn("g",
          col("__graft_us") - lag("__graft_us", 1).over(w))
        .groupBy("event_type").agg(max(col("g"))).count()
    }
    probe("state_intervals") {
      graft.ops.Scd.stateIntervals(events, "ts", "event_type",
        Seq("user_id"), 3600000000L).count()
    }
    probe("throttle_audit") {
      graft.ops.Windows.throttleAudit(events, "ts", Seq("user_id"),
        Seq("event_id"), 5, 3600L).count()
    }
    probe("zonemap_audit") {
      graft.ops.ZoneMaps.pruningAudit(events,
        expr("event_id div 100000"), "event_id",
        Seq((0L, 1000000L), (5000000L, 6000000L))).count()
    }
    probe("join_forecast") {
      graft.ops.SkewJoin.joinSizeForecast(events,
        events.select(col("user_id")), "user_id", 10).count()
    }
    probe("diversified_topk") {
      graft.ops.TopK.diversifiedTopK(events, "value", "event_id",
        "event_type", 100, 1000).count()
    }
    probe("keep_best") {
      graft.ops.Dedup.keepBest(events
          .withColumn("cl", pmod(col("user_id"), lit(1000L))),
        "cl", "event_id", "value").count()
    }
    probe("range_assign") {
      val bounds = graft.ops.Quantiles.rangeBoundaries(
        events.withColumn("v", col("event_id")), "v", 32, 100000L)
        .orderBy("boundary_idx").select("value")
        .collect().map(_.getLong(0)).toSeq
      graft.ops.Quantiles.assignRanges(
        events.withColumn("v", col("event_id")), "v", bounds)
        .groupBy("range_idx").count().count()
    }
    spark.stop()
  }
}
