package graft.streaming

import graft.SparkSpec
import graft.io.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

class StreamingOpsSpec extends SparkSpec {

  test("AvailableNow file stream ingests staged parquet incrementally") {
    val base = Files.createTempDirectory("graft_stream").toString
    val staging = s"$base/staging"
    import spark.implicits._
    val day1 = Seq((1L, 2, 10.0, java.sql.Timestamp.valueOf("2026-01-24 10:00:00"), 20.0))
      .toDF("CustomerID", "Quantity", "UnitPrice", "order_timestamp", "TotalPurchase")
    Sources.appendParquet(day1, staging)

    val counts1 = StreamingOps.runAvailableNow(
      StreamingOps.stagingStream(spark, staging)
        .groupBy(col("CustomerID")).agg(count(lit(1)).as("n")),
      "stage_counts_1", s"$base/ckpt", OutputMode.Complete())
    assert(counts1.count() == 1L)

    // a second batch arrives; the SAME checkpoint processes only the delta
    val day2 = Seq(
      (1L, 1, 5.0, java.sql.Timestamp.valueOf("2026-01-25 10:00:00"), 5.0),
      (2L, 3, 7.0, java.sql.Timestamp.valueOf("2026-01-25 11:00:00"), 21.0))
      .toDF("CustomerID", "Quantity", "UnitPrice", "order_timestamp", "TotalPurchase")
    Sources.appendParquet(day2, staging)
    val counts2 = StreamingOps.runAvailableNow(
      StreamingOps.stagingStream(spark, staging)
        .groupBy(col("CustomerID")).agg(count(lit(1)).as("n")),
      "stage_counts_2", s"$base/ckpt", OutputMode.Complete())
    val byId = counts2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(1L -> 2L, 2L -> 1L))
  }

  test("streaming dedup drops in-window duplicate texts, state stays bounded") {
    val base = Files.createTempDirectory("graft_dedup").toString
    val staging = s"$base/staging"
    import spark.implicits._
    def docs(rows: (Long, String, String)*) =
      rows.toSeq.toDF("doc_id", "text", "ts_s")
        .select(col("doc_id"), col("text"), col("ts_s").cast("timestamp").as("ts"))
    // batch 1: two distinct texts + one in-batch duplicate
    Sources.appendParquet(docs(
      (1L, "alpha beta", "2026-01-24 10:00:00"),
      (2L, "gamma delta", "2026-01-24 10:01:00"),
      (3L, "alpha beta", "2026-01-24 10:02:00")), staging)
    // parquet sink: the memory sink cannot recover an Append-mode
    // checkpoint, and checkpoint reuse is exactly what's under test
    def runBatch(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(staging)
      val q = StreamingOps.dedupStream(stream).writeStream
        .format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runBatch()
    val out1 = spark.read.parquet(s"$base/out")
    assert(out1.select("text").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("alpha beta", "gamma delta"))

    // batch 2 on the same checkpoint: a cross-batch duplicate inside the
    // watermark is dropped by the retained hash state; a new text passes
    Sources.appendParquet(docs(
      (4L, "alpha beta", "2026-01-24 10:30:00"),
      (5L, "epsilon zeta", "2026-01-24 10:31:00")), staging)
    runBatch()
    val out2 = spark.read.parquet(s"$base/out")
    assert(out2.select("text").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("alpha beta", "epsilon zeta", "gamma delta"))
    assert(!out2.collect().map(_.getLong(0)).contains(4L),
      "cross-batch duplicate doc 4 should have been dropped by retained state")
  }

  test("text operators run unchanged on a stream: stream/batch parity") {
    val base = Files.createTempDirectory("graft_textstream").toString
    val staging = s"$base/staging"
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    Sources.appendParquet(docs, staging)
    // textStats/qualityScore are pure projections — the SAME operator
    // works on a readStream frame with no code changes
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(staging)
    val streamed = StreamingOps.runAvailableNow(
      graft.text.TextOps.textStats(stream), "text_stream", s"$base/ckpt")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val batch = graft.text.TextOps.textStats(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("model-backed scorers run unchanged on a stream: LM + classifier parity") {
    val base = Files.createTempDirectory("graft_modelstream").toString
    val staging = s"$base/staging"
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    Sources.appendParquet(docs, staging)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(staging)
    // lmScore trains on the BATCH frame, then the returned scoring
    // projection (broadcast model inside a codegen expression) applies to
    // the stream with no code changes — models fit offline, score online
    val train = docs.where(col("doc_id") % 10 < 8)
    val streamed = StreamingOps.runAvailableNow(
      graft.text.TextOps.lmScore(stream, train), "lm_stream", s"$base/ckpt_lm")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val batch = graft.text.TextOps.lmScore(docs, train)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(streamed.size == batch.size)
    batch.foreach { case (id, v) =>
      assert(math.abs(streamed(id) - v) < 1e-12, s"doc $id: $v vs ${streamed(id)}") }
    // same deployment shape for the trained quality classifier: fit on
    // batch features, score the stream as a projection
    val featsOf = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("double").as("f_ntok"),
      length(col("text")).cast("double").as("f_nchars"))
    val labeled = featsOf(docs).withColumn("label", (col("f_ntok") > 50).cast("long"))
    val model = graft.quality.QualityClassifier.fit(labeled,
      Seq("f_ntok", "f_nchars"), "label")
    val sPred = StreamingOps.runAvailableNow(
      model.score(featsOf(stream)), "clf_stream", s"$base/ckpt_clf")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val bPred = model.score(featsOf(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(sPred == bPred)
  }

  test("incremental features: streaming state matches the batch transform") {
    val base = Files.createTempDirectory("graft_incr").toString
    val staging = s"$base/staging"
    val (batch1, _) = graft.sim.Generate.dailyBatch(spark, 100, "2026-01-24 00:00:00", 21)
    Sources.appendParquet(batch1, staging)
    val asOf = org.apache.spark.sql.functions.to_date(lit("2026-01-27"))

    def run(name: String) = StreamingOps.runAvailableNow(
      StreamingOps.incrementalFeatures(
        StreamingOps.stagingStream(spark, staging), asOf),
      name, s"$base/ckpt", org.apache.spark.sql.streaming.OutputMode.Complete())

    run("incr_1")
    // day 2 arrives; same checkpoint folds only the delta into state
    val (batch2, _) = graft.sim.Generate.dailyBatch(spark, 110, "2026-01-25 00:00:00", 22)
    Sources.appendParquet(batch2, staging)
    val streamed = run("incr_2")

    val batchFeats = graft.operators.Rfm.customerFeatures(
      spark.read.parquet(staging), asOf)
    val joined = streamed.as("s").join(batchFeats.as("b"), "customer_id")
    assert(streamed.count() == batchFeats.count())
    // exact columns agree everywhere
    assert(joined.where(col("s.recency") =!= col("b.recency") ||
      col("s.t") =!= col("b.t") ||
      col("s.first_purchase") =!= col("b.first_purchase") ||
      col("s.last_purchase") =!= col("b.last_purchase") ||
      abs(col("s.monetary_value") - col("b.monetary_value")) > 1e-9).isEmpty)
    // frequency is an HLL estimate: tiny per-customer counts ⇒ tight bound
    assert(joined.where(abs(col("s.frequency") - col("b.frequency")) > 1).isEmpty)
  }

  test("watermarked tumbling windows aggregate the events table") {
    val base = Files.createTempDirectory("graft_stream_ev").toString
    // batch-source parity: run the same windowed agg over a file stream fed
    // from the real events table
    val events = Sources.table(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val evDir = s"$base/events"
    events.write.parquet(evDir)
    val stream = spark.readStream.schema(spark.read.parquet(evDir).schema).parquet(evDir)
    val out = StreamingOps.runAvailableNow(
      StreamingOps.windowedEventCounts(stream),
      "win_counts", s"$base/ckpt", OutputMode.Append())
    // append mode emits only watermark-closed windows; all but the tail close
    assert(out.count() > 0)
    val batch = events.groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // every emitted (window, type, n) matches the batch computation
    val joined = out.join(batch,
      out("window_start") === batch("h") && out("event_type") === batch("event_type") &&
        out("n_events") === batch("n"))
    assert(joined.count() == out.count(), "streamed windows must match batch agg")
  }

  test("stream-stream interval join: inner parity with batch, outer emits after watermark") {
    val base = Files.createTempDirectory("graft_ssjoin").toString
    import spark.implicits._
    def ev(rows: (Long, String, Double)*) =
      rows.toSeq.toDF("user_id", "ts_s", "value")
        .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
    // left: user 1 matches, user 2 has no right event in [ts, ts+15m]
    val left1 = ev((1L, "2026-01-24 10:00:00", 1.0), (2L, "2026-01-24 10:05:00", 2.0))
    val right1 = ev((1L, "2026-01-24 10:10:00", 10.0), (2L, "2026-01-24 11:00:00", 20.0))
    Sources.appendParquet(left1, s"$base/left")
    Sources.appendParquet(right1, s"$base/right")

    def stream(dir: String) = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE").parquet(dir)
    def runJoin(joinType: String, out: String): Unit = {
      val q = StreamingOps.intervalJoin(stream(s"$base/left"), stream(s"$base/right"),
          key = "user_id", joinType = joinType)
        .writeStream.format("parquet")
        .option("path", s"$base/out_$joinType")
        .option("checkpointLocation", s"$base/ckpt_$joinType")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    runJoin("inner", "out_inner")
    val inner = spark.read.parquet(s"$base/out_inner")
    // batch parity: the SAME operator on batch frames (watermark is a no-op)
    val batchInner = StreamingOps.intervalJoin(
      spark.read.parquet(s"$base/left"), spark.read.parquet(s"$base/right"),
      key = "user_id")
    assert(inner.collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value_r"))).toSet ==
      batchInner.collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value_r"))).toSet)
    assert(inner.count() == 1L && inner.head().getAs[Long]("user_id") == 1L)

    // left-outer: the unmatched user-2 row emits only once the watermark
    // passes 10:05+15m+30m — a later flush batch through the SAME
    // checkpoint advances it and releases the null-padded row
    runJoin("left_outer", "out1")
    Sources.appendParquet(ev((9L, "2026-01-24 13:00:00", 0.0)), s"$base/left")
    Sources.appendParquet(ev((9L, "2026-01-24 13:00:01", 0.0)), s"$base/right")
    runJoin("left_outer", "out2")
    val outer = spark.read.parquet(s"$base/out_left_outer")
    val user2 = outer.where(col("user_id") === 2L).collect()
    assert(user2.length == 1 && user2.head.isNullAt(user2.head.fieldIndex("value_r")),
      s"unmatched left row should emit null-padded after watermark; got ${outer.collect().toSeq}")
    // and the matched row is identical to the inner result
    assert(outer.where(col("user_id") === 1L).head().getAs[Double]("value_r") == 10.0)
  }

  test("sessionization state machine: one open session per active user") {
    val base = Files.createTempDirectory("graft_sess").toString
    import spark.implicits._
    val events = Seq(
      StreamingOps.Event(1L, java.sql.Timestamp.valueOf("2026-01-24 10:00:00"), 1.0),
      StreamingOps.Event(1L, java.sql.Timestamp.valueOf("2026-01-24 10:05:00"), 2.0),
      StreamingOps.Event(2L, java.sql.Timestamp.valueOf("2026-01-24 10:01:00"), 5.0))
    val evDir = s"$base/events"
    events.toDF().write.parquet(evDir)
    val stream = spark.readStream.schema(spark.read.parquet(evDir).schema)
      .parquet(evDir).as[StreamingOps.Event]
    // 1s gap so the processing-time timeout can fire (and the AvailableNow
    // query terminate) promptly inside the test
    val sessions = StreamingOps.runAvailableNow(
      StreamingOps.sessionize(stream, gapSeconds = 1).toDF(),
      "sessions", s"$base/ckpt", OutputMode.Update(), maxWaitMs = 60000)
    val byUser = sessions.collect().map(r =>
      r.getAs[Long]("user_id") -> (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
    assert(byUser(1L) == ((2L, 3.0)))
    assert(byUser(2L) == ((1L, 5.0)))
  }

  test("EWMA anomaly chart: a planted spike flags, the steady user never does") {
    val base = Files.createTempDirectory("graft_ewma").toString
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-24 10:$m%02d:00")
    // user 1: ten settled readings around 10, then a 100 spike, then
    // settled again; user 2: steady throughout
    val steady = (0 until 10).map(m =>
      StreamingOps.Event(1L, ts(m), 10.0 + (m % 3)))
    val spike = Seq(StreamingOps.Event(1L, ts(10), 100.0))
    val after = (11 until 14).map(m =>
      StreamingOps.Event(1L, ts(m), 10.0 + (m % 3)))
    val user2 = (0 until 14).map(m =>
      StreamingOps.Event(2L, ts(m), 5.0 + (m % 2)))
    val evDir = s"$base/events"
    (steady ++ spike ++ after ++ user2).toDF().write.parquet(evDir)
    val stream = spark.readStream.schema(spark.read.parquet(evDir).schema)
      .parquet(evDir).as[StreamingOps.Event]
    val anomalies = StreamingOps.runAvailableNow(
      StreamingOps.ewmaAnomalies(stream).toDF(),
      "ewma_anoms", s"$base/ckpt", OutputMode.Append(), maxWaitMs = 60000)
      .collect()
    assert(anomalies.forall(_.getAs[Long]("user_id") == 1L),
      s"steady user must never flag: ${anomalies.toSeq}")
    val flagged = anomalies.map(r =>
      (r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value")))
    assert(flagged.contains((ts(10), 100.0)),
      s"the planted spike must flag: ${anomalies.toSeq}")
    // the spike plus at most the immediate post-spike settling readings
    // (the chart's variance is inflated right after absorbing the spike,
    // so later NORMAL readings must not flag)
    assert(anomalies.length <= 2, s"over-flagging: ${anomalies.toSeq}")
    // replay determinism: the state fold is event-time ordered, so a
    // second identical run produces the identical anomaly set
    val second = StreamingOps.runAvailableNow(
      StreamingOps.ewmaAnomalies(
        spark.readStream.schema(spark.read.parquet(evDir).schema)
          .parquet(evDir).as[StreamingOps.Event]).toDF(),
      "ewma_anoms2", s"$base/ckpt2", OutputMode.Append(), maxWaitMs = 60000)
      .collect()
    assert(second.map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_.toString).toSeq
      === anomalies.map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_.toString).toSeq)
  }

  test("rolling z-score chart: exact trailing-window parity across checkpoints") {
    // the streaming counterpart of q_rolling_anomaly (r11): two series,
    // 80 days each, a planted spike past warmup; days arrive in TWO
    // tranches on ONE checkpoint, so the trailing ring must survive the
    // restart and the second run must score only the delta days
    val base = Files.createTempDirectory("graft_rollz").toString
    import spark.implicits._
    val W = 28
    def rev(sid: Long, i: Int): Long =
      if (sid == 1L && i == 60) 10000000L
      else 100000L + ((sid * 31 + i * 57) % 997) * 13L
    def day(i: Int): java.sql.Date =
      java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(i))
    val all = for (sid <- 1L to 2L; i <- 0 until 80)
      yield StreamingOps.DailyRev(sid, day(i), rev(sid, i))
    val dir = s"$base/daily"
    all.filter(_.day.toLocalDate.getDayOfYear <= 50).toDF()
      .write.mode("append").parquet(dir)
    def stream() = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
      .as[StreamingOps.DailyRev]
    // a memory sink cannot RECOVER an Append checkpoint (not fault-
    // tolerant) — the restart under test needs the file sink
    val outDir = s"$base/out"
    def run(): Unit = {
      val q = StreamingOps.rollingZAnomalies(stream(), W).toDF()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "stream did not drain")
    }
    run()
    val first = spark.read.parquet(outDir).collect()
    all.filter(_.day.toLocalDate.getDayOfYear > 50).toDF()
      .write.mode("append").parquet(dir)
    run()
    val combined = spark.read.parquet(outDir).collect()
    val firstKeys = first.map(_.toString).toSet
    val second = combined.filterNot(r => firstKeys.contains(r.toString))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))
    val got = (first ++ second).map(key).toSet
    // driver replay with the IDENTICAL double arithmetic (the batch
    // query's formula): exact integer s1/s2, mu = s1/n, clamped sd,
    // abstain on sd = 0, r6 round BEFORE the |z| > 3 verdict
    val want = (for (sid <- 1L to 2L; i <- W until 80) yield {
      val trail = (i - W until i).map(rev(sid, _))
      val n = W.toDouble
      val s1 = trail.sum.toDouble
      val s2 = trail.foldLeft(BigInt(0))((a, r) => a + BigInt(r) * BigInt(r)).toDouble
      val mu = s1 / n
      val sd = math.sqrt(math.max(s2 - s1 * s1 / n, 0.0) / (n - 1.0))
      if (sd > 0.0) {
        val z = (rev(sid, i).toDouble - mu) / sd
        val zR = math.floor(z * 1000000.0 + 0.500001) / 1000000.0
        Some((sid, day(i).toString, rev(sid, i).toDouble / 100.0,
          math.floor(mu / 100.0 * 100.0 + 0.500001) / 100.0, zR,
          if (math.abs(zR) > 3.0) 1L else 0L))
      } else None
    }).flatten.toSet
    assert(got === want, s"streamed ${got.size} vs replay ${want.size}")
    // the planted spike flags; its day emits from the SECOND tranche,
    // proving the ring crossed the checkpoint
    val spike = (first ++ second).filter(r =>
      r.getLong(0) == 1L && r.getDate(1) == day(60))
    assert(spike.length == 1 && spike(0).getLong(5) == 1L,
      s"planted spike must flag: ${spike.toSeq}")
    assert(second.exists(r => r.getLong(0) == 1L && r.getDate(1) == day(60)))
    // warmup gate: nothing before day W ever emits
    assert((first ++ second).forall(_.getDate(1).toLocalDate.isAfter(
      day(W - 1).toLocalDate)))
  }

  test("stateful restart at a DIFFERENT shuffle-partition count carries state exactly (state-store rescale trap)") {
    // The production trap none of the other streaming specs cover: the
    // state-store partition count is pinned INTO the checkpoint at first
    // start — a restart under a session whose spark.sql.shuffle.partitions
    // changed (cluster resize, conf drift) must keep reading the
    // checkpointed layout and carry every group's state exactly, not
    // redistribute/lose state or apply the new count. Contract under
    // test: (a) emissions from a two-tranche run whose second tranche
    // restarts at a different partition count are EXACTLY the emissions
    // of a fresh single-pass run; (b) the checkpoint's state directory
    // keeps its original partition fan-out after the rescaled restart.
    val base = Files.createTempDirectory("graft_rescale").toString
    import spark.implicits._
    def rev(sid: Long, i: Int): Long =
      if (sid == 1L) { if (i < 60) 10000L else 20000L } else 15000L
    def day(i: Int): java.sql.Date =
      java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(i))
    val all = for (sid <- 1L to 2L; i <- 0 until 100)
      yield StreamingOps.DailyRev(sid, day(i), rev(sid, i))
    val xs = (0 until 100).map(i => rev(1L, i).toDouble / 1000000.0)
    val mu = xs.sum / xs.length
    val sigma = math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / xs.length)
    def runOn(dir: String, ckpt: String, outDir: String): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir)
        .as[StreamingOps.DailyRev]
      val q = StreamingOps.cusumChart(src, mu, sigma).toDF()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "stream did not drain")
    }
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))
    val dirA = s"$base/daily_a"
    all.filter(_.day.toLocalDate.getDayOfYear <= 70).toDF()
      .write.mode("append").parquet(dirA)
    runOn(dirA, s"$base/ckptA", s"$base/outA")
    val originalParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // the "cluster resized between runs" moment
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      all.filter(_.day.toLocalDate.getDayOfYear > 70).toDF()
        .write.mode("append").parquet(dirA)
      runOn(dirA, s"$base/ckptA", s"$base/outA")
    } finally spark.conf.set("spark.sql.shuffle.partitions", originalParts)
    // (a) exact carry-over: two-tranche rescaled emissions ≡ fresh
    // single-pass emissions over the identical data
    val dirB = s"$base/daily_b"
    all.toDF().write.mode("append").parquet(dirB)
    runOn(dirB, s"$base/ckptB", s"$base/outB")
    val got = spark.read.parquet(s"$base/outA").collect()
    val want = spark.read.parquet(s"$base/outB").collect().map(key).toSet
    assert(got.length == got.map(key).toSet.size, "no duplicate emissions")
    assert(got.map(key).toSet == want,
      s"rescaled restart diverged: ${got.length} vs ${want.size} emissions")
    // the post-restart tranche really did emit (state crossed the restart)
    assert(got.exists(_.getDate(1).toLocalDate.getDayOfYear > 70))
    // (b) the checkpoint kept its original state fan-out — Spark pins the
    // count at first start; the conf change must NOT re-shard the store
    val stateDir = java.nio.file.Paths.get(s"$base/ckptA/state/0")
    val partDirs = {
      val s = java.nio.file.Files.list(stateDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .count(_.forall(_.isDigit))
      } finally s.close()
    }
    assert(partDirs == originalParts.toInt,
      s"state store re-sharded: $partDirs dirs vs pinned $originalParts")
  }

  test("CUSUM chart: closed-form parity across a checkpoint, step shift alarms") {
    // the streaming counterpart of q_cusum: the 60-flat/40-stepped
    // fixture from the batch spec, two series, arriving in TWO tranches
    // on ONE checkpoint — the five-double state must survive the restart
    // so the ramp continues from its pre-restart prefix sums
    val base = Files.createTempDirectory("graft_cusum_s").toString
    import spark.implicits._
    def rev(sid: Long, i: Int): Long =
      if (sid == 1L) { if (i < 60) 10000L else 20000L } else 15000L
    def day(i: Int): java.sql.Date =
      java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(i))
    val all = for (sid <- 1L to 2L; i <- 0 until 100)
      yield StreamingOps.DailyRev(sid, day(i), rev(sid, i))
    // reference = series-1's whole-window moments, the batch calibration
    val xs = (0 until 100).map(i => rev(1L, i).toDouble / 1000000.0)
    val mu = xs.sum / xs.length
    val sigma = math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / xs.length)
    val dir = s"$base/daily"
    all.filter(_.day.toLocalDate.getDayOfYear <= 70).toDF()
      .write.mode("append").parquet(dir)
    def stream() = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
      .as[StreamingOps.DailyRev]
    val outDir = s"$base/out"
    def run(): Unit = {
      val q = StreamingOps.cusumChart(stream(), mu, sigma).toDF()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "stream did not drain")
    }
    run()
    val first = spark.read.parquet(outDir).collect()
    all.filter(_.day.toLocalDate.getDayOfYear > 70).toDF()
      .write.mode("append").parquet(dir)
    run()
    val combined = spark.read.parquet(outDir).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))
    val got = combined.map(key).toSet
    assert(combined.length === got.size, "no duplicate emissions")
    // driver replay of the identical closed form (the batch q_cusum
    // recursion), per series, both rounding pins included
    val hR = math.floor(5.0 * sigma * 1000000.0 + 0.500001) / 1000000.0
    val want = (for (sid <- 1L to 2L) yield {
      var (p, q, mP, mQ) = (0.0, 0.0,
        Double.PositiveInfinity, Double.PositiveInfinity)
      (0 until 100).map { i =>
        val x = rev(sid, i).toDouble / 1000000.0
        p += x - mu - 0.5 * sigma; q += mu - 0.5 * sigma - x
        mP = math.min(mP, p); mQ = math.min(mQ, q)
        val spos = p - math.min(mP, 0.0); val sneg = q - math.min(mQ, 0.0)
        val statR = math.floor(math.max(spos, sneg) * 1000000.0
          + 0.500001) / 1000000.0
        (sid, day(i).toString, rev(sid, i).toDouble / 100.0,
          math.floor(spos * 10000.0 + 0.500001) / 10000.0,
          math.floor(sneg * 10000.0 + 0.500001) / 10000.0,
          if (statR > hR) 1L else 0L)
      }
    }).flatten.toSet
    assert(got === want, s"streamed ${got.size} vs replay ${want.size}")
    // the step ramps: late series-1 days all alarm, and a post-restart
    // day emits with a statistic that only a surviving prefix-sum state
    // can produce; the flat series never alarms
    val lateAlarms = combined.filter(r => r.getLong(0) == 1L &&
      r.getDate(1).toLocalDate.isAfter(day(80).toLocalDate))
    assert(lateAlarms.nonEmpty && lateAlarms.forall(_.getLong(5) == 1L),
      "ramp tail must alarm")
    assert(combined.filter(_.getLong(0) == 2L).forall(_.getLong(5) == 0L),
      "in-control series must never alarm")
  }

  test("Page–Hinkley chart: replay parity across a checkpoint, drift ramp alarms") {
    // the streaming counterpart of q_page_hinkley: 50 flat days then a
    // rising ramp on series 1, a flat control series 2, arriving in two
    // tranches on one checkpoint — the four-number state (count, Σx, m,
    // min m) must survive the restart so the running mean continues
    val base = Files.createTempDirectory("graft_ph_s").toString
    import spark.implicits._
    def rev(sid: Long, i: Int): Long =
      if (sid == 1L) { if (i < 50) 10000L else 10000L + (i - 49) * 400L }
      else 15000L
    def day(i: Int): java.sql.Date =
      java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(i))
    val all = for (sid <- 1L to 2L; i <- 0 until 100)
      yield StreamingOps.DailyRev(sid, day(i), rev(sid, i))
    val xs = (0 until 100).map(i => rev(1L, i).toDouble / 1000000.0)
    val mu = xs.sum / xs.length
    val sigma = math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / xs.length)
    val dir = s"$base/daily"
    all.filter(_.day.toLocalDate.getDayOfYear <= 70).toDF()
      .write.mode("append").parquet(dir)
    def stream() = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
      .as[StreamingOps.DailyRev]
    val outDir = s"$base/out"
    def run(): Unit = {
      val q = StreamingOps.phChart(stream(), sigma).toDF()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "stream did not drain")
    }
    run()
    all.filter(_.day.toLocalDate.getDayOfYear > 70).toDF()
      .write.mode("append").parquet(dir)
    run()
    val combined = spark.read.parquet(outDir).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getDouble(3),
        r.getLong(4))
    val got = combined.map(key).toSet
    assert(combined.length === got.size, "no duplicate emissions")
    // driver replay of the batch closed form: running mean, m, min m —
    // the identical float sequence with both rounding pins
    val delta = 0.05 * sigma
    val lamR = math.floor(3.0 * sigma * 10000.0 + 0.500001) / 10000.0
    val want = (for (sid <- 1L to 2L) yield {
      var (cnt, sumX, m, minM) = (0L, 0.0, 0.0, Double.PositiveInfinity)
      (0 until 100).map { i =>
        val x = rev(sid, i).toDouble / 1000000.0
        cnt += 1; sumX += x
        m += x - sumX / cnt - delta
        minM = math.min(minM, m)
        val phR = math.floor((m - minM) * 10000.0 + 0.500001) / 10000.0
        (sid, day(i).toString, rev(sid, i).toDouble / 100.0, phR,
          if (phR > lamR) 1L else 0L)
      }
    }).flatten.toSet
    assert(got === want, s"streamed ${got.size} vs replay ${want.size}")
    // the ramp's tail must alarm (drift past λ), the control never
    val tail = combined.filter(r => r.getLong(0) == 1L &&
      r.getDate(1).toLocalDate.isAfter(day(90).toLocalDate))
    assert(tail.nonEmpty && tail.forall(_.getLong(4) == 1L),
      "drift ramp tail must alarm")
    assert(combined.filter(_.getLong(0) == 2L).forall(_.getLong(4) == 0L),
      "in-control series must never alarm")
    // cross-check against the BATCH q_page_hinkley on the same series:
    // peak PH agrees to the σ-estimator tolerance (batch uses stddev_pop)
    val odir = Files.createTempDirectory("graft_ph_batch").toString
    (0 until 100).map(i => (java.sql.Timestamp.valueOf(
        day(i).toLocalDate.atStartOfDay()), rev(1L, i).toDouble / 100.0))
      .toDF("o_orderdate", "o_totalprice")
      .write.parquet(s"$odir/orders.parquet")
    val batch = graft.SparkEntry.queries("q_page_hinkley")(spark, odir).head()
    val streamPeak = combined.filter(_.getLong(0) == 1L)
      .map(_.getDouble(3)).max
    assert(math.abs(batch.getDouble(2) - streamPeak) < 1e-3,
      s"batch peak ${batch.getDouble(2)} vs stream peak $streamPeak")
    assert(batch.getLong(4) === 1L, "batch agrees the ramp drifted")
  }

  test("EWMA anomaly chart matches a driver-side recurrence replay exactly") {
    val base = Files.createTempDirectory("graft_ewma_replay").toString
    import spark.implicits._
    // a deterministic pseudo-random walk per user — no planted structure
    val events = for (u <- 1L to 3L; i <- 0 until 30) yield
      StreamingOps.Event(u,
        java.sql.Timestamp.valueOf(f"2026-01-24 11:${i / 60}%02d:${i % 60}%02d"),
        ((u * 7919 + i * 104729) % 97).toDouble)
    val evDir = s"$base/events"
    events.toDF().write.parquet(evDir)
    val stream = spark.readStream.schema(spark.read.parquet(evDir).schema)
      .parquet(evDir).as[StreamingOps.Event]
    val got = StreamingOps.runAvailableNow(
      StreamingOps.ewmaAnomalies(stream).toDF(),
      "ewma_replay", s"$base/ckpt", OutputMode.Append(), maxWaitMs = 60000)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2),
        r.getDouble(3))).toSet
    val want = events.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
      var (n, level, evar) = (0L, 0.0, 0.0)
      evs.sortBy(e => (e.ts.getTime, e.value)).flatMap { e =>
        val hit =
          if (n >= 5 && evar > 0.0) {
            val z = (e.value - level) / math.sqrt(evar)
            if (math.abs(z) > 3.0)
              Some((u, e.ts.getTime, e.value, z))
            else None
          } else None
        if (n == 0L) { n = 1L; level = e.value; evar = 0.0 }
        else {
          val dev = e.value - level
          n += 1L; level += 0.3 * dev; evar = 0.7 * (evar + 0.3 * dev * dev)
        }
        hit
      }
    }.toSet
    assert(got === want, s"got $got\nwant $want")
  }

  test("quality router splits clean vs quarantine in one pass, incrementally") {
    val base = Files.createTempDirectory("graft_router").toString
    val staging = s"$base/staging"
    import spark.implicits._
    def tx(rows: (java.lang.Long, Int, Double, String, Double)*) =
      rows.toSeq.toDF("CustomerID", "Quantity", "UnitPrice", "ts_s", "TotalPurchase")
        .select(col("CustomerID"), col("Quantity"), col("UnitPrice"),
          col("ts_s").cast("timestamp").as("order_timestamp"), col("TotalPurchase"))
    // batch 1: 2 clean, 1 negative amount, 1 null key, 1 future timestamp
    Sources.appendParquet(tx(
      (1L, 1, 10.0, "2026-01-24 10:00:00", 10.0),
      (2L, 2, 5.0, "2026-01-24 11:00:00", 10.0),
      (3L, 1, -4.0, "2026-01-24 12:00:00", -4.0),
      (null, 1, 4.0, "2026-01-24 13:00:00", 4.0),
      (5L, 1, 4.0, "2126-01-24 13:00:00", 4.0)), staging)
    def stream() = spark.readStream
      .schema("CustomerID LONG, Quantity INT, UnitPrice DOUBLE, " +
        "order_timestamp TIMESTAMP, TotalPurchase DOUBLE")
      .parquet(staging)
    StreamingOps.routeQuality(stream(), s"$base/clean", s"$base/quar", s"$base/ckpt")

    val clean1 = spark.read.parquet(s"$base/clean")
    val quar1 = spark.read.parquet(s"$base/quar")
    assert(clean1.count() === 2L && quar1.count() === 3L)
    // verdict column only on the quarantine side, with the right reasons
    assert(!clean1.columns.contains("verdict"))
    val reasons = quar1.collect()
      .map(r => Option(r.getAs[java.lang.Long]("CustomerID")).map(_.toLong) ->
        r.getAs[String]("verdict")).toMap
    assert(reasons(Some(3L)) === "bad_amount")
    assert(reasons(None) === "null_key")
    assert(reasons(Some(5L)) === "future_ts")
    // parity: the batch-side verdict projection classifies identically
    val batchOk = StreamingOps.withQualityVerdict(spark.read.parquet(staging))
      .where(col("verdict") === "ok").count()
    assert(batchOk === clean1.count())

    // batch 2 on the same checkpoint: ONLY the delta is routed (no
    // re-append of batch 1's rows — exactly-once per sink)
    Sources.appendParquet(tx(
      (6L, 1, 7.0, "2026-01-25 09:00:00", 7.0),
      (7L, 1, 0.0, "2026-01-25 09:30:00", 0.0)), staging)
    StreamingOps.routeQuality(stream(), s"$base/clean", s"$base/quar", s"$base/ckpt")
    assert(spark.read.parquet(s"$base/clean").count() === 3L)
    val quar2 = spark.read.parquet(s"$base/quar")
    assert(quar2.count() === 4L)
    // zero TotalPurchase is bad_amount (non-positive), not clean
    assert(quar2.where(col("CustomerID") === 7L).select("verdict")
      .head().getString(0) === "bad_amount")
  }

  test("routeBatch is idempotent per batch id: a replay never duplicates a sink") {
    val base = Files.createTempDirectory("graft_routebatch").toString
    import spark.implicits._
    def tx(rows: (java.lang.Long, Double)*) =
      rows.toSeq.toDF("CustomerID", "TotalPurchase")
        .select(col("CustomerID"),
          lit(java.sql.Timestamp.valueOf("2026-01-24 10:00:00"))
            .as("order_timestamp"),
          col("TotalPurchase"))
    val pin = lit(java.sql.Timestamp.valueOf("2026-01-24 23:00:00"))
    val b0 = StreamingOps.withQualityVerdict(
      tx((1L, 10.0), (2L, 5.0), (3L, -1.0)), pin)
    StreamingOps.routeBatch(b0, 0L, s"$base/clean", s"$base/quar")
    // at-least-once replay of the SAME batch (foreachBatch can re-run a
    // partially-committed batch): dynamic overwrite of its own batch_id
    // partition — counts must not move
    StreamingOps.routeBatch(b0, 0L, s"$base/clean", s"$base/quar")
    assert(spark.read.parquet(s"$base/clean").count() === 2L)
    assert(spark.read.parquet(s"$base/quar").count() === 1L)
    // a NEW batch id lands alongside; batch 0's partition is untouched
    val b1 = StreamingOps.withQualityVerdict(tx((4L, 7.0)), pin)
    StreamingOps.routeBatch(b1, 1L, s"$base/clean", s"$base/quar")
    val clean = spark.read.parquet(s"$base/clean")
    assert(clean.count() === 3L)
    assert(clean.where(col("batch_id") === 0).count() === 2L)
    assert(clean.where(col("batch_id") === 1).count() === 1L)
  }

  test("exactly-once across a mid-batch crash: the restarted stream replays the SAME batch id and heals the partial write") {
    // The end-to-end production trap the unit-level routeBatch test cannot
    // cover: foreachBatch dies AFTER one sink's write landed but BEFORE the
    // batch committed to the checkpoint. Contract under test: (a) the
    // restarted query re-presents the SAME batch id with the SAME rows (the
    // checkpoint's offset-log bookkeeping), and (b) the idempotent routing
    // write overwrites the crashed attempt's partial partition instead of
    // appending, so the sinks end exactly-once despite at-least-once
    // execution.
    val base = Files.createTempDirectory("graft_crash").toString
    val staging = s"$base/staging"
    val clean = s"$base/clean"
    val quar = s"$base/quar"
    val ckpt = s"$base/ckpt"
    import spark.implicits._
    def tx(rows: (java.lang.Long, Double, String)*) =
      rows.toSeq.toDF("CustomerID", "TotalPurchase", "ts_s")
        .select(col("CustomerID"), col("TotalPurchase"),
          col("ts_s").cast("timestamp").as("order_timestamp"))
    Sources.appendParquet(tx(
      (1L, 10.0, "2026-01-24 10:00:00"),
      (2L, 5.0, "2026-01-24 11:00:00"),
      (3L, -4.0, "2026-01-24 12:00:00")), staging)
    val pin = java.sql.Timestamp.valueOf("2026-01-24 23:00:00")
    def stream() = spark.readStream
      .schema("CustomerID LONG, TotalPurchase DOUBLE, order_timestamp TIMESTAMP")
      .parquet(staging)

    // attempt 1: the clean sink's write lands, then the batch dies before
    // the quarantine write / checkpoint commit — a mid-batch kill
    val crashedId = new java.util.concurrent.atomic.AtomicLong(-1L)
    val q1 = StreamingOps.withQualityVerdict(stream(), lit(pin)).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        crashedId.set(id)
        b.where(col("verdict") === "ok").drop("verdict")
          .withColumn("batch_id", lit(id))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(clean)
        throw new RuntimeException("injected mid-batch crash")
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination(60000); ()
    }
    assert(died.getMessage.contains("injected mid-batch crash"))
    // the crash was genuinely MID-batch: the clean sink holds the partial
    // write, the quarantine sink does not exist yet
    assert(spark.read.parquet(clean).count() === 2L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(quar)))

    // restart on the same checkpoint with the real (idempotent) router
    val replayed = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q2 = StreamingOps.withQualityVerdict(stream(), lit(pin)).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        replayed.add((id, b.count()))
        StreamingOps.routeBatch(b, id, clean, quar)
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(60000), "restarted stream did not drain")
    // (a) the uncommitted batch replayed under ITS OWN id — not a new one.
    // Asserted on DATA-BEARING batches only (r14 ADVICE): some streaming
    // runtimes append a trailing zero-row batch after AvailableNow
    // recovery, and exactly-once is a statement about contents, not about
    // the recovery's total batch count.
    import scala.jdk.CollectionConverters._
    val dataBatches = replayed.asScala.toSeq.collect { case (id, n) if n > 0 => id }
    assert(dataBatches === Seq(crashedId.get()),
      s"expected exactly one data-bearing replay of batch ${crashedId.get()}, saw $dataBatches")
    // (b) exactly-once contents: the partial partition was overwritten in
    // place — 2 clean + 1 quarantined, zero duplicates
    val cleanRows = spark.read.parquet(clean).collect()
    assert(cleanRows.length === 2 &&
      cleanRows.map(_.getAs[Long]("CustomerID")).toSet === Set(1L, 2L))
    val quarRows = spark.read.parquet(quar).collect()
    assert(quarRows.length === 1 &&
      quarRows.head.getAs[Long]("CustomerID") === 3L &&
      quarRows.head.getAs[String]("verdict") === "bad_amount")

    // a later delta on the healed checkpoint advances the batch id and
    // leaves the replayed batch's partitions untouched
    Sources.appendParquet(tx((4L, 7.0, "2026-01-24 14:00:00")), staging)
    assert(StreamingOps.routeQuality(stream(), clean, quar, ckpt, now = pin))
    val after = spark.read.parquet(clean)
    assert(after.count() === 3L)
    assert(after.where(col("batch_id") === crashedId.get()).count() === 2L)
  }

  // ---- streaming heavy hitters ---------------------------------------------

  private def hhDocs(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  /** Latest per-shard snapshot from the Update-mode emission log. */
  private def hhSnapshot(rows: Array[org.apache.spark.sql.Row]): Map[String, Long] = {
    val maxVer = rows.groupBy(_.getInt(0)).map { case (s, rs) =>
      s -> rs.map(_.getLong(1)).max
    }
    rows.filter(r => r.getLong(1) == maxVer(r.getInt(0)))
      .map(r => r.getString(2) -> r.getLong(3)).toMap
  }

  test("streaming heavy hitters: exact at ample capacity, state survives checkpoints") {
    val base = Files.createTempDirectory("graft_hh").toString
    val staging = s"$base/staging"
    Sources.appendParquet(hhDocs(Seq.fill(3)("alpha alpha beta") :+ "gamma"), staging)
    def stream() = spark.readStream.schema("doc_id LONG, text STRING").parquet(staging)
    // Update-mode memory sinks cannot recover a checkpoint — drain through
    // foreachBatch into parquet (the routeQuality sink shape) instead
    def drain(): Map[String, Long] = {
      val q = StreamingOps.streamingHeavyHitters(stream(), capacity = 64, shards = 4)
        .toDF()
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(s"$base/out"); ()
        }
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "heavy-hitter drain did not finish")
      hhSnapshot(spark.read.parquet(s"$base/out").collect())
    }
    assert(drain() === Map("alpha" -> 6L, "beta" -> 3L, "gamma" -> 1L))
    // second drain from the SAME checkpoint: only the delta is processed,
    // counters continue from stored state
    Sources.appendParquet(hhDocs(Seq("beta beta beta beta")), staging)
    assert(drain() === Map("alpha" -> 6L, "beta" -> 7L, "gamma" -> 1L))
  }

  test("streaming heavy hitters: tiny capacity keeps the Misra-Gries contract") {
    val base = Files.createTempDirectory("graft_hh2").toString
    val staging = s"$base/staging"
    // one shard so the bound is over the whole stream: N=40, capacity 2 →
    // any term with count > N/(c+1) ≈ 13.3 MUST survive; counts never
    // overestimate. "heavy" has 20, the 20 fillers are singletons.
    val fillers = (1 to 20).map(i => s"fill$i")
    Sources.appendParquet(
      hhDocs(Seq(Seq.fill(20)("heavy").mkString(" "), fillers.mkString(" "))), staging)
    val rows = StreamingOps.runAvailableNow(
      StreamingOps.streamingHeavyHitters(
        spark.readStream.schema("doc_id LONG, text STRING").parquet(staging),
        capacity = 2, shards = 1).toDF(),
      "hh_tiny", s"$base/ckpt", OutputMode.Update()).collect()
    val snap = hhSnapshot(rows)
    assert(snap.size <= 2, s"state must stay within capacity: $snap")
    assert(snap.contains("heavy"), s"no-false-negative violated: $snap")
    assert(snap("heavy") <= 20L, s"Misra-Gries must underestimate: $snap")
    assert(snap("heavy") >= 20L - 40L / 3L, s"undercount exceeds N/(c+1): $snap")
  }
}
