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
}
