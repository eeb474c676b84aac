package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {

  test("classifies insert/delete/update, drops unchanged, null-safe compare") {
    import spark.implicits._
    val base = Seq(
      (1L, Some(10.0)), // unchanged
      (2L, Some(20.0)), // updated value
      (3L, Some(30.0)), // deleted
      (4L, None),       // null → null: unchanged
      (5L, None)        // null → value: update
    ).toDF("k", "v")
    val next = Seq(
      (1L, Some(10.0)),
      (2L, Some(21.0)),
      (4L, None),
      (5L, Some(5.5)),
      (6L, Some(60.0)) // inserted
    ).toDF("k", "v")
    val out = SnapshotDiff.diff(base, next, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "update", 3L -> "delete", 5L -> "update", 6L -> "insert"),
      s"got $out")
  }

  test("explicit compareCols restrict which changes count") {
    import spark.implicits._
    val base = Seq((1L, 10.0, "a")).toDF("k", "v", "tag")
    val next = Seq((1L, 10.0, "b")).toDF("k", "v", "tag")
    // comparing only v: the tag change is invisible → no diff rows
    assert(SnapshotDiff.diff(base, next, Seq("k"), Seq("v")).count() == 0L)
    // default compares all shared non-key cols → tag change surfaces
    val all = SnapshotDiff.diff(base, next, Seq("k")).collect()
    assert(all.length == 1 && all(0).getString(1) == "update")
  }
}
