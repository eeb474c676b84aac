package graft.text

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringSimilaritySpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler matches the published worked example") {
    // Winkler 1990's canonical pair: jaro 17/18, prefix 3 → 0.9611…
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
  }

  test("jaro-winkler edge cases") {
    assert(jw("", "") === 1.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("same", "same") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
  }

  test("odd out-of-order count floors the transposition (DuckDB parity)") {
    // 4 matches, 3 out-of-order → 1 transposition (not 1.5): DuckDB's
    // jaro_winkler_similarity('hot gear','large plate') = 71/132
    assert(math.abs(jw("hot gear", "large plate") - 0.537878787878788) < 1e-12)
  }

  test("winkler boost gates at jaro 0.7 — no boost below") {
    // jaro = 0.5 with a 2-char common prefix: boosted would be 0.6
    assert(jw("abcdefgh", "abzzzzzz") === 0.5)
  }

  test("symmetry") {
    for ((a, b) <- Seq(("hot gear", "large plate"), ("martha", "marhta"),
        ("large widget", "large bolt"), ("x", "xy"))) {
      assert(jw(a, b) === jw(b, a))
    }
  }

  test("codegen path agrees with the kernel") {
    StringSimilarity.register(spark)
    import spark.implicits._
    val pairs = Seq(("martha", "marhta"), ("hot gear", "large plate"),
      ("cold widget", "cold widget"), ("", "x")).toDF("a", "b")
    val rows = pairs
      .select(col("a"), col("b"), call_function("jaro_winkler", col("a"), col("b")).as("jw"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(2) === jw(r.getString(0), r.getString(1)))
    }
  }

  test("record linkage query: window-only plan, threshold from rounded score") {
    val df = SparkEntry.queries("q_record_linkage")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // blocked linkage is ONE shuffle on the blocking key + the final sort —
    // scoring must never become a join
    assert(!plan.contains("Join"), s"linkage regressed to a join:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 2,
      s"unexpected extra shuffle:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getLong(3) === (if (s >= 0.85) 1L else 0L))
    }
  }
}
