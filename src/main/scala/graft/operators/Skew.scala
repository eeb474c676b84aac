package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling: two-phase salted aggregation.
  *
  * Spark's map-side partial aggregation already absorbs most heavy-key agg
  * skew; salting matters when partial aggregation can't compress — distinct
  * accumulators, collect-style aggregates, or extreme single-key skew where
  * even the combined partials overload one reducer. The pattern: scatter
  * each key across `salts` sub-keys, aggregate partials per (key, salt),
  * then merge partials per key. Both phases are hash aggregations; the
  * first shuffle spreads a hot key over `salts` reducers.
  *
  * Supported merge-able aggregates: sum, count, min, max, avg (decomposed
  * into sum+count and finalized after the merge).
  */
object Skew {

  final case class AggSpec(func: String, column: String, alias: String)

  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
      aggs: Seq[AggSpec]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong))

    def partial(a: AggSpec): Seq[Column] = a.func match {
      case "sum"   => Seq(sum(col(a.column)).as(s"__p_sum_${a.alias}"))
      case "count" => Seq(count(col(a.column)).as(s"__p_cnt_${a.alias}"))
      case "min"   => Seq(min(col(a.column)).as(s"__p_min_${a.alias}"))
      case "max"   => Seq(max(col(a.column)).as(s"__p_max_${a.alias}"))
      case "avg"   => Seq(sum(col(a.column)).as(s"__p_sum_${a.alias}"),
        count(col(a.column)).as(s"__p_cnt_${a.alias}"))
      case other   => throw new IllegalArgumentException(
        s"saltedAggregate: '$other' is not a mergeable aggregate")
    }

    def merge(a: AggSpec): Column = a.func match {
      case "sum"   => sum(col(s"__p_sum_${a.alias}")).as(a.alias)
      case "count" => sum(col(s"__p_cnt_${a.alias}")).as(a.alias)
      case "min"   => min(col(s"__p_min_${a.alias}")).as(a.alias)
      case "max"   => max(col(s"__p_max_${a.alias}")).as(a.alias)
      case "avg"   => (sum(col(s"__p_sum_${a.alias}")) /
        sum(col(s"__p_cnt_${a.alias}"))).as(a.alias)
    }

    val partialCols = aggs.flatMap(partial)
    val phase1 = df
      .withColumn("__salt", salt)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merge(aggs.head), aggs.tail.map(merge): _*)
  }

  /** Salted equi-join for a skewed LARGE side: scatter each large-side row
    * into one of `salts` sub-keys, replicate the small side across all of
    * them, and equi-join on (key, salt) — a hot key's rows spread over
    * `salts` reducers instead of hammering one. The result is EXACTLY the
    * plain inner join (salting is invisible in the output), which is what
    * the oracle verifies. Replication multiplies the small side ×salts —
    * use when the small side is modest but (unlike a broadcastable dim)
    * not tiny, and AQE's skew splitting isn't available (e.g. the join
    * feeds a co-partitioned downstream op).
    *
    * The salt hashes a per-row id, NOT the row content: a hot key made of
    * EXACT-duplicate rows (the common skew shape in a dedup corpus) would
    * content-hash to a single salt and silently defeat the mitigation.
    * The id is partition-dependent, which is fine — the salt is invisible
    * in the output (same scheme as saltedAggregate).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
