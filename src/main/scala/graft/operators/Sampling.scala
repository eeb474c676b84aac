package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling — the reproducible
  * train/val/test splitter a training-data pipeline needs at 100 TB.
  *
  * Assignment is a pure projection on md5(key): no RNG state, no seed
  * bookkeeping, no shuffle — the same row lands in the same split on any
  * cluster, under any partitioning, on any day, and new data added later
  * does not move old rows between splits (the property rand(seed) loses
  * the moment partitioning changes). This is the standard hash-mod split
  * (e.g. the public convention used for held-out web-corpus splits).
  *
  * Split boundaries are hex-string prefixes of the md5, so the comparison
  * is engine-portable string ordering; fractions are quantized to 1/16⁸
  * (error < 6e-10 of mass, noted, not hidden).
  */
object Sampling {

  /** Hex boundary string for a cumulative fraction: floor(f · 16⁸) as 8
    * lowercase hex digits — md5-prefix comparison against it selects that
    * fraction of the hash space.
    */
  private[operators] def hexBoundary(cumFrac: Double): String = {
    val v = math.min((cumFrac * 4294967296.0).toLong, 4294967295L)
    f"$v%08x"
  }

  /** Split assignment column for `key`, given (name, fraction) pairs
    * (fractions must sum to 1; the last split absorbs the remainder).
    */
  def splitColumn(key: Column, fracs: Seq[(String, Double)]): Column = {
    require(fracs.nonEmpty && math.abs(fracs.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $fracs")
    require(fracs.forall { case (_, f) => f >= 0.0 && f <= 1.0 },
      s"each split fraction must be in [0, 1]: $fracs")
    val h = md5(key.cast("string").cast("binary"))
    val cum = fracs.map(_._2).scanLeft(0.0)(_ + _).tail
    fracs.init.zip(cum.init).foldRight(lit(fracs.last._1)) {
      case (((name, _), hi), els) => when(h < lit(hexBoundary(hi)), name).otherwise(els)
    }
  }

  /** The frame with a `split` column attached. */
  def hashSplit(df: DataFrame, key: Column,
      fracs: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame =
    df.withColumn("split", splitColumn(key, fracs))

  /** Corpus mixing: keep a per-group fraction of rows (e.g. downsample
    * web crawl to 30% while keeping 100% of books), selected by the same
    * content-addressed md5 rule — deterministic, shuffle-free, and stable
    * under corpus growth. Groups absent from `weights` are dropped
    * (weight 0), the explicit reading of a mixing spec.
    */
  def weightedSample(df: DataFrame, key: Column, group: Column,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.forall { case (_, w) => w >= 0.0 && w <= 1.0 },
      s"weights must be in [0, 1]: $weights")
    val h = md5(key.cast("string").cast("binary"))
    val keep = weights.foldLeft(lit(false)) { case (els, (g, w)) =>
      // w = 1.0 means KEEP ALL — short-circuit to true rather than test
      // md5 < 'ffffffff', which would deterministically drop the ~2⁻³²
      // of rows whose hash starts with that prefix
      val cond = if (w >= 1.0) lit(true) else h < lit(hexBoundary(w))
      when(group === g, cond).otherwise(els)
    }
    df.where(keep)
  }

  /** Corpus mixing under TOKEN budgets: for each group (source), keep
    * documents in content-addressed md5 order until the group's token
    * budget is reached — the "sample N tokens of web, M tokens of books"
    * recipe every LLM data-mixing spec is written in (budgets are stated
    * in tokens, not document fractions, because document length varies by
    * orders of magnitude across sources).
    *
    * Keep rule: a document stays iff the cumulative token count of the
    * documents BEFORE it (same group, (md5, key) order) is < budget — the
    * budget is met or overshot by at most one document, and a positive
    * budget always selects at least one document (the same starting-offset
    * convention as [[graft.text.TextOps.packSequences]]). Groups without a
    * budget are dropped, like [[weightedSample]]'s weight-0 reading.
    *
    * Scale shape: the naive form — one window partitioned by the source
    * column — serializes an entire source through a single task, which is
    * exactly the skewed low-cardinality-partition trap at 100 TB. Instead
    * the running sum is split two-level by an md5-PREFIX bucket
    * (16^`bucketLen` buckets per group, hash-uniform by construction):
    *  - per-(group, bucket) token sums roll up map-side into a frame of at
    *    most groups × 16^bucketLen rows, whose per-group prefix sums are a
    *    window over that TINY frame (never the corpus);
    *  - each document's exact offset = its bucket's prefix (broadcast back)
    *    + a within-bucket window partitioned by (group, bucket) — tens of
    *    thousands of uniform partitions per group, no hot task.
    * Prefix-bucket ordering agrees with full-hash ordering because the
    * bucket IS the hash's leading hex digits, so the two-level sum equals
    * the naive global one row-for-row ([[tokenBudgetMixNaive]] is the
    * cross-check; SamplingSpec asserts equality).
    */
  def tokenBudgetMix(df: DataFrame, key: Column, group: Column, tokens: Column,
      budgets: Seq[(String, Long)], bucketLen: Int = 4): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetMix needs at least one (group, budget)")
    require(budgets.forall(_._2 >= 0L), s"budgets must be >= 0: $budgets")
    require(bucketLen >= 1 && bucketLen <= 8, s"bucketLen in [1,8]: $bucketLen")
    def budgetOf(g: Column): Column =
      budgets.foldLeft(lit(null).cast("long")) { case (els, (name, b)) =>
        when(g === name, lit(b)).otherwise(els)
      }
    val cols = df.columns.map(col).toIndexedSeq
    val wide = df
      .withColumn("__grp", group)
      .withColumn("__k", key)
      .withColumn("__h", md5(key.cast("string").cast("binary")))
      .withColumn("__tok", tokens.cast("long"))
      .where(budgetOf(col("__grp")).isNotNull)
      .withColumn("__bkt", substring(col("__h"), 1, bucketLen))
    // bucket-level prefix sums: ≤ |groups| · 16^bucketLen rows total —
    // the ONLY per-group-ordered window runs over this bounded frame
    val bktPrefix = wide.groupBy("__grp", "__bkt")
      .agg(sum(col("__tok")).as("__bt"))
      .withColumn("__bcum", coalesce(
        sum(col("__bt")).over(Window.partitionBy("__grp").orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__grp", "__bkt", "__bcum")
    // within-bucket exact offsets: hash-uniform (group, bucket) partitions
    val wLocal = Window.partitionBy("__grp", "__bkt").orderBy("__h", "__k")
      .rowsBetween(Window.unboundedPreceding, -1)
    wide
      .join(broadcast(bktPrefix), Seq("__grp", "__bkt"))
      .withColumn("cum_tokens_before",
        col("__bcum") + coalesce(sum(col("__tok")).over(wLocal), lit(0L)))
      .where(col("cum_tokens_before") < budgetOf(col("__grp")))
      .select(cols :+ col("cum_tokens_before"): _*)
  }

  /** Reference formulation of [[tokenBudgetMix]]: one window partitioned by
    * the group column — correct, and the exact skew trap the two-level form
    * avoids (a whole source streams through one task). Kept as the
    * equivalence cross-check, not the production path.
    */
  private[graft] def tokenBudgetMixNaive(df: DataFrame, key: Column, group: Column,
      tokens: Column, budgets: Seq[(String, Long)]): DataFrame = {
    def budgetOf(g: Column): Column =
      budgets.foldLeft(lit(null).cast("long")) { case (els, (name, b)) =>
        when(g === name, lit(b)).otherwise(els)
      }
    val cols = df.columns.map(col).toIndexedSeq
    val w = Window.partitionBy("__grp").orderBy("__h", "__k")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__grp", group)
      .withColumn("__k", key)
      .withColumn("__h", md5(key.cast("string").cast("binary")))
      .withColumn("__tok", tokens.cast("long"))
      .where(budgetOf(col("__grp")).isNotNull)
      .withColumn("cum_tokens_before", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .where(col("cum_tokens_before") < budgetOf(col("__grp")))
      .select(cols :+ col("cum_tokens_before"): _*)
  }
}
