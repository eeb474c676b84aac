package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
