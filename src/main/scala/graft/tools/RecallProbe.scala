package graft.tools

import graft.{Blocks, Sessions}
import graft.io.Sources
import graft.similarity.Ann
import graft.dedup.Dedup
import graft.operators.LlmQueries
import org.apache.spark.sql.functions._

/** One-off measurement harness for picking envelope-oracle floors: prints
  * LSH/IVF top-k recall vs brute force and minhash planted-pair recall at
  * each SF, so the contract floors in LlmQueries are set from data with
  * margin, not guessed.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Sources.table(spark, dir, "embeddings")
      val probes = emb.where(col("vec_id") < 10)
      val brute = Ann.bruteForceTopK(emb, probes, k = 5)
        .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Ann.lshTopK(emb, probes, k = 5, tables = 8, bits = 4)
        .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = Ann.ivfTopK(emb, probes, k = 5, nlist = 16, nprobe = 4)
        .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute10 = Ann.bruteForceTopK(emb, probes, k = 10)
        .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pq = Ann.pqTopK(emb, probes, k = 10, m = 16, ksub = 32)
        .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivfpq = Ann.ivfPqTopK(emb, probes, k = 10, nlist = 16, nprobe = 8,
          m = 16, ksub = 32)
        .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"$sf lsh_recall=${(brute & lsh).size.toDouble / brute.size}%.3f " +
        f"ivf_recall=${(brute & ivf).size.toDouble / brute.size}%.3f " +
        f"pq_recall@10=${(brute10 & pq).size.toDouble / brute10.size}%.3f " +
        f"ivfpq_recall@10=${(brute10 & ivfpq).size.toDouble / brute10.size}%.3f n=${brute.size}")
      Blocks.releaseAll(spark)

      val docs = Sources.table(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
      val d = LlmQueries.withPlantedNearDups(docs)
      val planted = docs.select(col("doc_id").as("doc_a"),
        (col("doc_id") + 1000000L).as("doc_b"), lit(1.0).as("est_jaccard"))
      val truth = Dedup.verifyJaccard(d, planted)
        .select("doc_a", "doc_b", "jaccard").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val found = Dedup.minhashNearDuplicates(d, threshold = 0.3)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (cut <- Seq(0.5, 0.7, 0.8)) {
        val target = truth.filter(_._2 >= cut).keySet
        val rec = if (target.isEmpty) -1.0
          else (target & found).size.toDouble / target.size
        println(f"$sf minhash planted recall@j>=$cut: $rec%.3f (n=${target.size})")
      }
      println(s"$sf jaccard dist: min=${truth.values.min}, " +
        s"frac>=0.5=${truth.values.count(_ >= 0.5).toDouble / truth.size}")
      Blocks.releaseAll(spark)

      // minhash estimator error over the LSH candidate pairs (for the
      // q_ngram_jaccard est-accuracy band)
      val errs = Dedup.verifyJaccard(d, Dedup.minhashNearDuplicates(d, threshold = 0.3))
        .select(abs(col("est_jaccard") - col("jaccard")).as("err"))
        .agg(max(col("err")), avg(col("err")), count(lit(1))).collect()(0)
      println(f"$sf minhash est err: max=${errs.getDouble(0)}%.3f " +
        f"avg=${errs.getDouble(1)}%.3f n=${errs.getLong(2)}")
      Blocks.releaseAll(spark)

      // simhash planted recall at maxHamming=3, per jaccard cut
      val simFound = Dedup.simhashNearDuplicates(d, maxHamming = 3)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (cut <- Seq(0.5, 0.7, 0.8)) {
        val target = truth.filter(_._2 >= cut).keySet
        val rec = if (target.isEmpty) -1.0
          else (target & simFound).size.toDouble / target.size
        println(f"$sf simhash planted recall@j>=$cut: $rec%.3f (n=${target.size})")
      }
      Blocks.releaseAll(spark)

      // embedding near-dup: LSH-bucketed pairs vs the exact cosine pair
      // set, restricted to the q_embed_neardup probe slice (smaller id <
      // 256) — the population the contract floor binds
      val exactPairs = Ann.bruteForcePairsAgainst(
          emb.where(col("vec_id") < 256), emb, threshold = 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (bits <- Seq(4, 6)) {
        val lshPairs = Ann.cosineNearDuplicates(emb, threshold = 0.4, tables = 8, bits = bits)
          .where(col("id_a") < 256)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val embRec = if (exactPairs.isEmpty) -1.0
          else (exactPairs & lshPairs).size.toDouble / exactPairs.size
        println(f"$sf embed_neardup bits=$bits recall=${embRec}%.3f " +
          s"(n_exact=${exactPairs.size}, n_lsh=${lshPairs.size}, sound=${lshPairs.subsetOf(exactPairs)})")
        Blocks.releaseAll(spark)
      }
    }
    spark.stop()
  }
}
