package graft

/** The closeout-coverage gate, automated (round 12).
  *
  * Three consecutive rounds committed a query in the round's last hours
  * that outran the manual closeout procedure (r9 q_cochran_q/q_mcnemar,
  * r10 q_rolling_anomaly/q_sax_symbols, r11 q_interarrival/
  * q_variance_ratio — the last one also missing its ORACLE, the round's
  * only red correctness row). QueriesSmokeSpec already asserts the
  * oracle invariant, but only `sbt test` runs it; the driver's own
  * Verify/Bench runs sailed past. This object runs the same checks —
  * plus the baseline-coverage twin ScalaTest never had — where the
  * driver will trip over them: a full Verify or Bench run FAILS (exit 3,
  * loud stderr) when any `SparkEntry.queries` name is missing from
  * `SparkEntry.oracleSql` or from BASELINE_VARIANCE.json.
  *
  * Escape hatches, both local-only by construction:
  *  - subset runs (Verify's 3rd arg, SPARK_GRAFT_BENCH_ONLY) skip the
  *    gate — mid-development iteration predates both the oracle's
  *    first check and the baseline refresh;
  *  - SPARK_GRAFT_REFRESH=1 skips only the BASELINE half — the 3-run
  *    closeout refresh is the thing that CREATES the baseline entries,
  *    so it cannot require them. The driver sets neither.
  */
object Gate {

  def oracleGaps: Set[String] =
    SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet

  /** The driver-owned SFs whose parquet bytes the committed envelopes were
    * measured on (tools/corpus_fp.py hashes the same set; /tmp/sf1 is
    * derived deterministically from sf0.1 so it needs no separate entry).
    */
  private val CorpusSfs = Seq("sf0.001", "sf0.01", "sf0.1")

  /** md5 per parquet under the driver-owned SFs — the JVM twin of
    * tools/corpus_fp.py fingerprint(), byte-identical keys and digests so
    * one committed CORPUS_FP.json serves both gates.
    */
  def corpusFingerprint(testdata: java.nio.file.Path): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    CorpusSfs.flatMap { sf =>
      val d = testdata.resolve(sf)
      if (!java.nio.file.Files.isDirectory(d)) Seq.empty
      else {
        val files = java.nio.file.Files.list(d)
        try files.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .toVector.sortBy(_.getFileName.toString)
          .map { p =>
            val md = java.security.MessageDigest.getInstance("MD5")
            val hex = md.digest(java.nio.file.Files.readAllBytes(p))
              .map("%02x".format(_)).mkString
            s"$sf/${p.getFileName}" -> hex
          }
        finally files.close()
      }
    }.toMap
  }

  /** Compare the live corpus against the committed fingerprint.
    * Left(reason) on an unreadable/format-drifted fingerprint file (the
    * caller must say "the file is broken", not "the corpus moved" — the
    * same misdirection rule baselineNames documents); Right(changed keys,
    * sorted) otherwise — empty means the committed envelopes are still
    * measuring the corpus they were cut on. A missing fingerprint file is
    * the CALLER's branch (warn: detection off), not an error here.
    */
  def corpusMoved(testdata: java.nio.file.Path,
                  fpFile: java.nio.file.Path): Either[String, Seq[String]] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(fpFile))
      val files = root.path("files")
      if (!files.isObject)
        Left(s"$fpFile carries no 'files' object — rerun tools/corpus_fp.py record")
      else {
        val recorded = Map.newBuilder[String, String]
        val it = files.fieldNames()
        while (it.hasNext) {
          val k = it.next(); recorded += k -> files.get(k).asText()
        }
        val rec = recorded.result()
        val cur = corpusFingerprint(testdata)
        Right((rec.keySet ++ cur.keySet).toSeq.sorted
          .filter(k => rec.get(k) != cur.get(k)))
      }
    } catch { case scala.util.control.NonFatal(e) =>
      Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }

  /** Query names present in the committed BASELINE_VARIANCE.json.
    * Left(reason) on a read/parse FAILURE — the caller must report "the
    * baseline file is broken", not "N queries lack an envelope" (the r12
    * judge note: collapsing both to Set.empty misdirects the operator
    * toward a 3-run refresh when the real problem is a corrupt file).
    * A missing file is Right(empty): genuinely zero coverage, and the
    * refresh IS the fix.
    */
  def baselineNames(path: java.nio.file.Path): Either[String, Set[String]] =
    try {
      if (!java.nio.file.Files.exists(path)) Right(Set.empty)
      else {
        val root = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(path))
        val out = Set.newBuilder[String]
        val it = root.path("queries").fieldNames()
        while (it.hasNext) out += it.next()
        Right(out.result())
      }
    } catch { case scala.util.control.NonFatal(e) =>
      Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }

  def baselineGaps(path: java.nio.file.Path): Either[String, Set[String]] =
    baselineNames(path).map(SparkEntry.queries.keySet -- _)

  /** Enforce before doing any work, so the failure is the run's FIRST
    * line, not noise after 300 query dumps.
    */
  def enforce(checkBaseline: Boolean): Unit = {
    val oracle = oracleGaps
    if (oracle.nonEmpty) {
      System.err.println(
        s"[gate] FATAL: ${oracle.size} quer${if (oracle.size == 1) "y" else "ies"} " +
          s"in SparkEntry.queries without a DuckDB oracle: " +
          oracle.toSeq.sorted.mkString(", ") +
          " — add the oracleSql entry (zero rows-only checks is a repo invariant)")
      sys.exit(3)
    }
    if (checkBaseline) {
      // corpus-regen detection FIRST (r16 verdict "next" #2): every
      // envelope checked below was measured on specific parquet bytes, and
      // the driver regenerates /root/testdata at SOME round starts (r14,
      // r15) but not others (r16) — a full gated bench on a silently-
      // regenerated corpus would adjudicate breaches against stale
      // envelopes (r14 burned a re-baseline discovering q_brier_
      // decomposition move 0.48→0.73 s purely from the data swap). The
      // refresh runs that CREATE envelopes pass checkBaseline=false and
      // are exempt, as are subset runs (which never reach enforce).
      val fpPath = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_CORPUS_FP", "CORPUS_FP.json"))
      val testdata = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_TESTDATA", "/root/testdata"))
      if (!java.nio.file.Files.exists(fpPath))
        System.err.println(
          s"[gate] WARN: no committed $fpPath — corpus-regen detection is " +
            "OFF; run tools/corpus_fp.py record on a corpus with valid " +
            "envelopes and commit it")
      else corpusMoved(testdata, fpPath) match {
        case Left(reason) =>
          System.err.println(
            s"[gate] FATAL: corpus fingerprint $fpPath exists but is " +
              s"UNREADABLE ($reason) — fix or re-record it; judging " +
              "envelope breaches without regen detection re-opens the r14 " +
              "stale-envelope trap")
          sys.exit(3)
        case Right(moved) if moved.nonEmpty =>
          System.err.println(
            s"[gate] FATAL: corpus MOVED — ${moved.size} parquet file" +
              s"${if (moved.size == 1) " differs" else "s differ"} from the " +
              s"committed $fpPath (first: ${moved.take(5).mkString(", ")})" +
              " — the committed envelopes are stale; re-cut them " +
              "(SPARK_GRAFT_REFRESH=1 triple + tools/sf1_gate.py " +
              "--refresh 3), run tools/corpus_fp.py record, and commit " +
              "BEFORE judging any breach")
          sys.exit(3)
        case _ => ()
      }
      val path = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_VARIANCE", "BASELINE_VARIANCE.json"))
      baselineGaps(path) match {
        case Left(reason) =>
          System.err.println(
            s"[gate] FATAL: baseline file $path exists but is UNREADABLE " +
              s"($reason) — fix or regenerate the file; this is NOT a " +
              "missing-envelope gap, a refresh alone won't help if the " +
              "writer is broken")
          sys.exit(3)
        case Right(base) if base.nonEmpty =>
          System.err.println(
            s"[gate] FATAL: ${base.size} quer${if (base.size == 1) "y" else "ies"} " +
              s"without a BASELINE_VARIANCE.json envelope ($path): " +
              base.toSeq.sorted.mkString(", ") +
              " — run the 3-run refresh (SPARK_GRAFT_REFRESH=1) and commit it, " +
              "or don't add the query")
          sys.exit(3)
        case _ => ()
      }
      // sf1 (10x-corpus) evidence coverage — WARN, not FATAL: the sf1 gate
      // (tools/sf1_gate.py) is an opt-in scripted run, but its baseline
      // must not silently rot as the suite evolves. A query without an sf1
      // envelope would ship on sf0.1 evidence alone — exactly how the
      // q_semdedup superlinearity almost shipped in r13.
      // Path: env-overridable like the sf0.1 half (r14 ADVICE — a driver
      // run launched outside the repo root must not read a spurious
      // "no committed file" from a CWD-relative miss).
      val sf1Path = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_SF1_VARIANCE", "BASELINE_SF1_VARIANCE.json"))
      // file-missing and parsed-but-empty are DIFFERENT states (r14
      // ADVICE, the same misdirection the baselineNames doc warns about
      // on the FATAL path): a corrupt-but-parseable file needs a writer
      // fix, not a refresh.
      baselineNames(sf1Path) match {
        case Right(sf1) if sf1.isEmpty =>
          if (java.nio.file.Files.exists(sf1Path))
            System.err.println(
              s"[gate] WARN: $sf1Path exists but carries ZERO query " +
                "envelopes — the file or its writer is broken; a refresh " +
                "alone won't help if the writer drops the 'queries' object")
          else
            System.err.println(
              s"[gate] WARN: no committed $sf1Path — the " +
                "10x-corpus gate has no envelope; run tools/sf1_gate.py " +
                "--refresh 3 and commit the result")
        case Right(sf1) =>
          val gaps = SparkEntry.queries.keySet -- sf1
          if (gaps.nonEmpty) System.err.println(
            s"[gate] WARN: ${gaps.size} quer${if (gaps.size == 1) "y" else "ies"} " +
              "without an sf1 envelope (10x-corpus gate would skip them): " +
              gaps.toSeq.sorted.mkString(", ") +
              " — re-run tools/sf1_gate.py --refresh 3")
        case Left(reason) =>
          System.err.println(
            s"[gate] WARN: $sf1Path unreadable ($reason)")
      }
    }
  }
}
