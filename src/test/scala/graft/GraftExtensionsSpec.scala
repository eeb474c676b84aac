package graft

/** The extensions hook must make every native function SQL-callable. */
class GraftExtensionsSpec extends SparkSpec {

  test("extension functions are callable from SQL") {
    val r = spark.sql(
      """SELECT hyp2f1(1.0D, 1.0D, 2.0D, 0.5D) AS h,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  simhash64('alpha beta gamma') AS s,
        |  size(minhash_sig('a b c d e f', 3, 16)) AS m,
        |  size(winnow_fp('a b c d e f g h', 3, 4)) AS w,
        |  size(shingle_hashes('a b c d e f', 3)) AS sh,
        |  graft_bucket_of(array(1.0D, 2.0D, 2.0D, 5.0D), 2.5D) AS b""".stripMargin).first()
    // hyp2f1(1,1;2;z) = -ln(1-z)/z
    assert(math.abs(r.getAs[Double]("h") - (-math.log1p(-0.5) / 0.5)) < 1e-9)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Long]("s") != 0L)
    assert(r.getAs[Int]("m") == 16)
    assert(r.getAs[Int]("w") >= 1)
    assert(r.getAs[Int]("sh") == 4) // 6 tokens → 4 distinct 3-gram shingles
    assert(r.getAs[Int]("b") == 3)  // three boundaries < 2.5, dups counted
  }

  test("simhash64 is deterministic and token-order-insensitive in aggregate sign") {
    val a = spark.sql("SELECT simhash64('the quick brown fox') AS s").first().getLong(0)
    val b = spark.sql("SELECT simhash64('the quick brown fox') AS s").first().getLong(0)
    assert(a == b)
  }
}
