package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, SimHashImpl}

/** SimHash64 native expression vs an independent straightforward
  * reimplementation, under both codegen and interpreted evaluation. */
class SimHashSpec extends SparkSpec {

  /** Plain-Scala reference: no ArrayData, no shared helpers beyond
    * MessageDigest itself. */
  private def referenceSimHash(tokensRaw: Seq[String]): Long = {
    val tokens = tokensRaw.filter(_.nonEmpty) // contract: empty tokens ignored
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val d = md.digest(t.getBytes("UTF-8"))
      val h = java.nio.ByteBuffer.wrap(d, 0, 8).getLong
      (0 until 64).foreach { b =>
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
      }
    }
    (0 until 64).foldLeft(0L) { (out, b) => if (acc(b) > 0) out | (1L << b) else out }
  }

  private val samples: Seq[Seq[String]] = Seq(
    Seq("the", "quick", "brown", "fox"),
    Seq("the", "quick", "brown", "fox", "fox", "fox"),
    Seq("completely", "different", "words", "here"),
    Seq("a"),
    Seq("a", "", "b"), // empty tokens skipped (raw split() friendliness)
    Seq.empty[String])

  test("expression matches independent reimplementation (codegen on and off)") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      val got = samples.toDF("toks")
        .select(call_function("simhash64", col("toks")).as("h"))
        .as[Long].collect().toSeq
      assert(got == samples.map(referenceSimHash),
        s"mismatch with wholeStage codegen=$codegen")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("near-duplicate token lists land at small Hamming distance") {
    val base = (1 to 60).map(i => s"tok$i")
    val nearDup = base.updated(5, "changed") :+ "extra"
    val far = (1 to 60).map(i => s"other$i")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (hBase, hNear, hFar) =
      (referenceSimHash(base), referenceSimHash(nearDup), referenceSimHash(far))
    assert(ham(hBase, hNear) < 12, s"near-dup distance ${ham(hBase, hNear)}")
    assert(ham(hBase, hFar) > 16, s"unrelated distance ${ham(hBase, hFar)}")
  }

  test("null tokens are skipped; null array yields null") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val withNullTok = Seq((1, Seq[String]("a", null, "b"))).toDF("id", "toks")
      .select(call_function("simhash64", col("toks")).as("h")).as[Long].head()
    assert(withNullTok == referenceSimHash(Seq("a", "b")))
    val nullArr = Seq((1, Option.empty[Seq[String]])).toDF("id", "toks")
      .select(call_function("simhash64", col("toks")).as("h"))
      .collect().head
    assert(nullArr.isNullAt(0))
  }

  test("impl helper agrees with DuckDB-portable md5 prefix convention") {
    // '0x' + first 16 hex chars of md5("hello") must equal the long we
    // compute — the property the f09/d03 oracles rely on.
    val h = SimHashImpl.md5First8("hello".getBytes("UTF-8"))
    assert(f"$h%016x" == "5d41402abc4b2a76") // md5("hello") prefix
  }
}
