package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.RangeJoin

/** Property-based checks: ScalaCheck generators driven with fixed
  * seeds (deterministic CI), randomized inputs compared against
  * independent reference computations. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  private val intervalsGen: Gen[List[(Long, Double, Double)]] =
    Gen.listOfN(12, for {
      lo <- Gen.choose(0.0, 90.0)
      w <- Gen.choose(0.0, 15.0)
    } yield (lo, lo + w)).map(_.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) })

  private val pointsGen: Gen[List[(Long, Double)]] =
    Gen.listOfN(40, Gen.choose(-5.0, 110.0))
      .map(_.zipWithIndex.map { case (v, i) => (i.toLong, v) })

  test("range join equals the nested-loop reference on random inputs") {
    for (round <- 0 until 8) {
      val ivs = sample(intervalsGen, 100 + round)
      val pts = sample(pointsGen, 200 + round)
      val binSize = Seq(0.5, 3.0, 17.0)(round % 3)
      val expect = (for {
        (pid, v) <- pts
        (bid, lo, hi) <- ivs
        if v >= lo && v < hi
      } yield (pid, bid)).toSet
      val got = RangeJoin.pointInInterval(
          pts.toDF("point_id", "v"), "v",
          ivs.toDF("band_id", "lo", "hi"), "lo", "hi", binSize)
        .select("point_id", "band_id").as[(Long, Long)].collect().toSet
      assert(got == expect, s"round=$round binSize=$binSize")
    }
  }

  test("minhash signature agreement estimates true token-set jaccard") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val vocabGen = Gen.listOfN(40, Gen.choose(0, 25).map(i => s"w$i"))
    for (round <- 0 until 6) {
      val a = sample(vocabGen, 300 + round)
      val b = sample(vocabGen, 400 + round)
      val trueJ = {
        val (sa, sb) = (a.toSet, b.toSet)
        sa.intersect(sb).size.toDouble / sa.union(sb).size
      }
      val Seq(ma, mb) = Seq(a, b).map { toks =>
        Seq(Tuple1(toks)).toDF("t")
          .select(call_function("minhash64", col("t"), lit(128)).as("m"))
          .as[Array[Long]].head()
      }
      val est = ma.zip(mb).count { case (x, y) => x == y }.toDouble / 128
      // 128 hashes → stderr ≈ sqrt(J(1-J)/128) ≤ 0.045; 4σ bound
      assert(math.abs(est - trueJ) <= 0.18,
        f"round=$round est=$est%.3f true=$trueJ%.3f")
    }
  }

  // --- ChSql pass-through: plain Spark SQL from a generated grammar
  // must come back byte-identical (the tokenizer carries whitespace;
  // no rewrite may fire without a CH-only construct) ---
  private val identGen: Gen[String] =
    Gen.chooseNum(0, 25).map(i => s"col_$i")
  private val litGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0, 9999).map(_.toString),
    Gen.chooseNum(0, 99).map(n => s"$n.5"),
    // string literals deliberately CONTAINING clause keywords
    Gen.oneOf("'PREWHERE x'", "'SAMPLE 0.5 BY k'", "'ARRAY JOIN a AS b'",
      "'WITH FILL FROM 1'", "'FINAL'", "'a  ||  b'"))
  private val exprGen: Gen[String] = for {
    a <- identGen; b <- litGen
    op <- Gen.oneOf("=", ">=", "<=", "<>", "+", "*", "||")
  } yield s"$a $op $b"
  private val queryGen: Gen[String] = for {
    cols <- Gen.nonEmptyListOf(identGen).map(_.take(4).distinct)
    tbl <- Gen.oneOf("t", "db.t2", "(SELECT * FROM u) v")
    cond <- exprGen
    ord <- identGen
    lim <- Gen.chooseNum(1, 500)
  } yield s"SELECT ${cols.mkString(", ")} FROM $tbl WHERE $cond GROUP BY ${cols.mkString(", ")} ORDER BY $ord LIMIT $lim"

  test("ChSql.translate is the identity on generated plain Spark SQL") {
    for (round <- 0 until 200) {
      val q = sample(queryGen, 3000 + round)
      assert(graft.functions.ChSql.translate(q) == q, q)
    }
  }
}
