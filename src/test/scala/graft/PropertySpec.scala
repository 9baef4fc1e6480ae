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

  test("piiRedact is idempotent and leaves no matchable PII behind") {
    import org.apache.spark.sql.functions._
    import graft.operators.Text
    val wordGen = Gen.oneOf("alpha", "beta", "x1", "2.5", "a@b", "+12", "末")
    val piiGen = Gen.oneOf(
      Gen.const("bob.smith+x@mail-host.example.org"),
      Gen.const("10.42.0.255"),
      Gen.const("+14155550123"))
    val docGen = Gen.listOfN(14, Gen.frequency(4 -> wordGen, 1 -> piiGen))
      .map(_.mkString(" "))
    val docs = (0 until 60).map(i => (i.toLong, sample(docGen, 5000 + i)))
      .toDF("id", "t")
    val out = docs.select(
        Text.piiRedact(col("t")).as("once"),
        Text.piiRedact(Text.piiRedact(col("t"))).as("twice"),
        Text.piiCounts(Text.piiRedact(col("t")))
          .map(_._2).reduce(_ + _).as("left_over"))
      .collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(1), "redaction must be idempotent")
      assert(r.getInt(2) == 0, s"redacted text still matches PII: ${r.getString(0)}")
    }
  }

  test("IPv4NumToString/IPv4StringToNum roundtrip on random UInt32s") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val ns = (0 until 200).map(i =>
      sample(Gen.chooseNum(0L, 4294967295L), 7000 + i))
    val got = ns.toDF("n").createOrReplaceTempView("zprop_ips")
    val back = spark.sql(
      """SELECT n, IPv4StringToNum(IPv4NumToString(n)) AS back,
        |       isIPv4String(IPv4NumToString(n)) AS ok
        |FROM zprop_ips""".stripMargin).collect()
    back.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"roundtrip broke for ${r.getLong(0)}")
      assert(r.getBoolean(2))
    }
  }

  test("native array kernels equal reference computations on random arrays") {
    // cumsum/difference/product vs plain Scala folds, including nulls
    // (cumsum poisons the suffix; difference nulls both neighbors;
    // product goes null on any null element) and empties
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val arrGen: Gen[List[Option[Int]]] = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        9 -> Gen.choose(-50, 50).map(Some(_)), 1 -> Gen.const(None))))
    for (round <- 0 until 10) {
      val a = sample(arrGen, 500 + round)
      val row = Seq(Tuple1(a)).toDF("a").select(
        expr("arrayCumSum(a)").as("cum"),
        expr("arrayDifference(a)").as("diff"),
        expr("arrayProduct(a)").as("prod"),
        expr("arrayCompact(a)").as("compact")).head()
      val expCum = a.scanLeft(Option(0.0)) {
        case (acc, x) => for (p <- acc; v <- x) yield p + v
      }.tail.foldLeft((List.empty[Option[Double]], false)) {
        case ((out, poisoned), s) =>
          if (poisoned || s.isEmpty) (out :+ None, true) else (out :+ s, false)
      }._1
      val expDiff = a.indices.toList.map { i =>
        if (i == 0) Some(0.0)
        else for (x <- a(i); p <- a(i - 1)) yield (x - p).toDouble
      }
      val expProd =
        if (a.exists(_.isEmpty)) None
        else Some(a.flatten.foldLeft(1.0)(_ * _))
      val expCompact = a.foldLeft(List.empty[Option[Int]]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == x) acc else acc :+ x
      }
      def seqOf(name: String): Seq[Option[Any]] =
        Option(row.getSeq[Any](row.fieldIndex(name)))
          .map(_.map(Option(_))).getOrElse(Nil)
      assert(seqOf("cum") == expCum.map(_.map(identity[Any])), s"cum round=$round a=$a")
      assert(seqOf("diff") == expDiff.map(_.map(identity[Any])), s"diff round=$round a=$a")
      assert(Option(row.get(row.fieldIndex("prod"))) == expProd.map(identity[Any]),
        s"prod round=$round a=$a")
      assert(seqOf("compact") == expCompact.map(_.map(identity[Any])),
        s"compact round=$round a=$a")
    }
  }

  test("reservoir quantile is interpolated-exact below the cap on random partitioned inputs") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val valsGen = for {
      n <- Gen.choose(1, 3000)
      vs <- Gen.listOfN(n, Gen.choose(-1e6, 1e6))
    } yield vs
    for (round <- 0 until 6) {
      val vs = sample(valsGen, 4200 + round)
      val q = Seq(0.01, 0.25, 0.5, 0.77, 0.99, 1.0)(round)
      val parts = 1 + round % 7
      vs.toDF("v").repartition(parts).createOrReplaceTempView("prop_rq")
      val got = spark.sql(graft.functions.ChSql.translate(
        s"SELECT quantile($q)(v) AS x FROM prop_rq")).head().getDouble(0)
      val sorted = vs.sorted
      val index = q * (vs.size - 1)
      val left = index.toInt; val right = left + 1
      val expect =
        if (right >= vs.size) sorted(vs.size - 1)
        else sorted(left) * (right - index) + sorted(right) * (index - left)
      assert(got == expect, s"round=$round q=$q n=${vs.size} parts=$parts")
    }
  }

  test("seq_match_gap kernel equals the composed fold on random event streams") {
    import org.apache.spark.sql.functions._
    import graft.operators.Behavior
    // random users, random timestamps WITH collisions, random 3-type
    // labels — the adversarial surface for tie handling and the l2
    // fallback the planted fixtures can only sample
    val evGen = Gen.listOfN(300, for {
      u <- Gen.choose(1L, 12L)
      t <- Gen.choose(0L, 40L) // dense: many exact ties
      e <- Gen.oneOf("A", "B", "C", "X")
    } yield (u, t, e))
    val conds = Seq(col("event_type") === "A", col("event_type") === "B",
      col("event_type") === "C")
    for (round <- 0 until 5) {
      val rows = sample(evGen, 7100 + round)
      val gap = Seq(1L, 3L, 7L, 15L, 40L)(round)
      val df = rows.toDF("user_id", "us", "event_type")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
          col("event_type"))
      val kern = Behavior.sequenceMatch(df, "user_id", col("ts"), conds,
          gapMicros = Some(gap))
        .orderBy("user_id").as[(Long, Int)].collect().toSeq
      val comp = Behavior.sequenceMatchGapComposed(df, "user_id",
          col("ts"), conds, gap)
        .orderBy("user_id").as[(Long, Int)].collect().toSeq
      assert(kern == comp, s"round=$round gap=$gap")
    }
  }
}
