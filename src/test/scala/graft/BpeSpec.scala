package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Semantic oracle for the rows-only t17_bpe_train key: the
  * distributed BPE trainer is pinned against an independent,
  * straight-line Scala reference implementation on planted fixtures
  * (the Sennrich et al. 2016 walkthrough corpus), plus encode
  * round-trips and a determinism re-run. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference implementation (driver-side, test-only)

  private def refApply(seq: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < seq.length) {
      if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += seq(i); i += 1 }
    }
    b.result()
  }

  private def refTrain(wordCounts: Map[String, Long], merges: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> c
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    while (rank < merges) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((seq, c) <- vocab; i <- 0 until seq.length - 1)
        pairs((seq(i), seq(i + 1))) += c
      if (pairs.isEmpty) return out.toSeq
      val ((l, r), n) = pairs.toSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }.head
      rank += 1
      out += ((rank, l, r, n))
      vocab = vocab.toSeq
        .map { case (seq, c) => (refApply(seq, l, r), c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
    }
    out.toSeq
  }

  private def refEncode(w: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(w.map(_.toString).toVector :+ Bpe.EndOfWord) {
      case (s, (l, r)) => refApply(s, l, r)
    }

  // ---- fixtures

  /** The classic walkthrough corpus: low×5 lower×2 newest×6 widest×3,
    * one word per row (word frequency = row multiplicity). */
  private lazy val corpus = {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
  }
  private lazy val wordCounts: Map[String, Long] =
    Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("train matches the reference implementation on the Sennrich corpus") {
    val got = Bpe.train(corpus, "text", 8)
      .as[(Int, String, String, Long)].collect().toSeq
    val want = refTrain(wordCounts, 8)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // sanity on the well-known walkthrough: 'es' ('e','s') with count
    // 9 (newest 6 + widest 3) is the first merge
    assert(got.head == ((1, "e", "s", 9L)), got.head)
  }

  test("multi-word rows count every token, weighted by frequency") {
    val df = Seq((0L, "aa aa ab"), (1L, "aa ab ab")).toDF("id", "text")
    val got = Bpe.train(df, "text", 3)
      .as[(Int, String, String, Long)].collect().toSeq
    val want = refTrain(Map("aa" -> 3L, "ab" -> 3L), 3)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("train stops early when no adjacent pair remains") {
    // single-char word: symbols = [c, </w>] — one pair, then the
    // merged singleton has no pairs left
    val df = Seq((0L, "c")).toDF("id", "text")
    val got = Bpe.train(df, "text", 10)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "c", Bpe.EndOfWord, 1L)), got)
  }

  test("encode applies the merge table in rank order, per word") {
    val merges = refTrain(wordCounts, 8).map { case (_, l, r, _) => (l, r) }
    val got = corpus.select(col("text"),
        Bpe.encode(col("text"), merges).as("toks"))
      .distinct().as[(String, Seq[String])].collect().toMap
    for ((w, _) <- wordCounts)
      assert(got(w) == refEncode(w, merges), s"$w → ${got(w)}")
    // multi-word text flattens per-word tokenizations in order
    val two = Seq((0L, "low newest")).toDF("id", "text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .as[Seq[String]].head()
    assert(two == (refEncode("low", merges) ++ refEncode("newest", merges)).toSeq)
  }

  test("encode kernel is bit-for-bit the composed fold form (incl. corpus text)") {
    val merges = refTrain(wordCounts, 8).map { case (_, l, r, _) => (l, r) }
    val fixtures = corpus.select(col("text"))
      .union(Seq("", "  double  spaces ", "solo", "héllo wörld ée")
        .toDF("text"))
    val real = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      .documents.select(col("text")).limit(50)
    for (df <- Seq(fixtures, real)) {
      val rows = df.select(
          Bpe.encode(col("text"), merges).as("k"),
          Bpe.encodeComposed(col("text"), merges).as("c"))
        .as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (k, c) => assert(k == c, s"kernel $k vs composed $c") }
    }
  }

  test("train is deterministic across runs") {
    val a = Bpe.train(corpus, "text", 6)
      .as[(Int, String, String, Long)].collect().toSeq
    val b = Bpe.train(corpus, "text", 6)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(a == b)
  }

  test("corpus encode round-trips: tokens rebuild the words (t18 shape)") {
    val docs = Seq((1L, "low lower newest"), (2L, "wider low new"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 8)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map { case (_, l, r, _) => (l, r) }.toSeq
    val got = docs.select(col("doc_id"),
        Bpe.encode(col("text"), merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    // stripping the end-of-word markers and joining restores the text
    def rebuild(toks: Seq[String]): String =
      toks.mkString.replace(Bpe.EndOfWord, " ").trim
    assert(rebuild(got(1L)) == "low lower newest")
    assert(rebuild(got(2L)) == "wider low new")
    // each word's tokenization ends exactly at a </w> boundary
    assert(got.values.forall(_.forall(t => !t.contains(" "))))
  }
}
