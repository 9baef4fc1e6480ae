package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse relational operators Spark lacks as built-ins, composed
  * from declarative plans (never driver-side loops) so Catalyst/AQE
  * keep optimizing them.
  */

/** `LIMIT n BY expr` (reference: src/Parsers/ASTSelectQuery.h:30-32):
  * keep first n rows per group in a given order. BY keys are often
  * low-cardinality (statuses, sources), so a single window would sort
  * whole groups on one task each. Two-phase top-n instead: phase 1
  * ranks locally per (group, input partition) — a row's local rank
  * bounds its group rank, so every true top-n row survives — then
  * phase 2 ranks only the ≤ n × partitions survivors per group. The
  * `order` must be a total order for a deterministic result (same
  * contract as the single-window plan).
  */
object LimitBy {
  def apply(df: DataFrame, n: Int, by: Seq[Column], order: Seq[Column]): DataFrame = {
    val local = Window.partitionBy(by :+ col("__pid"): _*).orderBy(order: _*)
    val global = Window.partitionBy(by: _*).orderBy(order: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(local))
      .filter(col("__lrn") <= n)
      .withColumn("__rn", row_number().over(global))
      .filter(col("__rn") <= n)
      .drop("__pid", "__lrn", "__rn")
  }
}

/** ASOF JOIN (reference: src/Parsers/ASTTablesInSelectQuery.h:82 —
  * Strictness::Asof): for each left row, the latest right row with
  * rightTime <= leftTime within the same key (backward, the default),
  * or with `forward = true` the EARLIEST right row with
  * rightTime >= leftTime (ClickHouse ASOF's `>=` inequality).
  * `strict = true` makes the bound EXCLUSIVE (`>` / `<` — the
  * reference's Strictness::Asof admits both); `inner = true` drops
  * left rows with no match (bare `ASOF JOIN`; the default keeps them
  * with null right columns, `ASOF LEFT JOIN`).
  *
  * Implemented as the union+last-value trick: tag both sides, sort by
  * (key, time, side) once, and carry the most recent right payload
  * forward with a running `last(ignoreNulls)` window — for the
  * forward direction the SAME plan traverses time descending, so the
  * carried payload is the minimum rightTime ≥ leftTime. Cost is ONE
  * shuffle on the key + a per-partition sort — no range cross-join, so
  * it scales linearly and never materializes candidate pairs (the
  * naive time-range join is O(|L|·|R|) per key and dies at 100 TB).
  */
object AsOfJoin {
  def apply(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightCols: Seq[String], forward: Boolean = false,
      strict: Boolean = false, inner: Boolean = false): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    val rTagged = right
      .select((col(rightTime).as("__t") +: col(key).as(key) +:
        Seq(struct(rightCols.map(col): _*).as("__payload"))): _*)
      .withColumn("__side", lit(0))
    val lCols = left.columns
    val unioned = lTagged.select(
        (lCols.map(col) :+ col("__t") :+ col("__side") :+ col("__payload")): _*)
      .unionByName(
        rTagged.select(
          (lCols.map(c => if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) :+
            col("__t") :+ col("__side") :+ col("__payload")): _*))
    // right rows (side=0) sort before a left row at the same timestamp
    // in traversal order → inclusive semantics in both directions
    // (ClickHouse ASOF `<=` / `>=`); with `strict` the side order
    // flips, so an equal-timestamp right row sorts AFTER the left row
    // and falls outside its window prefix (`<` / `>`). __payload as
    // the final sort key makes ties among right rows that share
    // (key, ts) deterministic: last() then always picks the max-struct
    // payload instead of a partition-order-dependent one.
    val timeOrd = if (forward) col("__t").desc else col("__t").asc
    val sideOrd = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(key).orderBy(timeOrd, sideOrd, col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__match", last("__payload", ignoreNulls = true).over(w))
    val lefts = filled.filter(col("__side") === 1)
    val matched = if (inner) lefts.filter(col("__match").isNotNull) else lefts
    matched.select(
      (lCols.map(col) ++ rightCols.map(c => col(s"__match.$c").as(c))): _*)
  }
}

/** ORDER BY ... WITH FILL (reference: src/Parsers/ASTOrderByElement.h):
  * densify an ordered axis by generating the missing steps. The spine
  * is built from a 1-row min/max aggregate crossed with sequence().
  *
  * Scale note: WITH FILL applies to the POST-aggregation axis (one row
  * per distinct axis value), so both join sides here are
  * dimension-sized by construction — the fill join never touches the
  * fact table. Spark cannot broadcast the preserved side of an outer
  * join (BHJ builds the non-preserved side only), so this is a plain
  * join of two axis-sized inputs; AQE turns it into a local join.
  */
object WithFill {
  /** Fill missing days between min and max of a date column. */
  def fillDays(df: DataFrame, dateCol: String): DataFrame = {
    val mm = df.agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
    val spine = mm.select(
      explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day"))).as(dateCol))
    spine.join(df, Seq(dateCol), "left")
  }

  /** WITH FILL … INTERPOLATE (reference: ASTOrderByElement's
    * interpolate list): carry the last seen value forward across the
    * filled axis. The carry is inherently sequential, but a global
    * ordered window is the one plan shape this repo bans — instead:
    * per-MONTH windows compute the within-month carry (partitioned),
    * a month-level relation (one row per month, dimension-sized by
    * construction) resolves each month's carry-in with the same tiny
    * self-join trick as Ntile's rank offsets, and the two compose with
    * one coalesce. */
  def interpolated(
      df: DataFrame, dateCol: String, valueCol: String, out: String): DataFrame = {
    val wIn = Window.partitionBy("__m").orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = df
      .withColumn("__m", date_trunc("month", col(dateCol)))
      .withColumn("__in", last(col(valueCol), ignoreNulls = true).over(wIn))
    // month-end carry per month = __in at the month's max date (may be
    // null for months with no values at all)
    val monthLast = withIn.groupBy("__m")
      .agg(max(struct(col(dateCol), col("__in"))).getField("__in").as("__v"))
    // carry-in(m) = latest non-null month-end carry among months < m
    val prior = monthLast.where(col("__v").isNotNull)
      .select(col("__m").as("__pm"), col("__v").as("__pv"))
    val carryIn = monthLast.join(prior, col("__pm") < col("__m"), "left")
      .groupBy("__m")
      .agg(max(struct(col("__pm"), col("__pv"))).getField("__pv").as("__carry_in"))
    withIn.join(broadcast(carryIn), "__m")
      .withColumn(out, coalesce(col("__in"), col("__carry_in")))
      .drop("__m", "__in", "__carry_in")
  }
}

/** SAMPLE k (reference: src/Parsers/ASTSampleRatio.h). ClickHouse
  * samples deterministically on the table's sampling key; we do the
  * same with a mod-filter on the key so results are reproducible
  * across engines and cluster sizes (TABLESAMPLE is
  * partition-layout-dependent; a key-hash filter is not).
  *
  * IO honesty: `byKeyMod` and `byHashRange` are CPU-deterministic but
  * IO-full — computed expressions are not pushable parquet predicates,
  * so a 10% sample still scans 100% of the table. ClickHouse reads ~k
  * of the granules because MergeTree data is physically ORDERED by
  * intHash(sampling key); the Spark analog is `byStoredHashRange` over
  * a table that persists the key hash and is written sorted by it: the
  * plain range predicate on the stored column pushes down, row groups
  * outside the range are skipped, and IO is proportional to the
  * sampled fraction. Use byKeyMod/byHashRange when the input layout is
  * unknown; lay out hash-sorted tables for sampling-heavy workloads.
  */
object Sample {
  def byKeyMod(df: DataFrame, key: String, mod: Int, keep: Int = 0): DataFrame =
    df.filter(pmod(col(key), lit(mod)) === keep)

  private def hashCut(frac: Double): Long =
    (Long.MinValue + (frac * 2.0 * Long.MaxValue)).toLong

  /** Unbiased fraction-sample on a COMPUTED key hash. Deterministic
    * and layout-independent, but the hash is evaluated per row — like
    * byKeyMod this is CPU-bound, IO-full (a computed expression is
    * not a pushable parquet predicate). */
  def byHashRange(df: DataFrame, key: String, frac: Double): DataFrame =
    df.filter(xxhash64(col(key)) <= lit(hashCut(frac)))

  /** The IO-pruned path: sample on a PERSISTED hash column of a table
    * physically sorted by it (the MergeTree sampling-key layout). The
    * plain range predicate on the stored column pushes to the scan, so
    * row groups outside the range are skipped and bytes read scale
    * with `frac` — asserted in PlanAuditSpec. */
  def byStoredHashRange(df: DataFrame, hashCol: String, frac: Double): DataFrame =
    df.filter(col(hashCol) <= lit(hashCut(frac)))

  /** Portable multiplicative key hash (Knuth's 2654435761 mod 2^32):
    * weaker mixing than xxhash64 but reproducible in ANY engine with
    * 64-bit integer arithmetic — the DuckDB oracle can state the
    * identical predicate, so the IO-pruned sampling path itself is
    * hash-verifiable end-to-end. */
  def knuthHash(key: Column): Column =
    pmod(key * lit(2654435761L), lit(4294967296L))

  def knuthCut(frac: Double): Long = (frac * 4294967296.0).toLong

  /** Range predicate over a persisted knuthHash column. */
  def byStoredKnuthRange(df: DataFrame, hashCol: String, frac: Double): DataFrame =
    df.filter(col(hashCol) < lit(knuthCut(frac)))

  /** SAMPLE f OFFSET g (ASTSampleRatio.h): the [g, g+f) window of the
    * sampling-key space — disjoint windows tile the table exactly, the
    * reference's resumable-scan use. Still one scan-pushed range. */
  def byStoredKnuthRange(df: DataFrame, hashCol: String, frac: Double,
      offset: Double): DataFrame =
    df.filter(col(hashCol) >= lit(knuthCut(offset)) &&
      col(hashCol) < lit(knuthCut(math.min(offset + frac, 1.0))))

  /** Materialize (once per source path) the sampling layout of `df`:
    * the key's knuthHash persisted as `__sample_hash`, files
    * range-partitioned and sorted by it — the layout ChDdl's
    * SAMPLE BY produces, as a standalone helper for ad-hoc tables.
    * Cached on disk: the write is skipped when the marker exists. */
  def sampleLayout(df: DataFrame, key: String, cachePath: String): DataFrame = {
    val spark = df.sparkSession
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(cachePath, "_SUCCESS"))) {
      df.withColumn("__sample_hash", knuthHash(col(key)))
        .repartitionByRange(col("__sample_hash"))
        .sortWithinPartitions("__sample_hash")
        .write.mode("overwrite").parquet(cachePath)
    }
    spark.read.parquet(cachePath)
  }
}

/** ASOF JOIN for HOT keys (backward direction): the plain AsOfJoin
  * sorts each key's entire history inside one window partition — a
  * single key with 10⁹ rows pins one reducer. Here each key's stream
  * is split into (key, time-bucket) partitions:
  *  - the in-bucket carry is a window over (key, bucket) — bounded by
  *    rows per bucket;
  *  - the carry ACROSS buckets runs on the bucket-granularity
  *    relation (one row per non-empty (key, bucket)), with a window
  *    partitioned by key over BUCKETS — bounded by time-span/width,
  *    not by event count.
  * Equivalence with AsOfJoin is pinned in AsOfJoinSpec on real data.
  * Pick the bucket width so both bounds stay comfortable (e.g. daily
  * buckets for per-second events).
  */
object AsOfJoinBucketed {
  def apply(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightCols: Seq[String], bucket: Column => Column): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    val rTagged = right
      .select((col(rightTime).as("__t") +: col(key).as(key) +:
        Seq(struct(rightCols.map(col): _*).as("__payload"))): _*)
      .withColumn("__side", lit(0))
    val lCols = left.columns
    val unioned = lTagged.select(
        (lCols.map(col) :+ col("__t") :+ col("__side") :+ col("__payload")): _*)
      .unionByName(
        rTagged.select(
          (lCols.map(c => if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) :+
            col("__t") :+ col("__side") :+ col("__payload")): _*))
      .withColumn("__b", bucket(col("__t")))
      .persist() // read by the row-level pass AND the bucket relation
    // in-bucket carry (bounded partitions)
    val wIn = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("__t"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = unioned.withColumn("__in",
      last("__payload", ignoreNulls = true).over(wIn))
    // bucket-granularity carry-in: latest right payload of any PRIOR
    // bucket of the same key
    val bucketLast = unioned.filter(col("__side") === 0)
      .groupBy(col(key), col("__b"))
      .agg(max(struct(col("__t"), col("__payload"))).getField("__payload").as("__bl"))
    // spine over ALL buckets (a left-only bucket still needs its
    // carry-in from earlier right-occupied buckets)
    val allBuckets = unioned.select(col(key), col("__b")).distinct()
    val wAcross = Window.partitionBy(key).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = allBuckets
      .join(bucketLast, Seq(key, "__b"), "left")
      .withColumn("__carry", last("__bl", ignoreNulls = true).over(wAcross))
      .select(col(key), col("__b"), col("__carry"))
    withIn.join(carryIn, Seq(key, "__b"), "left")
      .withColumn("__match", coalesce(col("__in"), col("__carry")))
      .filter(col("__side") === 1)
      .select((lCols.map(col) ++ rightCols.map(c => col(s"__match.$c").as(c))): _*)
  }
}

/** Point-in-interval (range) join without a cross product. Spark
  * plans a raw non-equi join as BroadcastNestedLoop — O(|points|·
  * |intervals|) comparisons. Binning restores an equi-join: intervals
  * are exploded onto a fixed grid (one row per covered bin), points
  * join their bin hash-wise, and the exact containment predicate
  * filters. Cost: |points| + Σ(interval span / binSize) join rows. A
  * point meets each covering interval in exactly one bin (its own), so
  * no dedup pass is needed. Pick binSize near the median interval
  * width: coarser grids fan candidate lists out, finer grids replicate
  * intervals across more bins.
  *
  * Tuning knobs (plan-shape contract):
  *  - intervals wider than `maxBinsPerInterval` bins skip the explode
  *    and take a BROADCAST non-equi join instead (they match a large
  *    fraction of all points anyway, so the scan-side work is
  *    inherent); a too-small `binSize` makes MOST intervals "long"
  *    and routes the table down this path — size binSize near the
  *    median interval width so the long side stays dimension-tiny;
  *  - the long side is counted once at plan-construction time (one
  *    metadata-scale job on the interval table, same job the old
  *    limit(1) probe spent); beyond `maxBroadcastLong` rows the
  *    broadcast hint is DROPPED and the long side takes a plain
  *    non-equi join (BNLJ/cartesian under AQE) — an unbounded
  *    broadcast of a wide-interval table is a driver-memory failure,
  *    and a long side that big means the query is inherently
  *    near-quadratic regardless of plan shape.
  */
object RangeJoin {
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binSize: Double, maxBinsPerInterval: Int = 256,
      maxBroadcastLong: Long = 100000L): DataFrame = {
    // empty/inverted intervals (lo >= hi) can never match a point
    // under [lo, hi) — drop them BEFORE binning: sequence(start, stop)
    // runs DESCENDING when stop < start, so an inverted interval would
    // otherwise explode a bogus bin range (unbounded in the interval
    // width) just for the post-filter to throw every row away
    val valid = intervals.filter(col(loCol) < col(hiCol))
    // long/short split (dev/rangebin_probe_r14.txt): an interval
    // covering w/binSize bins explodes that many rows, so one
    // domain-spanning interval among thousands of short ones
    // multiplies the exploded side by domain/binSize — measured 4.4x
    // end-to-end once the explode dominates. Intervals wider than
    // maxBinsPerInterval bins instead take a BROADCAST non-equi join:
    // by the time an interval covers hundreds of bins it matches a
    // meaningful fraction of all points, so the scan-side work is
    // inherent and the broadcast side is tiny (few such intervals —
    // a band table that is MOSTLY domain-spanning is an inherently
    // quadratic query no plan shape can save). The split is only
    // planned when long intervals exist (one limit(1) probe on the
    // dimension-sized interval table), so the common all-short case
    // keeps the pure binned equi-join plan.
    val bins = floor(col(hiCol) / binSize).cast("long") -
      floor(col(loCol) / binSize).cast("long")
    val shortIv = valid.filter(bins < lit(maxBinsPerInterval.toLong))
    val longIv = valid.filter(bins >= lit(maxBinsPerInterval.toLong))
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binSize).cast("long"))
    val iv = shortIv.withColumn("__bin", explode(sequence(
      floor(col(loCol) / binSize).cast("long"),
      floor(col(hiCol) / binSize).cast("long"))))
    val binned = p.join(iv, "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
    // one plan-construction job sizes the long side; the count (not
    // the old limit(1) existence probe) also gates the broadcast hint
    val nLong = longIv.count()
    val pred = col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    if (nLong == 0L) binned
    else if (nLong <= maxBroadcastLong)
      binned.unionByName(points.join(broadcast(longIv), pred))
    else binned.unionByName(points.join(longIv, pred))
  }
}

/** Distributed ntile: global rank without a global single-partition
  * sort (the scale-killer `Window.orderBy` with no partition).
  *
  * Plan: range-repartition on the total order + per-partition sort
  * (one shuffle, same cost as any global ORDER BY), then a ≤#partitions
  * row histogram gives each partition's rank offset; global rank =
  * offset + local row_number, and the ntile bucket follows from the
  * exact integer formula (first `total % n` tiles get one extra row —
  * identical to Spark/DuckDB NTILE). The only windows are
  * per-partition; the offset cumsum runs on the tiny histogram.
  */
object Ntile {
  def apply(df: DataFrame, n: Int, order: Seq[Column], out: String = "tile"): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist() // read twice: histogram + rank join; axis-sized cache
    val hist = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    // rank offsets from a tiny (≤#partitions rows) self-join — an
    // unpartitioned cumsum window would log the single-partition
    // warning even though the input is the histogram
    val prior = hist.select(col("__pid").as("__pid2"), col("__cnt").as("__cnt2"))
    val offsets = hist.join(prior, col("__pid2") < col("__pid"), "left")
      .groupBy("__pid").agg(coalesce(sum("__cnt2"), lit(0L)).as("__off"))
    val total = hist.agg(sum("__cnt").as("__total"))
    val ranked = ranged
      .withColumn("__lrn", row_number().over(
        Window.partitionBy("__pid").orderBy(order: _*)))
      .join(broadcast(offsets.select("__pid", "__off")), "__pid")
      .crossJoin(broadcast(total))
      .withColumn("__rank", col("__off") + col("__lrn"))
    // q = total div n, r = total mod n, cut = r*(q+1); tiles 1..r have
    // q+1 rows, tiles r+1..n have q rows. Pure long arithmetic.
    val rankedQ = ranked
      .withColumn("__q", call_function("div", col("__total"), lit(n.toLong)))
      .withColumn("__r", pmod(col("__total"), lit(n.toLong)))
      .withColumn("__cut", col("__r") * (col("__q") + 1))
    rankedQ.withColumn(out,
        when(col("__rank") <= col("__cut"),
          call_function("div", col("__rank") - 1, col("__q") + 1) + 1)
        .otherwise(col("__r") +
          call_function("div", col("__rank") - col("__cut") - 1, col("__q")) + 1))
      .drop("__pid", "__lrn", "__off", "__total", "__rank", "__q", "__r", "__cut")
  }
}

/** topK(k)(col) (ClickHouse approximate heavy hitters). Exact variant:
  * count per value (partial-agg friendly), then top-k of the distinct
  * values. Grouped form uses a window partitioned by the group; the
  * global form uses sort+limit (TakeOrderedAndProject — distributed
  * partial top-k, no single-partition window ever).
  */
object TopK {
  def apply(df: DataFrame, valueCol: String, k: Int, extraGroup: Seq[String] = Nil): DataFrame = {
    val counts = df.groupBy((extraGroup :+ valueCol).map(col): _*).agg(count(lit(1)).as("cnt"))
    val order = Seq(col("cnt").desc, col(valueCol).asc)
    if (extraGroup.isEmpty) {
      counts.orderBy(order: _*).limit(k)
    } else {
      val w = Window.partitionBy(extraGroup.map(col): _*).orderBy(order: _*)
      counts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).drop("__rn")
    }
  }
}
