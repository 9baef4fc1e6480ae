package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse relational operators Spark lacks as built-ins, composed
  * from declarative plans (never driver-side loops) so Catalyst/AQE
  * keep optimizing them.
  */

/** `LIMIT n BY expr` (reference: src/Parsers/ASTSelectQuery.h:30-32):
  * keep first n rows per group in a given order. One shuffle on the
  * group key; the sort is per-partition after the shuffle.
  */
object LimitBy {
  def apply(df: DataFrame, n: Int, by: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(by: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}

/** ASOF JOIN (reference: src/Parsers/ASTTablesInSelectQuery.h:82 —
  * Strictness::Asof): for each left row, the latest right row with
  * rightTime <= leftTime within the same key.
  *
  * Implemented as the union+last-value trick: tag both sides, sort by
  * (key, time, side) once, and carry the most recent right payload
  * forward with a running `last(ignoreNulls)` window. Cost is ONE
  * shuffle on the key + a per-partition sort — no range cross-join, so
  * it scales linearly and never materializes candidate pairs (the
  * naive time-range join is O(|L|·|R|) per key and dies at 100 TB).
  */
object AsOfJoin {
  def apply(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
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
    // right rows (side=0) sort before a left row at the same timestamp →
    // backward-inclusive semantics, matching ClickHouse ASOF `<=`.
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__match", last("__payload", ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select((lCols.map(col) ++ rightCols.map(c => col(s"__match.$c").as(c))): _*)
  }
}

/** ORDER BY ... WITH FILL (reference: src/Parsers/ASTOrderByElement.h):
  * densify an ordered axis by generating the missing steps. The spine
  * is built from a 1-row min/max aggregate crossed with sequence() —
  * broadcast-joined back, so no full-data second shuffle.
  */
object WithFill {
  /** Fill missing days between min and max of a date column. */
  def fillDays(df: DataFrame, dateCol: String): DataFrame = {
    val mm = df.agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
    val spine = mm.select(
      explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day"))).as(dateCol))
    spine.join(df, Seq(dateCol), "left")
  }
}

/** SAMPLE k (reference: src/Parsers/ASTSampleRatio.h). ClickHouse
  * samples deterministically on the table's sampling key; we do the
  * same with a mod-filter on the key so results are reproducible
  * across engines and cluster sizes (TABLESAMPLE is
  * partition-layout-dependent; a key-hash filter is not).
  */
object Sample {
  def byKeyMod(df: DataFrame, key: String, mod: Int, keep: Int = 0): DataFrame =
    df.filter(pmod(col(key), lit(mod)) === keep)
}

/** topK(k)(col) (ClickHouse approximate heavy hitters). Exact variant:
  * count per value (partial-agg friendly) then window top-k — the
  * window input is already reduced to distinct values, so the sort is
  * tiny regardless of input rows.
  */
object TopK {
  def apply(df: DataFrame, valueCol: String, k: Int, extraGroup: Seq[String] = Nil): DataFrame = {
    val counts = df.groupBy((extraGroup :+ valueCol).map(col): _*).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(extraGroup.map(col): _*)
      .orderBy(col("cnt").desc, col(valueCol).asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }
}
