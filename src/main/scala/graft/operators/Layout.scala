package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB store — the write-side
  * twin of p10's bucketed tables.
  *
  * Z-ORDER (Morton) clustering: a table range-queried on TWO
  * dimensions can only be sorted by one of them; interleaving the
  * dims' bits gives a single sort key whose contiguous ranges are
  * small RECTANGLES in (a, b) space, so every written file carries a
  * narrow min/max envelope on BOTH raw columns and a box predicate
  * prunes files/row-groups on either dim (parquet footer stats; the
  * same reason Delta/Iceberg expose OPTIMIZE ZORDER BY). Reference
  * surface: mortonEncode in the function registry (ASTFunction.h) —
  * this is that codec applied to layout, where it actually earns its
  * keep at scale.
  */
object Layout {

  /** 32-bit Morton interleave of the low 16 bits of two dims (the c45
    * mortonEncode bit recipe as pure long column arithmetic). */
  def morton16(a: Column, b: Column): Column = {
    val aa = pmod(a.cast("long"), lit(65536L))
    val bb = pmod(b.cast("long"), lit(65536L))
    (0 until 16).map { i =>
      shiftleft(shiftright(aa, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Write `df` as `nFiles` parquet files clustered by the Morton
    * code of (dimA, dimB): range-repartition on the code (equal-ish
    * file sizes via sampled range bounds — the distributed sort
    * shape, no single-task funnel), sort within each file, drop the
    * helper column. The code never needs to be stored: clustering by
    * it is what narrows each file's min/max on the RAW dims, and
    * predicates arrive on those. */
  def zorderWrite(df: DataFrame, dimA: Column, dimB: Column,
      path: String, nFiles: Int): Unit = {
    require(nFiles > 0)
    df.withColumn("__z", morton16(dimA, dimB))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** The one-dimensional counterfactual (what a single-column ORDER
    * BY layout gives you) — used by ZOrderSpec to measure the
    * difference, and by callers who genuinely query one dim. */
  def linearWrite(df: DataFrame, dim: Column, path: String,
      nFiles: Int): Unit = {
    df.repartitionByRange(nFiles, dim)
      .sortWithinPartitions(dim)
      .write.mode("overwrite").parquet(path)
  }
}
