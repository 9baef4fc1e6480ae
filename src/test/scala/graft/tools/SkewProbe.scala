package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: substantiate the d04-family df-cap trade with a
  * measurement the sf0.1 bench cannot produce (verdict r9, demand 3).
  *
  * The question: counting per-(block, gram) document frequency to
  * drop boilerplate grams — COUNT OVER a (blk, gram) window vs a
  * groupBy partial agg + broadcast ANTI join-back. At sf0.1 the
  * window is ~1.3-1.5× FASTER (no join-back pass); the window was
  * removed anyway because it routes every occurrence of a hot gram
  * to ONE task. This probe plants that hot gram at adjustable skew
  * and measures both strategies on the same element table.
  *
  * Run: sbt "Test/runMain graft.tools.SkewProbe [rows] [hotEvery]"
  * (defaults 20M rows, every 2nd row the same hot gram — a df that
  * no task-sized memory can sort without spilling at corpus scale).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val hotEvery = if (args.length > 1) args(1).toLong else 2L
    val cap = 1000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one block, one hot gram carried by every `hotEvery`-th element,
    // the rest spread over a million cold grams (df ≈ rows/2e6 ≪ cap)
    val items = spark.range(0L, rows, 1L, 32).select(
      lit(1).as("__blk"),
      when(pmod($"id", lit(hotEvery)) === 0, lit("HOT"))
        .otherwise(concat(lit("g"), pmod($"id", lit(1000000L)))).as("__g"),
      $"id".as("doc"))

    def time(label: String)(work: => Long): Unit = {
      // 2 shots per strategy: JIT/shuffle-init lands on the first
      (1 to 2).foreach { shot =>
        val t0 = System.nanoTime()
        val kept = work
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[skewprobe] $label shot$shot: $dt%.2f s (kept $kept rows)")
      }
    }

    time("window-df-cap") {
      items
        .withColumn("__df",
          count(lit(1)).over(Window.partitionBy("__blk", "__g")))
        .filter($"__df" <= cap)
        .count()
    }
    time("partialagg-anti-cap") {
      val hot = items.groupBy("__blk", "__g")
        .agg(count(lit(1)).as("__df"))
        .filter($"__df" > cap)
        .select("__blk", "__g")
      items.join(hot, Seq("__blk", "__g"), "left_anti").count()
    }
    spark.stop()
  }
}
