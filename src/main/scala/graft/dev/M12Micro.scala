package graft.dev
object M12Micro {
  def main(args: Array[String]): Unit = {
    import graft.operators.Vp8lCodec
    def encodeDoc(id: Long): Array[Byte] = {
      val w = (5 + Math.floorMod(id, 4L)).toInt
      val h = (4 + Math.floorMod(id, 3L)).toInt
      val nf = (2 + Math.floorMod(id, 3L)).toInt
      val durMs = ((4 + Math.floorMod(id, 5L)) * 10).toInt
      def color(k: Long, c: Int): Int =
        Math.floorMod(id * 11 + k * 17 + c * 29, 256L).toInt
      val base = Vp8lCodec.WebpFrame(0, 0, w, h, durMs,
        blend = false, disposeBg = false,
        Array.tabulate(w * h * 4) { i =>
          if (i % 4 == 3) 255
          else color(Math.floorMod(id + (i / 4) * 3L, 8L), i % 4)
        })
      val overlays = (1 until nf).map { f =>
        Vp8lCodec.WebpFrame(0, 0, w, f + 1, durMs,
          blend = true, disposeBg = false,
          Array.tabulate(w * (f + 1) * 4) { i =>
            val p = i / 4; val y = p / w; val x = p % w
            val k = Math.floorMod(id + y * 5L + x * 3L, 8L)
            if (y == 0 || k == 0L) 0
            else if (i % 4 == 3) 255
            else color(k, i % 4)
          })
      }
      Vp8lCodec.encodeWebpAnim(w, h, 0xff000000, 0, base +: overlays)
    }
    // warm
    (0L until 500L).foreach(encodeDoc)
    var t0 = System.nanoTime()
    val encoded = (0L until 5000L).map(encodeDoc)
    println(f"encode 5000: ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    encoded.foreach(b => graft.operators.VideoCodec.decode(b))
    println(f"decode 5000: ${(System.nanoTime()-t0)/1e9}%.2f s")

    // spark pipeline split
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def mk() = {
      val docs = graft.queries.fanOut(graft.sources.Tables(spark, "/root/testdata/sf0.1").documents
        .select(col("doc_id").cast("long"))).as[Long]
      docs.map { id =>
        graft.operators.MediaRow(id, encodeDoc(id), "declared/wrong", 0, 0)
      }.toDF()
    }
    def timed(n: String)(f: => Unit): Unit = {
      val t = System.nanoTime(); f
      println(f"[m12probe] $n%-18s ${(System.nanoTime()-t)/1e9}%6.2f s")
    }
    (1 to 3).foreach { i =>
      timed(s"media pass$i")(mk().write.format("noop").mode("overwrite").save())
      timed(s"frames pass$i")(graft.operators.Multimodal.sampleVideoFrames(mk(), every = 2)
        .orderBy("doc_id", "frame_idx")
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
