package graft.tools

/** Dev tool: print every registered query key, one per line — the
  * driver-side source of truth dev/scale_gate.py's --rotate mode uses
  * to cycle fresh keys through the 10x gate cohort (r18 verdict #7). */
object KeyList {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
