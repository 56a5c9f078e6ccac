package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = Bench.session("8")
    val n = SparkEntry.entry(s).count()
    println(s"ENTRY_ROWS=$n")
    s.stop()
  }
}
