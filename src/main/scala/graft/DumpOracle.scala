package graft

import java.nio.file.{Files, Paths}

/** Dev helper: dump oracle_sql.json without running Spark (oracle SQL
  * strings are pure; lets tools/compare.py re-test oracle-side fixes against
  * already-dumped Spark outputs).
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args(0)), json)
    println(s"wrote ${args(0)}")
  }
}
