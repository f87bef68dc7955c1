package graft

import java.nio.file.{Files, Paths}

/** Serialize SparkEntry.oracleSql as the driver-format oracle_sql.json.
  * Shared by graft.Verify (the correctness dump) and OracleTypesSpec
  * (the in-suite type-widening audit) — needs no SparkSession, the
  * oracle map is pure metadata.
  */
object OracleJson {

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL would otherwise make
    * the driver's json.load fail and silently zero the round's
    * correctness. */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Standalone entry: write oracle_sql.json to the given dir without
    * running the full Verify dump — what tools/time_oracle.py needs for
    * a same-session Spark/DuckDB pair (BASELINE.md protocol) when no
    * verify output dir is at hand. Pure metadata, no SparkSession.
    */
  def main(args: Array[String]): Unit =
    write(args.headOption.getOrElse("."))

  /** Write `<dir>/oracle_sql.json` with the FULL oracle map. */
  def write(dir: String): Unit = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$dir/oracle_sql.json"), json): Unit
  }
}
