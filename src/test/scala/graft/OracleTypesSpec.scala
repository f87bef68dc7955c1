package graft

import org.scalatest.funsuite.AnyFunSuite

/** In-suite promotion of tools/oracle_types.py (the x219 lesson,
  * round-13 verdict item 6): DESCRIBE every oracle SQL in DuckDB and
  * fail if any result column widens to HUGEINT — the widening class
  * that hash-diverges from Spark's BIGINT at the driver even when every
  * value matches (check.py's pandas compare tolerates it, so only this
  * audit catches it). Runs DESCRIBE-only (no Spark outputs needed — the
  * tool skips the schema cross-check when no parquet dirs exist), so
  * the whole 298-query audit costs ~seconds. Skips cleanly where the
  * python3+duckdb toolchain is absent (it is present on the driver
  * host).
  */
class OracleTypesSpec extends AnyFunSuite {

  test("no oracle SQL widens to HUGEINT (DESCRIBE audit over the full " +
      "oracle map)") {
    val py = new ProcessBuilder("python3", "-c", "import duckdb")
      .redirectErrorStream(true).start()
    assume(py.waitFor() == 0, "python3+duckdb not available on this host")

    val tmp = java.nio.file.Files.createTempDirectory("graft_otypes")
    try {
      OracleJson.write(tmp.toString)
      val proc = new ProcessBuilder("python3", "tools/oracle_types.py",
          "/root/testdata/sf0.001", tmp.toString)
        .directory(new java.io.File("."))
        .redirectErrorStream(true).start()
      val out = new String(proc.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val code = proc.waitFor()
      val flagged = out.linesIterator.filter(_.startsWith("FAIL")).toSeq
      assert(code == 0,
        s"oracle type audit flagged:\n${flagged.mkString("\n")}")
      assert(out.contains(" 0 flagged"), out.linesIterator.toSeq.takeRight(2)
        .mkString("\n"))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(tmp.toFile)
    }
  }
}
