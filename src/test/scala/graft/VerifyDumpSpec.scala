package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Verify.dump loud-failure contract (the r6/r7 regression class): a
  * throwing query must land in `_failed.json` AND leave an empty marker
  * dir so the driver's per-dir compare emits an err row — the checked
  * set can only shrink loudly. */
class VerifyDumpSpec extends SparkSpec {

  private def good(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
  }
  private def bad(s: SparkSession, d: String): DataFrame =
    throw new RuntimeException("boom: deliberate analysis failure\nline2\nline3\nline4")

  test("throwing query -> _failed.json entry + empty marker dir; good query unaffected") {
    val out = Files.createTempDirectory("verify-dump").toString
    val failed = Verify.dump(spark, "/unused", out,
      Seq("q_good" -> (good _), "q_bad" -> (bad _)))
    assert(failed.keySet == Set("q_bad"))
    assert(failed("q_bad").startsWith("boom: deliberate"))
    // failure message truncated to its first lines, pipe-joined
    assert(failed("q_bad").contains(" | line2") && !failed("q_bad").contains("line4"))
    // good query dumped and readable
    assert(spark.read.parquet(s"$out/q_good").count() == 2)
    // marker dir exists and is empty (no parquet) -> driver err row
    val marker = new java.io.File(s"$out/q_bad")
    assert(marker.isDirectory && marker.listFiles().isEmpty)
    // _failed.json parses and carries the entry
    val json = Files.readString(Paths.get(s"$out/_failed.json"))
    assert(json.contains("\"q_bad\"") && json.startsWith("{") && json.endsWith("}"))
    assert(!json.contains("\n".charAt(0).toString + "line2"),
      "newlines must be escaped in the JSON")
  }

  test("all-green dump writes an empty _failed.json") {
    val out = Files.createTempDirectory("verify-dump-green").toString
    val failed = Verify.dump(spark, "/unused", out, Seq("q_good" -> (good _)))
    assert(failed.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_failed.json")) == "{}")
  }
}
