package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver regenerates `/root/testdata` between rounds and the physical
  * parquet type of `events.ts` has already changed twice (TIMESTAMP(NANOS)
  * scanned as long under `nanosAsLong`, then plain `timestamp[us]` scanned
  * as TIMESTAMP_NTZ — the r6/r7 silent q25/q26 break). This matrix pins
  * [[Tables.events]]'s contract: WHATEVER physical encoding the ts column
  * arrives in, the loader hands every downstream query a session-TZ
  * `TimestampType` column with microsecond values intact. */
class EventsSchemaMatrixSpec extends SparkSpec {

  // one deterministic instant, micro precision: 2026-01-02 03:04:05.123456 UTC
  private val micros = 1767323045123456L

  private def writeVariant(name: String)(build: => DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"events-$name").toString
    build.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def checkLoaded(dir: String, variant: String): Unit = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"$variant: Tables.events must normalize ts to TimestampType, " +
        s"got ${ev.schema("ts").dataType}")
    // unix_micros is exactly what q25/q26 apply — it rejects NTZ/long,
    // so this line IS the regression the matrix guards against
    val got = ev.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == micros, s"$variant: expected $micros micros, got $got")
  }

  test("events ts as TIMESTAMP (micros, UTC-adjusted) passes through") {
    import spark.implicits._
    val dir = writeVariant("tstz") {
      Seq((1L, new java.sql.Timestamp(micros / 1000))).toDF("event_id", "ts")
        .withColumn("ts", timestamp_micros(lit(micros)))
    }
    checkLoaded(dir, "TIMESTAMP")
  }

  test("events ts as TIMESTAMP_NTZ (timestamp[us] unadjusted) is cast losslessly") {
    import spark.implicits._
    val dir = writeVariant("ntz") {
      Seq(1L).toDF("event_id")
        .withColumn("ts", timestamp_micros(lit(micros)).cast(TimestampNTZType))
    }
    // confirm the scan really comes back NTZ, otherwise this case tests nothing
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"fixture did not round-trip as NTZ: ${raw.schema("ts").dataType}")
    checkLoaded(dir, "TIMESTAMP_NTZ")
  }

  test("events ts scanned as long (nanosAsLong path) is rebuilt from nanos") {
    import spark.implicits._
    val dir = writeVariant("nanos") {
      Seq((1L, micros * 1000L)).toDF("event_id", "ts")
    }
    checkLoaded(dir, "LONG(nanos)")
  }
}
