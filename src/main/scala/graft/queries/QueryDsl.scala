package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query inventory.
  *
  * Determinism conventions (the driver hash-compares our parquet output
  * against DuckDB running [[graft.SparkEntry.oracleSql]]):
  *   - Double aggregates are summed as DECIMAL(28,4) — exact in both
  *     engines — then cast back to double. The decimal→double cast is
  *     correctly rounded in both engines (unscaled value < 2^53), so the
  *     result is bit-identical regardless of summation order. We never
  *     use ROUND(double): Spark rounds via the shortest decimal
  *     representation (BigDecimal.valueOf) while DuckDB rounds the
  *     binary value — they disagree on half-way cases like 2.675.
  *   - Computed integers are cast to BIGINT on both sides.
  *   - Timestamps are never emitted raw (Spark is µs-precision, the
  *     parquet `events.ts` is ns-precision): they are reduced to epoch
  *     seconds of a truncation, or to extracted fields.
  *   - Every query ends in a total ORDER BY so output is stable.
  */
object QueryDsl {
  type Q = (SparkSession, String) => DataFrame

  /** Load one of the driver-provided tables from an sf directory. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS), which Spark 4 refuses by default
    * (PARQUET_TYPE_ILLEGAL) and must be read as a nanos long via the
    * legacy conf then rebuilt as a µs timestamp, and TIMESTAMP(MICROS),
    * which reads natively. Branch on the loaded type so both work.
    * Queries only ever emit truncations of ts, so the ns→µs loss in
    * the legacy path is invisible. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // native µs parquet loads as NTZ; cast to the session-local
        // TIMESTAMP the inventory was written against (session tz is
        // pinned UTC, so the epoch value is unchanged)
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Deterministic sum of a double expression: each row is truncated to
    * a 1e-4 grid with exact IEEE ops (`floor(x*10000)` — same double
    * multiply and floor in both engines), summed as exact BIGINT, then
    * divided back. Never goes through decimal rounding, whose half-way
    * rules differ between engines (Spark casts via the shortest decimal
    * string with HALF_UP; DuckDB truncates scale reductions). */
  def dsum(c: Column): Column =
    sum(floor(c * lit(10000.0)).cast("long")).cast("double") / 10000.0

  /** Deterministic average on the same 1e-4 grid. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB fragments mirroring dsum/davg bit-for-bit. */
  def sqlDsum(x: String): String =
    s"CAST(SUM(CAST(FLOOR(($x) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0"
  def sqlDavg(x: String): String =
    s"${sqlDsum(x)} / COUNT($x)"
}
