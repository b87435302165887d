package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-provisioned parquet tables (TESTDATA.md) plus
  * shared numeric helpers.
  *
  * Oracle-parity note: money columns are doubles holding 2-decimal values.
  * Summing doubles is order-dependent (Spark partition order differs from
  * DuckDB's scan order), so every oracle-checked aggregate first casts to
  * an exact decimal, aggregates exactly, and casts the final scalar back to
  * double — bit-identical in both engines regardless of execution order.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped in two physical layouts across driver data
    * drops: parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read as long via nanosAsLong, then ns → µs exactly) and
    * plain TIMESTAMP(MICROS) without UTC adjustment (read as
    * TIMESTAMP_NTZ). Normalize both to session-UTC TimestampType so every
    * downstream query and oracle sees identical µs wall-clock values
    * (DuckDB truncates ns → µs and reads µs natively, so parity holds in
    * both layouts).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** money: 2-decimal doubles → exact decimal */
  val Money: DecimalType = DecimalType(18, 2)
  /** rates (discount/tax): 2-decimal in [0,1] */
  val Rate: DecimalType = DecimalType(4, 2)
  /** event values: ≤4-decimal doubles */
  val Val4: DecimalType = DecimalType(18, 4)

  def money(c: Column): Column = c.cast(Money)
  def rate(c: Column): Column  = c.cast(Rate)
  def val4(c: Column): Column  = c.cast(Val4)

  /** exact decimal sum, surfaced as double (deterministic across engines) */
  def dsum(c: Column): Column = sum(c).cast("double")
  /** exact average = exact decimal sum / count, one double division */
  def davg(c: Column): Column = sum(c).cast("double") / count(lit(1))
}
