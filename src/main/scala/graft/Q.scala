package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: a Spark query plus (optionally) the equivalent
  * DuckDB SQL the driver uses as a correctness oracle. `oracle == None`
  * means the op is not SQL-expressible (e.g. hash-seeded LSH) and gets the
  * driver's weaker rows-only check; such ops carry a ScalaTest spec instead.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
