package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Every implemented operator has a `queries` entry; every SQL-expressible one
  * also has a DuckDB oracle in `oracleSql` with matching column aliases.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.E analytics headliners
    "q1_agg"         -> (Analytics.q1Agg _),
    "q3_join"        -> (Analytics.q3Join _),
    "q5_multijoin"   -> (Analytics.q5MultiJoin _),
    "topk_per_group" -> (Analytics.topkPerGroup _),
  )

  /** DuckDB equivalents for the driver's correctness gate. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"         -> Analytics.q1AggSql,
    "q3_join"        -> Analytics.q3JoinSql,
    "q5_multijoin"   -> Analytics.q5MultiJoinSql,
    "topk_per_group" -> Analytics.topkPerGroupSql,
  )
}
