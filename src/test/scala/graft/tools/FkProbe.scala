package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only: decompose fk_integrity's cost at sf0.1 — children agg alone,
  * parents alone, full query.
  */
object FkProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create(32)
    def time(tag: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime(); f
      println(f"FK $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = Tables.table(spark, dir, "lineitem")
    time("lineitem-stack-agg") {
      Tables.spreadIfNarrow(li, "l_orderkey")
        .select(expr("stack(3, 0, CAST(l_orderkey AS BIGINT), 1, CAST(l_partkey AS BIGINT), 2, CAST(l_suppkey AS BIGINT)) AS (rel_id, k)"))
        .filter(col("k").isNotNull)
        .groupBy(col("rel_id"), col("k")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("orders-parent-distinct") {
      Tables.table(spark, dir, "orders").filter(col("o_orderkey").isNotNull)
        .select(lit(0).as("rel_id"), col("o_orderkey").cast("bigint").as("k"))
        .distinct().write.format("noop").mode("overwrite").save()
    }
    time("full") {
      graft.queries.Profile.fkIntegrity(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
