package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SCALE.md §2: bucketing both sides of a fact-fact join on the join key
  * makes the join exchange-free — the co-located join path for repeated
  * 100 TB joins. Verified on the lineitem⋈orders orderkey join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-wh")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // external bucketed tables with explicit paths (warehouse.dir is a
    // static conf and cannot be redirected on a live session)
    graft.Tables.lineitem(spark, sfDir)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b")
      .mode("overwrite").saveAsTable("li_b")
    graft.Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not introduce a shuffle: with both sides
    // bucketed on the key, only the final small aggregate exchanges
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      plan)
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      plan)
    // sanity: result matches the unbucketed join
    val want = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(joined.orderBy("o_orderstatus").collect().toSeq == want)
  }
}
