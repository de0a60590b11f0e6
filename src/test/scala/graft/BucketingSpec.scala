package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketing — the 100 TB fact-fact join strategy
  * (SURVEY §7; builder-prompt "bucketing for co-located joins"): both
  * tables bucketed on the join key join WITHOUT any Exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with no shuffle Exchange") {
    val li = Tables(spark, sfTiny, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables(spark, sfTiny, "orders")
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // managed-table files outlive the in-memory catalog across JVMs
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val dir = new java.io.File(
        sys.props("java.io.tmpdir") + "/graft-warehouse/" + t)
      if (dir.exists())
        dir.listFiles().foreach(f => { f.delete(); () })
      dir.delete()
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("q"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucket-aligned scan: the join itself needs no shuffle; the only
      // Exchange allowed is none at all (groupBy key == bucket key too)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in plan:\n$plan")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
