package graft

import org.apache.spark.sql.functions._

/** The r11 bench-integrity property (BENCH_NOTES §0g): the bench
  * driver must execute every query's FULL declared output. A bare
  * count() lets Catalyst column-prune unused output expressions — the
  * exact bias this spec makes impossible to silently reintroduce.
  */
class BenchForceSpec extends SparkSpec {

  test("Bench.materialize evaluates every output column; count() does not") {
    val acc = spark.sparkContext.longAccumulator("evals")
    val counting = udf { (x: Long) => acc.add(1); x }
    val df = spark.range(100).select(counting(col("id")).as("y"))

    df.count()
    assert(acc.value == 0L,
      "count() should prune the output column — if this fails, the " +
        "optimizer changed and §0g needs re-examination")

    assert(Bench.materialize(df) == 100L)
    assert(acc.value == 100L,
      "materialize must evaluate the full output for every row")
  }

  test("materialize executes windows and aggregates a count() would prune") {
    import spark.implicits._
    val ev = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("v")
    val df = ev.withColumn("rsum", sum("v").over(w))
    val cp = df.groupBy().count().queryExecution.executedPlan.toString
    assert(!cp.contains("Window"), s"count() plan should prune the window:\n$cp")
    assert(Bench.materialize(df) == 3L) // full plan, window included
  }
}
