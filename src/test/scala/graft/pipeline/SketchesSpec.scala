package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

import scala.collection.mutable

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(stream: Seq[String], cap: Int) =
    stream.foldLeft(mutable.HashMap.empty[String, Long])(
      Sketches.mgAdd(_, _, cap))

  test("mgAdd survival guarantee: freq > n/(capacity+1) always survives") {
    // 100 a's, 50 b's, 60 singletons; n = 210, cap 8 -> bound 23.3
    val stream = scala.util.Random.shuffle(
      Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
        (1 to 60).map(i => s"x$i"))
    val m = sketchOf(stream, 8)
    assert(m.contains("a") && m.contains("b"))
    assert(m.size <= 8)
    // counter error is bounded: estimate <= true, >= true - n/(cap+1)
    assert(m("a") <= 100 && m("a") >= 100 - 210 / 9)
  }

  test("mgMerge keeps the union's heavy hitters within the merged bound") {
    val m1 = sketchOf(Seq.fill(40)("a") ++ (1 to 30).map(i => s"y$i"), 8)
    val m2 = sketchOf(Seq.fill(45)("a") ++ (1 to 30).map(i => s"z$i"), 8)
    val m = Sketches.mgMerge(m1, m2, 8)
    assert(m.size <= 8)
    assert(m.contains("a")) // 85 of 145 total
    assert(m("a") <= 85 && m("a") >= 85 - 145 / 9)
  }

  test("topKTermsMg equals the exact top-k (generous capacity)") {
    val docs = Tables(spark, sfTiny, "documents")
    val exact = graft.text.TextOps.tokens(docs)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("term")).limit(10)
      .as[(String, Long)].collect().toSeq
    val viaMg = Sketches.topKTermsMg(docs, 10)
      .as[(String, Long)].collect().toSeq
    assert(viaMg == exact)
  }

  test("empty corpus yields an empty (not failing) top-k") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Sketches.topKTermsMg(empty, 5).count() == 0)
  }

  test("recount plan: candidates broadcast, corpus side never reshuffled on term") {
    val docs = Tables(spark, sfTiny, "documents")
    val plan = Sketches.topKTermsMg(docs, 5).queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("certification survives column pruning (filter, not a cnt rewrite)") {
    // r13 advice: a raise_error CASE projected onto cnt was PRUNED the
    // moment a consumer selected only term — the default certify=true
    // path silently returned an uncertified top-k. As a filter
    // predicate it survives pruning. Flat corpus: 40 terms × freq 5,
    // n = 200, capacity 16 -> bound ~11.8 > 5, uncertifiable.
    val text = (1 to 40).flatMap(i => Seq.fill(5)(s"t$i")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Sketches.topKTermsMg(docs, 3, 16).select("term").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("cannot certify")), e.toString)
    // and the uncertified opt-out still returns rows under the same select
    assert(Sketches.topKTermsMg(docs, 3, 16, certify = false)
      .select("term").collect().length == 3)
  }

  test("tiny capacity stays exact when the k-th frequency clears the bound") {
    // skewed synthetic corpus: term_i has frequency 200/i; capacity 16
    // against 40 distinct terms. n ~ 200·H(40) ~ 857, bound ~ 50 ->
    // top-3 (200, 100, 66) all clear it.
    val text = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"t$i")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Sketches.topKTermsMg(docs, 3, 16)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("t1", 200L), ("t2", 100L), ("t3", 66L)))
  }
}
