package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, sfTiny, "documents")

  test("epochAssign is deterministic and in-range; seed changes the permutation") {
    val a1 = Sharding.epochAssign(docs, "doc_id", 7, 8)
      .select("doc_id", "shard", "ord").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    val a2 = Sharding.epochAssign(docs, "doc_id", 7, 8)
      .select("doc_id", "shard", "ord").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(a1.sameElements(a2)) // bit-for-bit reproducible
    assert(a1.forall { case (_, s, _) => s >= 0 && s < 8 })

    val b = Sharding.epochAssign(docs, "doc_id", 8, 8)
      .select("doc_id", "shard", "ord").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(!a1.sameElements(b)) // a new epoch is a new permutation
    // and both epochs are roughly balanced (no empty shard at 1k docs)
    assert(a1.groupBy(_._2).size == 8 && b.groupBy(_._2).size == 8)
  }

  test("epochShuffle: lossless, and every task partition is (shard, ord)-sorted") {
    val base = docs.select("doc_id").as[Long].collect().sorted
    val sh = Sharding.epochShuffle(docs, "doc_id", 7, 8)
    val got = sh.select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(base)) // exactly once each

    val unsorted = sh.select("shard", "ord")
      .as[(Long, Long)].rdd
      .mapPartitions { it =>
        val rows = it.toVector
        Iterator.single(rows.zip(rows.drop(1)).forall { case (x, y) =>
          x._1 < y._1 || (x._1 == y._1 && x._2 <= y._2) })
      }.collect()
    assert(unsorted.forall(identity))
    assert(sh.rdd.getNumPartitions == 8)
  }

  test("temperatureSample: flattened quotas, deterministic membership") {
    val sel = Sharding.temperatureSample(docs)
      .select("lang", "doc_id").as[(String, Long)].collect()
    val selB = Sharding.temperatureSample(docs)
      .select("lang", "doc_id").as[(String, Long)].collect()
    assert(sel.sorted.sameElements(selB.sorted)) // identical mix on rerun

    val raw = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val got = sel.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (n, target) = (raw.values.sum, raw.values.sum / 2)
    // quota total lands on the target up to per-lang rounding
    assert(math.abs(got.values.sum - target) <= raw.size)
    // α=0.3 flattens: every minority lang's mix share strictly beats
    // its raw share, the majority lang's share shrinks
    val major = raw.maxBy(_._2)._1
    got.foreach { case (l, q) =>
      val (ms, rs) = (q.toDouble / got.values.sum, raw(l).toDouble / n)
      if (l == major) assert(ms < rs) else assert(ms > rs)
    }
  }

  test("temperatureSample == the per-language window formula (cut-point path)") {
    // the de-skewed two-pass cut must pick the EXACT same membership as
    // row_number() OVER (PARTITION BY lang ORDER BY h60(seed|id), id)
    // <= quota — replayed driver-side on the fixture
    val quotas = Sharding.temperatureReport(docs)
      .select("lang", "quota").as[(String, Long)].collect().toMap
    val keyed = docs.select(col("lang"), col("doc_id"),
      graft.functions.DetHash.h60(col("doc_id").cast("string"), 7).as("h"))
      .as[(String, Long, Long)].collect()
    val expect = keyed.groupBy(_._1).toSeq.flatMap { case (l, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(quotas(l).toInt).map(_._2)
    }.toSet
    val got = Sharding.temperatureSample(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expect,
      s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("temperatureReport: n_sel matches the selection; capped langs flagged") {
    val docs2 = spark.range(100).select(
      when($"id" < 97, "en").otherwise("xx").as("lang"),
      $"id".as("doc_id"))
    val rep = Sharding.temperatureReport(docs2)
      .select("lang", "n_docs", "quota", "n_sel", "capped")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val got = Sharding.temperatureSample(docs2)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    rep.values.foreach { case (l, n, q, nSel, capped) =>
      assert(nSel == got.getOrElse(l, 0L),
        s"$l: report n_sel=$nSel actual=${got.get(l)}")
      assert(capped == (q > n))
    }
    // the 3-doc minority is upweighted past its size: capped, fully kept
    assert(rep("xx")._5 && rep("xx")._4 == 3L)
    assert(!rep("en")._5)
    // degenerate target: total div 200 == 0 => every quota 0, empty mix
    assert(Sharding.temperatureSample(docs2, targetDiv = 200).isEmpty)
  }

  test("temperatureSample: NULL-language docs form their own language") {
    val d = spark.range(40).select(
      when($"id" < 30, "en").otherwise(lit(null).cast("string")).as("lang"),
      $"id".as("doc_id"))
    val rep = Sharding.temperatureReport(d)
      .select("lang", "n_sel").as[(Option[String], Long)].collect().toMap
    assert(rep.contains(None), "report must carry the null-lang group")
    val got = Sharding.temperatureSample(d)
      .groupBy("lang").count().as[(Option[String], Long)].collect().toMap
    // selection counts match the report for BOTH groups — including
    // the null language, which a plain equi-join would silently drop
    assert(got.getOrElse(None, 0L) == rep(None), s"$got vs $rep")
    assert(got.getOrElse(Some("en"), 0L) == rep(Some("en")))
  }

  test("targetDiv < 1 and NULL doc_id refuse loudly, not silently (r16)") {
    // targetDiv = 0 used to be a plan-buried 'div 0' that killed the
    // job at its LAST aggregation under ANSI (or NULLed every quota
    // with ANSI off); it refuses driver-side now
    val e0 = intercept[IllegalArgumentException] {
      Sharding.temperatureSample(docs, targetDiv = 0)
    }
    assert(e0.getMessage.contains("targetDiv"), e0.getMessage)
    // a NULL id hashes to a NULL (h, id) cut key: it would inflate
    // the selection histogram NULLS-FIRST yet never match the cut's
    // rank join, silently shifting the boundary — raise instead
    val withNull = docs.select("doc_id", "lang", "text").unionByName(
      Seq((Option.empty[Long], "en", "some text here"))
        .toDF("doc_id", "lang", "text"))
    val e1 = intercept[Exception] {
      Sharding.temperatureSample(withNull).select("doc_id").collect()
    }
    assert(e1.getMessage.contains("NULL doc_id"), e1.getMessage)
    val e2 = intercept[Exception] {
      Sharding.epochAssign(withNull, "doc_id", 7, 8)
        .select("shard").collect()
    }
    assert(e2.getMessage.contains("NULL doc_id"), e2.getMessage)
  }

  test("mix ops refuse input columns that collide with reserved names") {
    // a corpus already carrying `quota`/`n_docs` would otherwise hit
    // an ambiguous-reference error deep in the plan — or have its own
    // column silently dropped by the internal cleanup
    val clash = spark.range(5).select($"id".as("doc_id"),
      lit("en").as("lang"), lit(9L).as("quota"))
    val e1 = intercept[IllegalArgumentException] {
      Sharding.temperatureSample(clash)
    }
    assert(e1.getMessage.contains("quota"), e1.getMessage)
    val clash2 = spark.range(5).select($"id".as("doc_id"),
      lit("en").as("lang"), lit(1L).as("rep"))
    val e2 = intercept[IllegalArgumentException] {
      Sharding.repeatBudgetMix(clash2)
    }
    assert(e2.getMessage.contains("rep"), e2.getMessage)
  }

  test("repeatBudgetMix: rep accounting matches the plan, deterministically") {
    val plan = Sharding.repeatBudgetPlan(docs, targetDiv = 1)
      .select("lang", "n_docs", "allocated", "full_epochs", "n_partial")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // targetDiv=1 upsamples the minority languages at this SF
    assert(plan.values.exists(_._4 >= 1L), s"no upsampled language: $plan")
    val mix = Sharding.repeatBudgetMix(docs, targetDiv = 1)
      .select("lang", "doc_id", "rep").as[(String, Long, Long)].collect()
    val mixB = Sharding.repeatBudgetMix(docs, targetDiv = 1)
      .select("lang", "doc_id", "rep").as[(String, Long, Long)].collect()
    assert(mix.sortBy(r => (r._1, r._2))
      .sameElements(mixB.sortBy(r => (r._1, r._2)))) // bit-for-bit rerun
    for ((lang, (_, n, alloc, full, part)) <- plan) {
      val rows = mix.filter(_._1 == lang)
      assert(rows.map(_._3).sum == alloc,
        s"$lang: sum(rep) ${rows.map(_._3).sum} != allocated $alloc")
      assert(rows.count(_._3 == full + 1) == part,
        s"$lang: partial-epoch membership count off")
      // rep==full rows are the rest of the language (or absent if full==0)
      assert(rows.length == (if (full > 0) n else part))
    }
    // the partial epoch is the same membership temperatureSample picks:
    // for a DOWNSAMPLED language (full==0), the rep>=1 set at equal
    // quota must equal the temperature selection
    val down = plan.collect { case (l, (_, _, _, 0L, _)) => l }
    assert(down.nonEmpty)
    val ts = Sharding.temperatureSample(docs, targetDiv = 1)
      .select("lang", "doc_id").as[(String, Long)].collect()
    for (l <- down)
      assert(mix.filter(_._1 == l).map(_._2).sorted
        .sameElements(ts.filter(_._1 == l).map(_._2).sorted), l)
  }

  test("repeatBudgetMix(maxRepeat = 1) membership == temperatureSample") {
    // with the epoch cap at 1, allocated = min(quota, n_docs): a
    // capped language keeps everything (full_epochs = 1), an uncapped
    // one keeps its n_partial = quota smallest by the same hash order
    // — exactly temperatureSample's min(quota, n_docs) selection
    val mix = Sharding.repeatBudgetMix(docs, targetDiv = 1, maxRepeat = 1)
      .select("doc_id", "rep").as[(Long, Long)].collect()
    assert(mix.forall(_._2 == 1L), "no doc can repeat at cap 1")
    val ts = Sharding.temperatureSample(docs, targetDiv = 1)
      .select("doc_id").as[Long].collect()
    assert(mix.map(_._1).sorted.sameElements(ts.sorted))
  }

  test("repeatBudgetPlan: the epoch cap binds on an extreme minority") {
    val d = spark.range(1000).select(
      when($"id" < 997, "en").otherwise("xx").as("lang"),
      $"id".as("doc_id"))
    val p = Sharding.repeatBudgetPlan(d, targetDiv = 1)
      .select("lang", "quota", "allocated", "full_epochs", "n_partial",
        "capped")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // xx: 3 docs, alpha-flattened quota far above 4x3 => cap binds
    assert(p("xx")._6 && p("xx")._3 == 12L &&
      p("xx")._4 == 4L && p("xx")._5 == 0L, p.toString)
    assert(!p("en")._6 && p("en")._4 == 0L)
    val mix = Sharding.repeatBudgetMix(d, targetDiv = 1)
      .filter($"lang" === "xx").select("rep").as[Long].collect()
    assert(mix.length == 3 && mix.forall(_ == 4L)) // every doc, 4 epochs
  }

  test("repeatBudgetMix: NULL-language docs form their own language") {
    val d = spark.range(40).select(
      when($"id" < 30, "en").otherwise(lit(null).cast("string")).as("lang"),
      $"id".as("doc_id"))
    val plan = Sharding.repeatBudgetPlan(d, targetDiv = 1)
      .select("lang", "allocated").as[(Option[String], Long)]
      .collect().toMap
    assert(plan.contains(None), "plan must carry the null-lang group")
    val got = Sharding.repeatBudgetMix(d, targetDiv = 1)
      .groupBy("lang").agg(sum("rep")).as[(Option[String], Long)]
      .collect().toMap
    assert(got.getOrElse(None, 0L) == plan(None), s"$got vs $plan")
    assert(got.getOrElse(Some("en"), 0L) == plan(Some("en")))
  }

  test("plan shapes: one exchange in epochShuffle; broadcast quota join") {
    val sh = Sharding.epochShuffle(docs, "doc_id", 7, 8)
      .queryExecution.executedPlan.toString
    // count the SHUFFLE exchanges precisely (the PlanShapeSpec idiom):
    // a bare "Exchange" substring also matches ReusedExchange /
    // BroadcastExchange nodes, which add no shuffle
    assert("Exchange hashpartitioning".r.findAllIn(sh).size == 1,
      sh) // the one repartition
    val ts = Sharding.temperatureSample(docs)
      .queryExecution.executedPlan.toString
    assert(ts.contains("BroadcastHashJoin"), ts) // quotas never shuffle docs
  }

  test("writeEpochShards lays out one directory per shard") {
    val out = java.nio.file.Files.createTempDirectory("epoch").toString
    Sharding.writeEpochShards(docs, "doc_id", 7, 4, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.sameElements(Array("shard=0", "shard=1", "shard=2", "shard=3")))
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
  }
}
