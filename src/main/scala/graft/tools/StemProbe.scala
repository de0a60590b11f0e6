package graft.tools

import org.apache.spark.sql.SparkSession

/** Krovetz table-maintenance probe: for every exception-table entry
  * (or an explicit word list), print the RULE-ONLY stem next to the
  * table value, so table refreshes can prune entries the rules now
  * cover and spot new false positives. Maintenance-only — not part of
  * the query surface.
  *
  * Usage: runMain graft.tools.StemProbe [word ...]
  * (no args = audit the whole exception table)
  */
object StemProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("stem-probe").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    import graft.text.KrovetzStem

    val words: Seq[String] =
      if (args.nonEmpty) args.toSeq else KrovetzStem.exceptions.map(_._1)
    val table = KrovetzStem.exceptions.toMap

    val out = words.toDF("term")
      .withColumn("s1", expr(KrovetzStem.pluralSql("term")))
      .withColumn("s2", expr(KrovetzStem.pastSql("s1")))
      .withColumn("rule", expr(KrovetzStem.ingSql("s2")))
      .select("term", "rule")
      .collect().map(r => r.getString(0) -> r.getString(1))

    out.foreach { case (t, rule) =>
      table.get(t) match {
        case Some(v) if v == rule => println(s"PRUNE  $t -> $v (rule-covered)")
        case Some(v)              => println(s"KEEP   $t -> $v (rule says '$rule')")
        case None                 => println(s"RULE   $t -> $rule")
      }
    }
    spark.stop()
  }
}
