package graft.tools

import graft.SparkEntry

/** Machine-readable coverage listing: every declared query with the
  * SURVEY §2 operator ids it covers and whether it is oracle-gated.
  * (The prose map is COVERAGE.md; this is generated from code.)
  */
object Coverage {
  def main(args: Array[String]): Unit = {
    println("query\toracle\tsurvey_ids")
    SparkEntry.decls.foreach { d =>
      println(s"${d.name}\t${if (d.oracle.isDefined) "yes" else "rows-only"}" +
        s"\t${d.survey.mkString(",")}")
    }
    println(s"# total=${SparkEntry.decls.length}" +
      s" oracle_gated=${SparkEntry.decls.count(_.oracle.isDefined)}")
  }
}
