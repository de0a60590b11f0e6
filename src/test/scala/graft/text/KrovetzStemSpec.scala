package graft.text

import graft.SparkSpec

/** Rule-behavior goldens for the Krovetz-style stemmer, plus the
  * documented divergences vs the dictionary-based original
  * (reference `TrecWordCount2.java:57-79`). The cross-engine identity
  * (Spark ≡ DuckDB on the generated SQL) is gated by px15 in the
  * driver's oracle run; this spec pins the rule semantics so a rule
  * edit can't silently change token identity.
  */
class KrovetzStemSpec extends SparkSpec {

  private def stemAll(words: Seq[String]): Map[String, String] = {
    import spark.implicits._
    KrovetzStem.stem(words.toDF("term"), "term", "stem")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("plural step: -ies/-es/-s families") {
    val m = stemAll(Seq(
      "cities", "churches", "wishes", "classes", "boxes", "quizzes",
      "heroes", "potatoes", "goes", "dogs", "sizes", "horses", "videos",
      "corpus", "thus", "analysis", "basis", "miss", "physics",
      "economics", "gas", "has", "its", "ties", "dies", "buildings"))
    assert(m("cities") == "city")
    assert(m("churches") == "church")
    assert(m("wishes") == "wish")
    assert(m("classes") == "class")
    assert(m("boxes") == "box")
    assert(m("quizzes") == "quiz")
    assert(m("heroes") == "hero")
    assert(m("potatoes") == "potato")
    assert(m("goes") == "go")
    assert(m("dogs") == "dog")
    assert(m("sizes") == "size")
    assert(m("horses") == "horse")
    assert(m("videos") == "video")
    assert(m("corpus") == "corpus")
    assert(m("thus") == "thus")
    assert(m("analysis") == "analysis")
    assert(m("basis") == "basis")
    assert(m("miss") == "miss")
    assert(m("physics") == "physics")
    assert(m("economics") == "economics")
    assert(m("gas") == "gas")
    assert(m("has") == "has")
    assert(m("its") == "its")
    assert(m("ties") == "tie")
    assert(m("dies") == "die")
    assert(m("buildings") == "build") // plural THEN -ing: one pass each
  }

  test("past-tense step: -eed/-ied/-ed with undoubling and e-restore") {
    val m = stemAll(Seq(
      "speed", "feed", "agreed", "tried", "studied", "died",
      "stopped", "planned", "added", "wedded", "begged", "fitted",
      "moved", "loved", "solved", "argued", "continued", "danced",
      "noticed", "organized", "caused", "based", "raised", "increased",
      "passed", "missed", "liked", "looked", "worked", "walked",
      "asked", "wanted", "treated", "created", "changed", "urged",
      "engaged", "troubled", "settled", "handled", "called", "failed",
      "controlled", "used"))
    assert(m("speed") == "speed")
    assert(m("feed") == "feed")
    assert(m("agreed") == "agree") // exception table ('-eed' kept by rule)
    assert(m("tried") == "try")
    assert(m("studied") == "study")
    assert(m("died") == "die") // exception (len-4 '-ied')
    assert(m("stopped") == "stop")
    assert(m("planned") == "plan")
    assert(m("added") == "add") // dd NOT undoubled at stem length 3
    assert(m("wedded") == "wed")
    assert(m("begged") == "beg")
    assert(m("fitted") == "fit")
    assert(m("moved") == "move")
    assert(m("loved") == "love")
    assert(m("solved") == "solve") // 'v' restores unconditionally
    assert(m("argued") == "argue")
    assert(m("continued") == "continue")
    assert(m("danced") == "dance")
    assert(m("noticed") == "notice")
    assert(m("organized") == "organize")
    assert(m("caused") == "cause")
    assert(m("based") == "base")
    assert(m("raised") == "raise")
    assert(m("increased") == "increase")
    assert(m("passed") == "pass") // 'ss' stem: no restore
    assert(m("missed") == "miss")
    assert(m("liked") == "like") // k after single vowel
    assert(m("looked") == "look") // k after double vowel: no restore
    assert(m("worked") == "work")
    assert(m("walked") == "walk")
    assert(m("asked") == "ask")
    assert(m("wanted") == "want")
    assert(m("treated") == "treat") // vowel+'t': rule keeps bare stem…
    assert(m("created") == "create") // …exception table pins this one
    assert(m("changed") == "change") // 'g' restores unconditionally
    assert(m("urged") == "urge")
    assert(m("engaged") == "engage")
    assert(m("troubled") == "trouble") // l after non-l consonant
    assert(m("settled") == "settle")
    assert(m("handled") == "handle")
    assert(m("called") == "call") // 'll' kept below stem length 6
    assert(m("failed") == "fail") // l after vowel: no restore
    assert(m("controlled") == "control") // 'll' undoubled at length ≥ 6
    assert(m("used") == "use") // exception (below -ed length guard)
  }

  test("-ing step and short-form exceptions") {
    val m = stemAll(Seq(
      "running", "getting", "putting", "making", "taking", "giving",
      "moving", "looking", "working", "saying", "trying", "studying",
      "reading", "changing", "managing", "increasing", "processing",
      "selling", "telling", "controlling", "travelling", "spelling",
      "flying", "dying", "going", "doing", "using", "writing",
      "coming", "being", "having"))
    assert(m("running") == "run")
    assert(m("getting") == "get")
    assert(m("putting") == "put")
    assert(m("making") == "make")
    assert(m("taking") == "take")
    assert(m("giving") == "give")
    assert(m("moving") == "move")
    assert(m("looking") == "look")
    assert(m("working") == "work")
    assert(m("saying") == "say")
    assert(m("trying") == "try")
    assert(m("studying") == "study")
    assert(m("reading") == "read")
    assert(m("changing") == "change")
    assert(m("managing") == "manage")
    assert(m("increasing") == "increase")
    assert(m("processing") == "process")
    assert(m("selling") == "sell")
    assert(m("telling") == "tell")
    assert(m("controlling") == "control")
    assert(m("travelling") == "travel")
    assert(m("spelling") == "spell")
    assert(m("flying") == "fly")
    assert(m("dying") == "die") // exception
    assert(m("going") == "go") // exception
    assert(m("doing") == "do") // exception
    assert(m("using") == "use") // exception
    assert(m("writing") == "write") // exception (vowel+'t')
    assert(m("coming") == "come") // exception ('m' never restores)
    assert(m("being") == "being") // pinned unchanged
    assert(m("having") == "have")
  }

  test("documented divergences vs dictionary Krovetz") {
    // Cases where only a head-word dictionary can decide; the rule
    // output is pinned here so the divergence is explicit, not silent.
    val m = stemAll(Seq("writing", "biased", "toes", "goes", "covered"))
    // 'biased': rule sees vowel+'s' and restores → 'biase' (dict: 'bias')
    assert(m("biased") == "biase")
    // 'covered': 'r' never restores → 'cover' (dict agrees — listed as
    // the boundary case for the vowel+consonant family)
    assert(m("covered") == "cover")
    // short '-oes' nouns need the table; unlisted ones lose the 'e'
    assert(m("toes") == "toe") // in table
    assert(m("goes") == "go")
  }
}
