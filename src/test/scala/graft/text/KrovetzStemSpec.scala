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
    assert(m("writing") == "write") // exception ('t' after 'i')
    assert(m("coming") == "come") // 'm' after single 'o' restores
    assert(m("being") == "being") // pinned unchanged
    assert(m("having") == "have")
  }

  test("dictionary layer: headword protection") {
    val m = stemAll(Seq(
      "during", "morning", "evening", "nothing", "something", "spring",
      "string", "hundred", "sacred", "naked", "wicked", "alias", "bias",
      "atlas", "chaos", "lens", "always", "perhaps", "diabetes"))
    for (w <- Seq("during", "morning", "evening", "nothing", "something",
      "spring", "string", "hundred", "sacred", "naked", "wicked",
      "alias", "bias", "atlas", "chaos", "lens", "always", "perhaps",
      "diabetes")) assert(m(w) == w, s"headword '$w' must not stem")
  }

  test("dictionary layer: irregular conflations") {
    val m = stemAll(Seq(
      "cookies", "gases", "buses", "viruses", "does", "vied", "owed",
      "eyed", "iced", "vying", "owing", "suing", "aging", "biased",
      "noted", "voted", "rated", "stated", "united", "hoped", "typed",
      "required", "compared", "scored", "ignored", "measured",
      "guided", "updated"))
    assert(m("cookies") == "cookie")
    assert(m("gases") == "gas")
    assert(m("buses") == "bus")
    assert(m("viruses") == "virus")
    assert(m("does") == "do")
    assert(m("vied") == "vie")
    assert(m("owed") == "owe")
    assert(m("eyed") == "eye")
    assert(m("iced") == "ice")
    assert(m("vying") == "vie")
    assert(m("owing") == "owe")
    assert(m("suing") == "sue")
    assert(m("aging") == "age")
    assert(m("biased") == "bias")
    assert(m("noted") == "note")
    assert(m("voted") == "vote")
    assert(m("rated") == "rate")
    assert(m("stated") == "state")
    assert(m("united") == "unite")
    assert(m("hoped") == "hope")
    assert(m("typed") == "type")
    assert(m("required") == "require")
    assert(m("compared") == "compare")
    assert(m("scored") == "score")
    assert(m("ignored") == "ignore")
    assert(m("measured") == "measure")
    assert(m("guided") == "guide")
    assert(m("updated") == "update")
  }

  test("round-9 e-restore families: n/m/d/b after single vowel") {
    val m = stemAll(Seq(
      "decided", "divided", "provided", "included", "named", "timed",
      "assumed", "welcomed", "claimed", "seemed", "performed",
      "defined", "combined", "examined", "determined", "joined",
      "happened", "mentioned", "abandoned", "described", "absorbed",
      "climbed", "attended", "loaded", "recorded", "deciding",
      "naming", "defining", "assuming", "describing", "happening",
      "shining", "meaning", "opening", "reasoning"))
    assert(m("decided") == "decide") // d after single 'i'
    assert(m("divided") == "divide")
    assert(m("provided") == "provide")
    assert(m("included") == "include") // d after single 'u'
    assert(m("named") == "name") // m after single 'a'
    assert(m("timed") == "time")
    assert(m("assumed") == "assume")
    assert(m("welcomed") == "welcome") // m after single 'o'
    assert(m("claimed") == "claim") // double vowel: no restore
    assert(m("seemed") == "seem") // 'e' vowel excluded
    assert(m("performed") == "perform") // consonant before m
    assert(m("defined") == "define") // n after single 'i'
    assert(m("combined") == "combine")
    assert(m("examined") == "examine")
    assert(m("determined") == "determine")
    assert(m("joined") == "join") // double vowel
    assert(m("happened") == "happen") // 'e' excluded
    assert(m("mentioned") == "mention") // n restores only after 'i'
    assert(m("abandoned") == "abandon")
    assert(m("described") == "describe") // b after single 'i'
    assert(m("absorbed") == "absorb") // consonant before b
    assert(m("climbed") == "climb")
    assert(m("attended") == "attend") // consonant before d
    assert(m("loaded") == "load") // double vowel
    assert(m("recorded") == "record")
    assert(m("deciding") == "decide") // same families over -ing
    assert(m("naming") == "name")
    assert(m("defining") == "define")
    assert(m("assuming") == "assume")
    assert(m("describing") == "describe")
    assert(m("happening") == "happen")
    assert(m("shining") == "shine")
    assert(m("meaning") == "mean")
    assert(m("opening") == "open")
    assert(m("reasoning") == "reason")
  }

  test("r16 divergence list now resolves to dictionary answers (r17 " +
    "magic-e table entries); residual = unlisted rare tail only") {
    val m = stemAll(Seq(
      "covered", "visited", "limited", "developed", "honored",
      "answered", "moped", "sited", "doted", "dethroned", "hoed",
      "craned", "griped", "toes", "goes", "hoes"))
    // 'r' after 'e'/'o' never restores → dict agrees on the
    // -ered/-ored noun-verbs (cover, answer, honor)
    assert(m("covered") == "cover")
    assert(m("answered") == "answer")
    assert(m("honored") == "honor")
    // 't'/'p' after 'i'/'o' never restore: right for visit/limit/
    // develop; the magic-e members are table entries since r17
    assert(m("visited") == "visit")
    assert(m("limited") == "limit")
    assert(m("developed") == "develop")
    assert(m("sited") == "site")
    assert(m("doted") == "dote")
    assert(m("griped") == "gripe")
    assert(m("dethroned") == "dethrone")
    assert(m("hoed") == "hoe")
    assert(m("craned") == "crane")
    // the HOMOGRAPH case: dictionary Krovetz returns the headword
    // 'moped' (the vehicle) unchanged — protection wins over mope+ed
    assert(m("moped") == "moped")
    // length-4 '-oes' drops only the 's' (toe/hoe/foe/woe nouns);
    // goes/does conflate via the table
    assert(m("toes") == "toe")
    assert(m("hoes") == "hoe")
    assert(m("goes") == "go")
  }

  test("r18 family curation: the l-after-single-vowel and -ede " +
    "magic-e families resolve to dictionary answers (r17 verdict " +
    "item 4 — StemProbe family sweep)") {
    val m = stemAll(Seq(
      "filed", "smiled", "piled", "compiled", "reconciled", "profiled",
      "ruled", "scheduled", "poled", "doled", "holed", "moled",
      "consoled", "paroled", "scaled", "exhaled", "inhaled",
      "ceded", "preceded", "receded", "conceded", "superseded",
      "stampeded", "impeded", "sniped",
      // the unstressed-final-syllable side the rules already get
      // right and the table must NOT touch
      "penciled", "stenciled", "imperiled", "modeled", "totaled"))
    assert(m("filed") == "file" && m("smiled") == "smile")
    assert(m("piled") == "pile" && m("compiled") == "compile")
    assert(m("reconciled") == "reconcile" && m("profiled") == "profile")
    assert(m("ruled") == "rule" && m("scheduled") == "schedule")
    assert(m("poled") == "pole" && m("doled") == "dole")
    assert(m("holed") == "hole" && m("moled") == "mole")
    assert(m("consoled") == "console" && m("paroled") == "parole")
    assert(m("scaled") == "scale" && m("exhaled") == "exhale")
    assert(m("inhaled") == "inhale")
    assert(m("ceded") == "cede" && m("preceded") == "precede")
    assert(m("receded") == "recede" && m("conceded") == "concede")
    assert(m("superseded") == "supersede")
    assert(m("stampeded") == "stampede" && m("impeded") == "impede")
    assert(m("sniped") == "snipe")
    assert(m("penciled") == "pencil" && m("stenciled") == "stencil")
    assert(m("imperiled") == "imperil" && m("modeled") == "model")
    assert(m("totaled") == "total")
  }

  test("documented residual divergence: the unlisted rare magic-e tail") {
    // Any finite table has a tail: a rare unlisted magic-e stem still
    // falls to the rules, which correctly refuse to restore 'e' for
    // its pattern class (ril-/pul- in the l-after-single-vowel family,
    // where penciled/imperiled/modeled prove blanket restore wrong).
    // Pinned so the residual class is explicit, not silent; closing
    // it entirely needs the full ~30k-headword kstem lexicon, which
    // is not reachable in this environment (zero egress; r18 re-
    // checked — /usr/share/dict is absent and the testdata vocabulary
    // is 31 uninflected tokens, so no in-sandbox headword source
    // exists). Retrieval-rank impact is negligible (VERDICT r16
    // §missing item 1).
    val m = stemAll(Seq("riled", "puled"))
    assert(m("riled") == "ril") // dict: rile
    assert(m("puled") == "pul") // dict: pule
  }

  test("r16 rule families: t/r/p/n/d dictionary-completion by orthography") {
    val m = stemAll(Seq(
      // 't' after 'a'/'u' (incl. ia/ua hiatus), bare after e/o digraphs
      "generated", "estimated", "celebrated", "graduated", "situated",
      "associated", "appreciated", "computed", "disputed", "executed",
      "contributed", "distributed", "treated", "heated", "coated",
      "shouted", "doubted", "suited", "recruited",
      // 'r' after 'a'/'i'/'u' (incl. ua hiatus), bare after digraphs
      "squared", "acquired", "inquired", "wired", "endured", "matured",
      "insured", "assured", "structured", "lectured", "ventured",
      "feared", "cleared", "appeared", "soared", "paired", "repaired",
      "aired", "colored", "occurred",
      // 'p' after 'a', bare after ea/oa digraphs
      "escaped", "draped", "scraped", "heaped", "leaped", "soaped",
      "galloped", "gossiped", "worshiped",
      // 'n' after 'u' and short-stem 'o'
      "phoned", "phoning", "toned", "zoned", "cloned", "stoned",
      "honed", "tuned", "pruned", "attuned", "reasoned", "summoned",
      "pardoned", "mentioned", "owned", "crooned",
      // 'd' through the 'u' hiatus, bare after other vowel digraphs
      "persuaded", "dissuaded", "applauded", "lauded", "feuded",
      "shrouded", "loaded", "headed", "raided", "avoided",
      // table-pinned false positives of the new rules
      "murmured", "ironed", "ironing", "postponed", "combated",
      "debuted", "bottomed", "blossomed", "waned",
      "sugared", "collared", "beggared"))
    assert(m("generated") == "generate" && m("estimated") == "estimate")
    assert(m("celebrated") == "celebrate")
    assert(m("graduated") == "graduate" && m("situated") == "situate")
    assert(m("associated") == "associate")
    assert(m("appreciated") == "appreciate")
    assert(m("computed") == "compute" && m("disputed") == "dispute")
    assert(m("executed") == "execute")
    assert(m("contributed") == "contribute")
    assert(m("distributed") == "distribute")
    assert(m("treated") == "treat" && m("heated") == "heat")
    assert(m("coated") == "coat" && m("shouted") == "shout")
    assert(m("doubted") == "doubt" && m("suited") == "suit")
    assert(m("recruited") == "recruit")
    assert(m("squared") == "square" && m("acquired") == "acquire")
    assert(m("inquired") == "inquire" && m("wired") == "wire")
    assert(m("endured") == "endure" && m("matured") == "mature")
    assert(m("insured") == "insure" && m("assured") == "assure")
    assert(m("structured") == "structure")
    assert(m("lectured") == "lecture" && m("ventured") == "venture")
    assert(m("feared") == "fear" && m("cleared") == "clear")
    assert(m("appeared") == "appear" && m("soared") == "soar")
    assert(m("paired") == "pair" && m("repaired") == "repair")
    assert(m("aired") == "air" && m("colored") == "color")
    assert(m("occurred") == "occur")
    assert(m("escaped") == "escape" && m("draped") == "drape")
    assert(m("scraped") == "scrape" && m("heaped") == "heap")
    assert(m("leaped") == "leap" && m("soaped") == "soap")
    assert(m("galloped") == "gallop" && m("gossiped") == "gossip")
    assert(m("worshiped") == "worship")
    assert(m("phoned") == "phone" && m("phoning") == "phone")
    assert(m("toned") == "tone" && m("zoned") == "zone")
    assert(m("cloned") == "clone" && m("stoned") == "stone")
    assert(m("honed") == "hone" && m("tuned") == "tune")
    assert(m("pruned") == "prune" && m("attuned") == "attune")
    assert(m("reasoned") == "reason" && m("summoned") == "summon")
    assert(m("pardoned") == "pardon" && m("mentioned") == "mention")
    assert(m("owned") == "own" && m("crooned") == "croon")
    assert(m("persuaded") == "persuade" && m("dissuaded") == "dissuade")
    assert(m("applauded") == "applaud" && m("lauded") == "laud")
    assert(m("feuded") == "feud" && m("shrouded") == "shroud")
    assert(m("loaded") == "load" && m("headed") == "head")
    assert(m("raided") == "raid" && m("avoided") == "avoid")
    assert(m("murmured") == "murmur")
    assert(m("ironed") == "iron" && m("ironing") == "iron")
    assert(m("postponed") == "postpone" && m("combated") == "combat")
    assert(m("debuted") == "debut" && m("bottomed") == "bottom")
    assert(m("blossomed") == "blossom" && m("waned") == "wane")
    assert(m("sugared") == "sugar" && m("collared") == "collar")
    assert(m("beggared") == "beggar")
  }

  test("r16 post-plural dictionary consult: plurals of protected headwords") {
    // Without the second dictionary probe, 'strings' → plural →
    // 'string' → the -ing rule → 'str'. Krovetz consults the lexicon
    // after each step; our pipeline consults the table on the
    // plural-stripped form too.
    val m = stemAll(Seq(
      "strings", "springs", "mornings", "evenings", "ceilings",
      "siblings", "dwellings", "weddings", "earrings", "puddings",
      "writings", "buildings", "kings", "things",
      "wedding", "lightning", "offspring", "earring", "outstanding",
      "awning", "crooked", "beloved", "jagged", "whereas", "upstairs",
      "downstairs", "overseas", "corps", "headquarters", "scissors"))
    assert(m("strings") == "string")
    assert(m("springs") == "spring")
    assert(m("mornings") == "morning")
    assert(m("evenings") == "evening")
    assert(m("ceilings") == "ceiling")
    assert(m("siblings") == "sibling")
    assert(m("dwellings") == "dwelling")
    assert(m("weddings") == "wedding")
    assert(m("earrings") == "earring")
    assert(m("puddings") == "pudding")
    assert(m("writings") == "write") // conflation applies post-plural too
    assert(m("buildings") == "build") // unprotected gerunds still stem
    assert(m("kings") == "king") // below the -ing guard anyway
    assert(m("things") == "thing")
    // and the new protections themselves
    for (w <- Seq("wedding", "lightning", "offspring", "earring",
      "outstanding", "awning", "crooked", "beloved", "jagged",
      "whereas", "upstairs", "downstairs", "overseas", "corps",
      "headquarters", "scissors"))
      assert(m(w) == w, s"headword '$w' must not stem")
  }

  test("krovetz_ex native lookup == generated exception CASE, all entries + non-entries") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // The Spark plan consults the dictionary through the native
    // krovetz_ex HashMap probe while the DuckDB oracle runs the
    // generated CASE (KrovetzStem.exceptionSql) — same table, two
    // evaluators. Diff them over every exception key, near-miss
    // variants (prefix/suffix-extended, case-flipped), and regular
    // words: any row where they disagree is a cross-engine hash
    // mismatch waiting to happen in px15.
    val keys = KrovetzStem.exceptions.map(_._1)
    val probes = keys ++ keys.map(_ + "x") ++ keys.map("x" + _) ++
      keys.map(_.capitalize) ++
      Seq("running", "walked", "cities", "", "a", "zzzz")
    val out = probes.toDF("term")
      .withColumn("nat", expr("krovetz_ex(term)"))
      .withColumn("gen", expr(KrovetzStem.exceptionSql("term")))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"krovetz_ex('${r.getString(0)}') = ${r.getString(1)} " +
          s"but generated CASE = ${r.getString(2)}")
    }
    // and the table really maps every entry (no silent null)
    val hit = out.take(keys.size)
    assert(hit.forall(_.getString(1) != null))
  }

  test("krovetz_ex: interpreted eval (constant folding), nulls, multibyte") {
    import org.apache.spark.sql.functions.expr
    // literal input → ConstantFolding evaluates nullSafeEval (the
    // interpreted path), not codegen: both evaluators must agree
    val r = spark.range(1).select(
      expr("krovetz_ex('movies')").as("hitc"),
      expr("krovetz_ex('zzznope')").as("missc"),
      expr("krovetz_ex(CAST(NULL AS STRING))").as("nullc"),
      expr("krovetz_ex('héllo')").as("mbc"), // multibyte: miss, no error
      expr("krovetz_ex('Movies')").as("casec") // exact bytes only
    ).head()
    assert(r.getString(0) == "movie")
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("review-r14 families: -ng stems, z-final stems, -ing twins") {
    val m = stemAll(Seq(
      // -ng verbs: restoreE's 'g' rule must not mint 'singe'/'belonge'
      "singing", "bringing", "hanging", "hanged", "belonging",
      "belonged", "longing", "springing",
      // ...while the chang-/manag- family still restores its 'e'
      "changing", "managing", "arranging", "challenging",
      // z policy: doubled stems keep their zz; quiz (which doubles in
      // inflection) conflates via the table
      "buzzes", "buzzed", "buzzing", "jazzes", "quizzes", "quizzed",
      "quizzing",
      // -ed/-ing twins that used to stem apart
      "tired", "tiring", "bored", "boring", "figured", "figuring",
      "captured", "capturing", "secured", "securing"))
    assert(m("singing") == "sing" && m("bringing") == "bring")
    assert(m("hanging") == "hang" && m("hanged") == "hang")
    assert(m("belonging") == "belong" && m("belonged") == "belong")
    assert(m("longing") == "long" && m("springing") == "spring")
    assert(m("changing") == "change" && m("managing") == "manage")
    assert(m("arranging") == "arrange" && m("challenging") == "challenge")
    assert(m("buzzes") == "buzz" && m("buzzed") == "buzz"
      && m("buzzing") == "buzz" && m("jazzes") == "jazz")
    assert(m("quizzes") == "quiz" && m("quizzed") == "quiz"
      && m("quizzing") == "quiz")
    assert(m("tired") == "tire" && m("tiring") == "tire")
    assert(m("bored") == "bore" && m("boring") == "bore")
    assert(m("figured") == "figure" && m("figuring") == "figure")
    assert(m("captured") == "capture" && m("capturing") == "capture")
    assert(m("secured") == "secure" && m("securing") == "secure")
  }
}
