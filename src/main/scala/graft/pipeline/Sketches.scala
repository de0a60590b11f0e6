package graft.pipeline

import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** Mergeable frequency sketches for corpus statistics at scales where
  * the exact computation's shuffle is the bottleneck.
  *
  * [[topKTermsMg]] is the scale path for "top-k terms over 100 TB":
  * a plain `groupBy(term).count.orderBy` shuffles the ENTIRE vocabulary
  * (every term string × every partial count); the Misra-Gries pass
  * reduces the cluster-wide traffic to one `capacity`-entry sketch per
  * partition merged on a treeAggregate combine tree (the px56 Bloom
  * treatment applied to frequency estimation), and the follow-up exact
  * recount shuffles only the candidate terms. Same final answer,
  * vocabulary-independent shuffle volume.
  */
object Sketches {

  /** Misra-Gries summary add: standard decrement-on-overflow. Any term
    * with true frequency > n/(capacity+1) is guaranteed to survive.
    */
  private[pipeline] def mgAdd(m: mutable.HashMap[String, Long], t: String,
                              capacity: Int): mutable.HashMap[String, Long] = {
    m.get(t) match {
      case Some(c) => m(t) = c + 1
      case None if m.size < capacity => m(t) = 1L
      case None => // decrement every counter; evict zeros
        val dead = mutable.ArrayBuffer.empty[String]
        m.keysIterator.foreach { k =>
          val c = m(k) - 1
          if (c <= 0) dead += k else m(k) = c
        }
        dead.foreach(m.remove)
    }
    m
  }

  /** Mergeable MG combine (Agarwal et al. 2013): sum counters, then
    * subtract the (capacity+1)-th largest count from all and evict
    * non-positives — the union keeps the same frequency-error bound.
    */
  private[pipeline] def mgMerge(m1: mutable.HashMap[String, Long],
                                m2: mutable.HashMap[String, Long],
                                capacity: Int): mutable.HashMap[String, Long] = {
    m2.foreach { case (k, v) => m1(k) = m1.getOrElse(k, 0L) + v }
    if (m1.size > capacity) {
      val vs = m1.values.toArray
      java.util.Arrays.sort(vs)
      val thr = vs(vs.length - capacity - 1) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      m1.keysIterator.foreach { k =>
        val c = m1(k) - thr
        if (c <= 0) dead += k else m1(k) = c
      }
      dead.foreach(m1.remove)
    }
    m1
  }

  /** Exact top-k terms through the sketch-then-recount plan:
    *  1. one narrow pass builds a `capacity`-entry MG sketch per
    *     partition, merged up a combine tree (treeAggregate — no
    *     vocabulary-sized shuffle anywhere);
    *  2. the surviving candidate terms (≤ capacity, broadcast) gate an
    *     exact recount, so the one real groupBy shuffles only
    *     candidate-term rows;
    *  3. exact top-k of the recount, (cnt desc, term) ordered.
    *
    * EXACT whenever the k-th true frequency exceeds n/(capacity+1) —
    * MG's survival guarantee; size `capacity` ≫ k for flat tails. The
    * recount makes the answer VERIFIABLE, and by default the op
    * enforces it: a returned count at or below n/(capacity+1) means a
    * true top-k term may have been evicted from every partition sketch
    * and the "top-k" silently wrong — that row RAISES with a
    * grow-capacity message instead (execution-time, per result row; n
    * is counted inside the same sketch pass, no extra scan).
    * `certify = false` opts a caller into the uncertified answer.
    * Low-pressure corpora (vocabulary at/below capacity) are detected
    * exactly (r14): a sketch that never EVICTED holds the full
    * vocabulary, so its recount is certifiably exact at any size —
    * no bound check, vocab < k returns all terms, the empty corpus
    * returns empty; only an evicted sketch pays the
    * survival-guarantee gate (which also refuses a truncated top-k:
    * fewer candidates than k under eviction means the absent ranks
    * are uncertifiable).
    */
  def topKTermsMg(docs: DataFrame, k: Int, capacity: Int = 4096,
                  certify: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = TextOps.tokens(docs).select("term")
    // `ev` tracks whether ANY sketch ever evicted (review r14): a
    // never-evicted sketch holds the EXACT vocabulary, so its recount
    // is certifiably exact at any size — including vocab < k and the
    // empty corpus — with no bound check at all; only an evicted
    // sketch needs the survival-guarantee machinery below.
    val (candMap, n, evicted) = toks.as[String].rdd
      .treeAggregate((mutable.HashMap.empty[String, Long], 0L, false))(
        { case ((m, c, ev), t) =>
          val willEvict = !m.contains(t) && m.size >= capacity
          (mgAdd(m, t, capacity), c + 1L, ev || willEvict) },
        { case ((m1, c1, e1), (m2, c2, e2)) =>
          val unionOver = (m1.keySet | m2.keySet).size > capacity
          (mgMerge(m1, m2, capacity), c1 + c2, e1 || e2 || unionOver) })
    val cands = candMap.keysIterator.toSeq
    val top = toks
      .join(broadcast(cands.toDF("term")), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("term"))
      .limit(k)
    if (!certify || !evicted) top
    else {
      // fewer candidates than k under eviction (review r14): every
      // term with freq > n/(capacity+1) SURVIVES the sketch, so a
      // candidate set smaller than k means ranks |cands|+1..k are all
      // at-or-below the bound — uncertifiable by the same rule the
      // row filter enforces; a truncated "certified" top-k would
      // silently pass otherwise. Driver-known, zero extra actions.
      require(cands.size >= k,
        s"topKTermsMg: only ${cands.size} sketch candidates for a " +
          s"certified top-$k — every absent rank is at or below " +
          s"n/(capacity+1); grow capacity (n=$n, capacity=$capacity) " +
          s"or pass certify = false")
      // FILTER predicate, not a column rewrite (r13 advice): a CASE
      // projected onto cnt is dropped by Catalyst column PRUNING the
      // moment a consumer selects only `term` — the certification
      // would silently vanish through the default certify=true path.
      // Filter predicates survive pruning; the CASE is true on every
      // certified row, so the filter drops nothing.
      val bound = n.toDouble / (capacity + 1)
      top.filter(expr(
        s"CASE WHEN cnt <= $bound THEN CAST(raise_error(concat(" +
          s"'topKTermsMg: returned count ', CAST(cnt AS STRING), " +
          s"' <= n/(capacity+1) = $bound: the MG survival guarantee " +
          s"cannot certify this top-$k (a true top-$k term may have " +
          s"been evicted); grow capacity (n=$n, capacity=$capacity) " +
          s"or pass certify = false')) AS BOOLEAN) ELSE true END"))
    }
  }
}
