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
    * MG's survival guarantee; size `capacity` ≫ k for flat tails (the
    * recount makes the answer verifiable: candidates carry exact
    * counts, so a k-th count ≤ n/(capacity+1) flags "grow capacity").
    */
  def topKTermsMg(docs: DataFrame, k: Int, capacity: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = TextOps.tokens(docs).select("term")
    val cands = toks.as[String].rdd
      .treeAggregate(mutable.HashMap.empty[String, Long])(
        mgAdd(_, _, capacity), mgMerge(_, _, capacity))
      .keysIterator.toSeq
    toks
      .join(broadcast(cands.toDF("term")), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("term"))
      .limit(k)
  }
}
