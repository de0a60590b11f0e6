package graft.pipeline

import graft.functions.DetHash
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned-filter primitives for corpus curation: the closed-form
  * classifier family real pipelines train against a trusted corpus
  * (GPT-3/CCNet-style quality classifier; DSIR importance weights,
  * Xie et al. 2023, arXiv:2302.03169). Both are pure aggregations —
  * "training" is counting — so the whole train+score path is one Spark
  * plan with no iterative driver loop and no model state outside the
  * plan.
  *
  * Scale design (100 TB):
  *  - Naive Bayes: token-granularity rows shuffle exactly twice — once
  *    to build per-term class counts (vocabulary-sized output), once to
  *    score (tf rows join term likelihoods ON term; vocabulary tables
  *    at web scale exceed broadcast limits, so a shuffle join on term is
  *    the honest default — Catalyst broadcasts automatically when the
  *    vocab is small).
  *  - DSIR: features are HASHED into a fixed bucket space (default
  *    1024), so the "model" is ≤ buckets rows regardless of corpus
  *    size — it broadcasts by construction, and scoring is a narrow
  *    map + one per-doc aggregation. This is the point of hashed
  *    features at scale: model size is O(buckets), not O(vocab).
  */
object Classify {

  /** px48's training label: a "curated slice" proxy (sources src0–src4
    * stand in for the trusted corpus a real deployment trains against,
    * e.g. Wikipedia in the GPT-3 filter). ONE string shared verbatim
    * with the DuckDB oracle (cross-engine rule: never two copies of a
    * gated formula).
    */
  val curatedLabelExpr: String =
    "CAST(CASE WHEN source IN ('src0','src1','src2','src3','src4')" +
      " THEN 1 ELSE 0 END AS INT)"

  /** px49's DSIR target-slice label (English docs). */
  val targetLangExpr: String =
    "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS INT)"

  /** (doc_id, y) labels frame from a 0/1 label expression. */
  def labels(docs: DataFrame, labelExpr: String): DataFrame =
    docs.select(col("doc_id"), expr(labelExpr).as("y"))

  /** Multinomial Naive Bayes with Laplace smoothing, trained on a
    * 0/1 `y` column of `labels` (doc_id, y), scoring every document
    * THAT HAS AT LEAST ONE TOKEN:
    * log-odds = Σ_t tf·(ln P(t|1) − ln P(t|0)) + ln(prior odds),
    * P(t|c) = (c(t,c)+1) / (N_c + V).
    * → (doc_id, n_tokens, log_odds, pred).
    *
    * Zero-token docs (empty/punctuation-only text) carry no term
    * evidence and are OMITTED from the output — the px48 oracle
    * mirrors the same inner-join shape, so the contract is
    * cross-engine-pinned. A caller needing prior-only rows for them
    * left-joins this output from `labels` and fills log_odds with
    * ln(d1/(d−d1)).
    *
    * Smoothing makes every term scorable for both classes —
    * including out-of-vocabulary terms (review r16): a term absent
    * from the labeled training docs contributes the fully-smoothed
    * ln(1/(N1+V)) − ln(1/(N0+V)) per occurrence through the LEFT
    * class-count join, so partial-label scoring covers every token
    * (the old inner join dropped OOV rows, undercounting n_tokens
    * and erasing all-OOV docs). Train-on-self (the px48 gate) has no
    * OOV terms and is unchanged.
    *
    * Degenerate training (labels all 1 or all 0) yields NULL
    * log_odds/pred — the prior odds are undefined. The nullif/ln-NULL
    * guard makes that a visible NULL instead of an ANSI
    * DIVIDE_BY_ZERO that would kill an hours-long job at its last
    * aggregation (ClassifySpec).
    */
  def naiveBayesLogOdds(docs: DataFrame, labels: DataFrame): DataFrame = {
    val tf = TextOps.termFreqs(docs)
    val ctc = tf.join(labels, Seq("doc_id"))
      .groupBy("term")
      .agg(expr("CAST(sum(CASE WHEN y = 1 THEN tf ELSE 0 END) AS BIGINT)")
        .as("c1"),
        expr("CAST(sum(CASE WHEN y = 0 THEN tf ELSE 0 END) AS BIGINT)")
          .as("c0"))
    val tot = ctc.agg(expr("CAST(sum(c1) AS BIGINT)").as("n1"),
      expr("CAST(sum(c0) AS BIGINT)").as("n0"),
      expr("CAST(count(*) AS BIGINT)").as("v"))
    val pri = labels.agg(expr("CAST(sum(y) AS BIGINT)").as("d1"),
      expr("CAST(count(*) AS BIGINT)").as("d"))
    // LEFT join + coalesce (review r16, the dsirLogWeights r14 shape):
    // scoring must cover out-of-vocabulary terms too — a term absent
    // from the labeled subcorpus contributes the smoothed
    // ln(1/(n1+v)) − ln(1/(n0+v)) per occurrence, not a silently
    // dropped row (which undercounted n_tokens and erased all-OOV
    // docs entirely). Identical when labels cover every doc — the
    // px48 oracle shape, whose SQL mirrors this join.
    tf.join(ctc, Seq("term"), "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(pri))
      .groupBy("doc_id")
      .agg(expr("CAST(sum(tf) AS BIGINT)").as("n_tokens"),
        sum(expr("tf * (ln((coalesce(c1, 0) + 1) / (n1 + v))" +
          " - ln((coalesce(c0, 0) + 1) / (n0 + v)))"))
          .as("s"),
        // Both degenerate directions guarded: d1=0 (all-negative) would
        // hit ln(0) — an out-of-range error under this session's ANSI
        // default and in DuckDB's mirrored SQL (NULL only with ANSI
        // off); nullif-ing the operand means ln never sees 0 and both
        // engines yield NULL.
        first(expr("ln(nullif(CAST(d1 AS DOUBLE), 0e0)" +
          " / nullif(CAST(d - d1 AS DOUBLE), 0e0))")).as("lp"))
      .select(col("doc_id"), col("n_tokens"),
        expr("round(s + lp, 6)").as("log_odds"),
        expr("CAST(CASE WHEN round(s + lp, 6) > 0 THEN 1" +
          " WHEN round(s + lp, 6) IS NULL THEN NULL ELSE 0 END AS INT)")
          .as("pred"))
  }

  /** DSIR-style importance weights over hashed unigram features:
    * per-token feature bucket b = h60(term) mod `buckets`; bucket
    * unigram LMs for the target slice (`y` = 1 rows of `labels`) and
    * the raw corpus (all rows), Laplace-smoothed; per-doc log
    * importance weight log w = Σ_tokens ln p_tgt(b) − ln p_raw(b).
    * → (doc_id, n_tokens, log_w, avg_log_w).
    *
    * The bucket LM table is ≤ `buckets` rows — broadcast by
    * construction at any corpus size.
    */
  def dsirLogWeights(docs: DataFrame, labels: DataFrame,
                     buckets: Int = 1024): DataFrame = {
    val feat = TextOps.tokens(docs)
      .select(col("doc_id"), (DetHash.h60(col("term")) % buckets).as("b"))
    // LEFT join (review r14): the raw-corpus LM must cover ALL docs —
    // the old inner join built BOTH models from the labeled subset,
    // and a bucket appearing only in unlabeled docs then vanished
    // from cnt, silently dropping those tokens from n_tokens/log_w at
    // the (inner) bucket join below. Identical when labels cover every
    // doc (the px49 oracle shape); honest when they do not.
    val cnt = feat.join(labels, Seq("doc_id"), "left")
      .groupBy("b")
      .agg(expr("CAST(sum(coalesce(y, 0)) AS BIGINT)").as("ct"),
        expr("CAST(count(*) AS BIGINT)").as("cr"))
    val tot = cnt.agg(expr("CAST(sum(ct) AS BIGINT)").as("nt"),
      expr("CAST(sum(cr) AS BIGINT)").as("nr"))
    feat.join(broadcast(cnt), Seq("b"))
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(expr("CAST(count(*) AS BIGINT)").as("n_tokens"),
        sum(expr(s"ln((ct + 1) / (nt + $buckets))" +
          s" - ln((cr + 1) / (nr + $buckets))")).as("lw"))
      .select(col("doc_id"), col("n_tokens"),
        expr("round(lw, 6)").as("log_w"),
        expr("round(lw / n_tokens, 6)").as("avg_log_w"))
  }
}
