package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl

/** Model- and experiment-evaluation family: the measurement layer a
  * training-data pipeline runs AROUND its filters and experiments —
  * classifier discrimination (exact rank-sum AUC), calibration (reliability
  * bins + ECE), experiment-harness A/A calibration (two-proportion z²),
  * first-digit conformance (Benford audit), aggregation-bias detection
  * (Simpson's paradox), and local-DP telemetry (randomized response with
  * the debiased estimator).
  *
  * House discipline throughout: every statistic is exact integer/rational
  * arithmetic (rank sums, ppm floor-divisions, decimal(38,0) products), so
  * the DuckDB oracle checks the VALUE, not a float neighborhood. Floor
  * division on possibly-negative numerators uses the pmod trick
  * (`(a - pmod(a,b))/b`) to match DuckDB's flooring `//`; non-negative
  * numerators ride `div` (trunc == floor there).
  */
object EvalQueries {

  /** TRUE floor division (both Spark `div` and DuckDB `//` truncate toward
    * zero — verified: `-3 // 5 = 0` in DuckDB 1.0): subtract the
    * non-negative pmod first, then the integral divide is exact — no
    * fractional part, so trunc == floor. The paired oracle must floor too
    * (`floor(a / b.0)` on small magnitudes). For plain truncating division
    * on possibly-negative numerators, use `div`/`//` directly — they
    * already agree. */
  private def fdiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("div", a - pmod(a, b), b)
  private def fdiv(a: org.apache.spark.sql.Column, b: Long): org.apache.spark.sql.Column =
    fdiv(a, lit(b))

  def queries: Seq[QueryDef] = Seq(

    // Exact ROC-AUC of the q122 linear quality classifier, per source,
    // against a deterministic positive class (lang = 'en' — the weights
    // are English-token weights, so discrimination is the thing being
    // measured). AUC = tie-corrected Mann-Whitney rank-sum: with average
    // ranks doubled to stay integral, auc = (2·R⁺ − n⁺(n⁺+1)) / (2·n⁺n⁻)
    // — an exact rational, emitted as num/den plus a ppm floor-division.
    // Scale: the rank window partitions BY SOURCE (frames = docs-per-
    // source, never the corpus); everything else is one partial-agg
    // rollup. At 100 TB the per-source frame is the only sort.
    QueryDef(
      "q278_classifier_auc",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val m = Curation.linearGate(docs, "text", "doc_id",
          Curation.DemoWeights.toMap, Curation.DemoBias)
          .select(col("doc_id"), col("margin"))
        val labeled = m.join(
          docs.select(col("doc_id"), col("source").as("grp"),
            (col("lang") === "en").cast("int").as("pos")), Seq("doc_id"))
          .select(col("grp"), col("margin").as("score"), col("pos"))
        Evaluation.rankSumAuc(labeled)
          .withColumnRenamed("grp", "source")
          .orderBy("source")
      },
      Some(s"""WITH w(tok, wt) AS (SELECT * FROM (VALUES ${Curation.demoWeightsValuesSql})),
              |t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
              |m AS (SELECT t.doc_id, CAST(${Curation.DemoBias} + COALESCE(SUM(w.wt), 0) AS BIGINT) AS margin
              |      FROM t LEFT JOIN w USING (tok) GROUP BY t.doc_id),
              |s AS (SELECT d.source, m.margin, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
              |      FROM m JOIN documents d USING (doc_id)),
              |r AS (SELECT source, pos,
              |        rank() OVER (PARTITION BY source ORDER BY margin) AS rk,
              |        COUNT(*) OVER (PARTITION BY source, margin) AS ties
              |      FROM s),
              |agg AS (SELECT source,
              |        CAST(SUM(pos) AS BIGINT) AS n_pos,
              |        CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
              |        CAST(SUM(CASE WHEN pos = 1 THEN 2*rk + ties - 1 ELSE 0 END) AS BIGINT) AS r2_pos
              |      FROM r GROUP BY source)
              |SELECT source, n_pos, n_neg,
              |  r2_pos - n_pos*(n_pos+1) AS auc_num,
              |  2*n_pos*n_neg AS auc_den,
              |  (r2_pos - n_pos*(n_pos+1)) * 1000000 // NULLIF(2*n_pos*n_neg, 0) AS auc_ppm
              |FROM agg ORDER BY source""".stripMargin),
    ),


    // Calibration of the same classifier: reliability bins over the margin
    // (width-5 floor bins), observed positive rate vs the model's linear
    // link prediction (margin range [-17, 43] mapped to [0, 1] and clamped),
    // plus the expected calibration error as one N-weighted ppm scalar
    // repeated per row. The per-bin rollup partial-aggregates; the ECE
    // window runs over ~a dozen bin rows (bounded by margin range / 5,
    // not by data).
    QueryDef(
      "q279_calibration_bins",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val m = Curation.linearGate(docs, "text", "doc_id",
            Curation.DemoWeights.toMap, Curation.DemoBias)
          .join(docs.select(col("doc_id"),
            (col("lang") === "en").cast("long").as("pos")), Seq("doc_id"))
          .select(fdiv(col("margin"), 5L).cast("long").as("bin"), col("pos"))
        val bins = m.groupBy("bin")
          .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
          .select(col("bin"), col("n"), col("n_pos"),
            expr("n_pos * 1000000 div n").as("obs_ppm"),
            least(lit(1000000L),
              expr("greatest(0L, bin*5 + 2 + 17) * 1000000 div 60")).as("pred_ppm"))
        val all = Window.partitionBy(lit(1))
        bins.select(col("bin"), col("n"), col("n_pos"), col("obs_ppm"), col("pred_ppm"),
            call_function("div",
              sum(col("n") * abs(col("obs_ppm") - col("pred_ppm"))).over(all),
              sum(col("n")).over(all)).as("ece_ppm"))
          .orderBy("bin")
      },
      Some(s"""WITH w(tok, wt) AS (SELECT * FROM (VALUES ${Curation.demoWeightsValuesSql})),
              |t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
              |m AS (SELECT t.doc_id, CAST(${Curation.DemoBias} + COALESCE(SUM(w.wt), 0) AS BIGINT) AS margin
              |      FROM t LEFT JOIN w USING (tok) GROUP BY t.doc_id),
              |s AS (SELECT CAST(floor(m.margin / 5.0) AS BIGINT) AS bin, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
              |      FROM m JOIN documents d USING (doc_id)),
              |b AS (SELECT bin, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos FROM s GROUP BY bin),
              |e AS (SELECT bin, n, n_pos,
              |        n_pos * 1000000 // n AS obs_ppm,
              |        LEAST(1000000, GREATEST(0, bin*5 + 2 + 17) * 1000000 // 60) AS pred_ppm
              |      FROM b)
              |SELECT bin, n, n_pos, obs_ppm, pred_ppm,
              |  CAST(SUM(n * abs(obs_ppm - pred_ppm)) OVER () // SUM(n) OVER () AS BIGINT) AS ece_ppm
              |FROM e ORDER BY bin""".stripMargin),
    ),


    // Experiment-harness A/A calibration: users hash-split into two arms
    // that received IDENTICAL treatment, per-day purchase-share compared
    // with the pooled two-proportion z² statistic — a healthy assignment
    // hash flags ~no days at z² > 4. z² is exact-rational:
    // z² = N·(c₁n₂ − c₂n₁)² / (C·(N−C)·n₁·n₂), emitted as a ppm
    // floor-division over decimal(38,0) products (numerator is a square,
    // so trunc == floor). Map-side: one conditional-sum rollup per day;
    // no joins, no windows. decimal(38,0) keeps the products exact to
    // ~10^18-row days.
    QueryDef(
      "q280_aa_test",
      (s, dir) => {
        tbl(s, dir, "events")
          .select(call_function("div", col("ts"), lit(86400000000000L)).as("day"),
            pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"),
            (col("event_type") === "purchase").cast("long").as("conv"))
          .groupBy("day")
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
            sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c2"))
          .transform(Evaluation.withZ2Ppm)
          .orderBy("day")
      },
      Some("""WITH e AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
             |  FROM events),
             |g AS (SELECT day,
             |   CAST(SUM(CASE WHEN arm=0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |   CAST(SUM(CASE WHEN arm=0 THEN conv ELSE 0 END) AS BIGINT) AS c1,
             |   CAST(SUM(CASE WHEN arm=1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |   CAST(SUM(CASE WHEN arm=1 THEN conv ELSE 0 END) AS BIGINT) AS c2
             | FROM e GROUP BY day),
             |z AS (SELECT day, n1, c1, n2, c2,
             |  CASE WHEN (c1+c2) = 0 OR (c1+c2) = (n1+n2) OR n1 = 0 OR n2 = 0 THEN NULL
             |    ELSE CAST(CAST(n1+n2 AS HUGEINT) * (c1*n2 - c2*n1) * (c1*n2 - c2*n1) * 1000000
             |         // (CAST(c1+c2 AS HUGEINT) * ((n1+n2)-(c1+c2)) * n1 * n2) AS BIGINT)
             |    END AS z2_ppm
             | FROM g)
             |SELECT day, n1, c1, n2, c2, z2_ppm,
             |  COALESCE(z2_ppm > 4000000, FALSE) AS flagged
             |FROM z ORDER BY day""".stripMargin),
    ),


    // Benford first-significant-digit audit on order totals, per priority
    // class — the classic fabricated-amounts / data-quality screen. First
    // digit read off the cents BIGINT's string head (exact in both
    // engines); expected shares are the fixed Benford ppm literals
    // (log₁₀(1+1/d), precomputed — the interpolate-the-model pattern);
    // χ² accumulated per digit as an exact e6-scaled integer over
    // decimal(38,0) squares and compared against the df=8, α=0.05
    // critical value 15.507. One rollup + a 9-row-per-group densified
    // grid; partial-aggs everywhere.
    QueryDef(
      "q281_benford_audit",
      (s, dir) => {
        Evaluation.benfordAudit(tbl(s, dir, "orders")
            .select(col("o_orderpriority").as("grp"),
              round(col("o_totalprice") * 100, 0).cast("long").as("cents")))
          .withColumnRenamed("grp", "prio")
          .withColumnRenamed("n_rows", "n_orders")
          .orderBy("prio")
      },
      Some("""WITH b(dig, e_d) AS (SELECT * FROM (VALUES (1, 301030), (2, 176091),
             |  (3, 124939), (4, 96910), (5, 79181), (6, 66947), (7, 57992),
             |  (8, 51153), (9, 45757))),
             |d AS (
             |  SELECT o_orderpriority AS prio,
             |    CAST(substring(CAST(CAST(round(o_totalprice*100, 0) AS BIGINT) AS VARCHAR),1,1) AS BIGINT) AS dig
             |  FROM orders),
             |c AS (SELECT prio, dig, COUNT(*) AS n_d FROM d GROUP BY prio, dig),
             |grid AS (SELECT p.prio, b.dig, b.e_d FROM (SELECT DISTINCT prio FROM c) p CROSS JOIN b),
             |dense AS (
             |  SELECT g.prio, g.dig, g.e_d, COALESCE(c.n_d, 0) AS n_d
             |  FROM grid g LEFT JOIN c ON g.prio = c.prio AND g.dig = c.dig),
             |t AS (
             |  SELECT prio, dig, n_d,
             |    SUM(n_d) OVER (PARTITION BY prio) AS n,
             |    CAST((CAST(n_d AS HUGEINT)*1000000 - CAST(SUM(n_d) OVER (PARTITION BY prio) AS HUGEINT)*e_d)
             |      * (CAST(n_d AS HUGEINT)*1000000 - CAST(SUM(n_d) OVER (PARTITION BY prio) AS HUGEINT)*e_d)
             |      // (CAST(SUM(n_d) OVER (PARTITION BY prio) AS HUGEINT) * e_d) AS BIGINT) AS term
             |  FROM dense)
             |SELECT prio, CAST(MAX(n) AS BIGINT) AS n_orders,
             |  CAST(SUM(CASE WHEN dig = 1 THEN n_d ELSE 0 END) AS BIGINT) AS n_digit1,
             |  CAST(SUM(term) AS BIGINT) AS chi2_e6,
             |  CAST(SUM(term) AS BIGINT) <= 15507000 AS benford_ok
             |FROM t GROUP BY prio ORDER BY prio""".stripMargin),
    ),


    // Simpson's-paradox detector: does the order-date → order-value trend
    // per priority class contradict the pooled trend? Exact integer
    // covariance SIGNS via the moment identity n·Σxy − Σx·Σy (x = epoch
    // day centered on a fixed literal, y = cents) over decimal(38,0);
    // per-pair covariance magnitude floor-divided by n² so the emitted
    // scale is sf-invariant. One rollup + a broadcast 1-row pooled join —
    // no windows, no shuffle beyond the 5-group agg.
    QueryDef(
      "q282_simpson_audit",
      (s, dir) => {
        val o = tbl(s, dir, "orders").select(
          col("o_orderpriority").as("grp"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000 - 9000").as("x"),
          round(col("o_totalprice") * 100, 0).cast("long").as("y"))
        val per = Evaluation.covSigns(o, Seq("grp"))
        val pooled = Evaluation.covSigns(o, Seq.empty)
          .select(col("sgn").as("pooled_sgn"), col("cov_pp").as("pooled_cov_pp"))
        per.crossJoin(broadcast(pooled))
          .select(col("grp"), col("n"), col("sgn"), col("cov_pp"),
            col("pooled_sgn"), col("pooled_cov_pp"),
            (col("sgn") =!= col("pooled_sgn")).as("simpson_flip"))
          .orderBy("grp")
      },
      Some("""WITH o AS (
             |  SELECT o_orderpriority AS grp,
             |    epoch_us(o_orderdate) // 86400000000 - 9000 AS x,
             |    CAST(round(o_totalprice*100, 0) AS BIGINT) AS y
             |  FROM orders),
             |m AS (SELECT grp, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             |        SUM(CAST(x AS HUGEINT) * y) AS sxy
             |      FROM o GROUP BY grp),
             |cv AS (SELECT grp, n, CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS cov FROM m),
             |p AS (SELECT CAST(COUNT(*) AS HUGEINT)*SUM(CAST(x AS HUGEINT) * y)
             |             - CAST(SUM(x) AS HUGEINT)*SUM(CAST(y AS HUGEINT)) AS cov,
             |             COUNT(*) AS n
             |      FROM o),
             |ps AS (SELECT CAST(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END AS BIGINT) AS pooled_sgn,
             |        CAST(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END AS BIGINT)
             |          * CAST(abs(cov) // (CAST(n AS HUGEINT)*n) AS BIGINT) AS pooled_cov_pp
             |      FROM p)
             |SELECT cv.grp, CAST(cv.n AS BIGINT) AS n,
             |  CAST(CASE WHEN cv.cov > 0 THEN 1 WHEN cv.cov < 0 THEN -1 ELSE 0 END AS BIGINT) AS sgn,
             |  CAST(CASE WHEN cv.cov > 0 THEN 1 WHEN cv.cov < 0 THEN -1 ELSE 0 END AS BIGINT)
             |    * CAST(abs(cv.cov) // (CAST(cv.n AS HUGEINT)*cv.n) AS BIGINT) AS cov_pp,
             |  ps.pooled_sgn, ps.pooled_cov_pp,
             |  CAST(CASE WHEN cv.cov > 0 THEN 1 WHEN cv.cov < 0 THEN -1 ELSE 0 END AS BIGINT)
             |    <> ps.pooled_sgn AS simpson_flip
             |FROM cv CROSS JOIN ps ORDER BY cv.grp""".stripMargin),
    ),


    // Randomized-response local-DP telemetry: each user's sensitive bit
    // (market segment = BUILDING) is reported truthfully with probability
    // 3/4 (hash coin), flipped otherwise; the per-nation debiased
    // estimator π̂ = (4·reports − n) / (2n) is exact-rational ppm
    // (pmod floor-division — the numerator goes negative), audited
    // against the true rate the mechanism is hiding. The whole query is
    // a distinct + broadcast-join + rollup: the privacy mechanism itself
    // is map-only and deterministic, so the oracle replays it bit-for-bit.
    QueryDef(
      "q283_randomized_response",
      (s, dir) => {
        val users = tbl(s, dir, "events").select(col("user_id")).distinct()
        val cust = tbl(s, dir, "customer").select(
          col("c_custkey").as("user_id"),
          col("c_nationkey").cast("long").as("nat"),
          (col("c_mktsegment") === "BUILDING").cast("long").as("truth"))
        val r = users.join(broadcast(cust), Seq("user_id"))
          .select(col("nat"), col("truth"),
            when(pmod(Sampling.portableHash(col("user_id")), lit(4)) < 3,
              col("truth")).otherwise(lit(1L) - col("truth")).as("rep"))
        r.groupBy("nat")
          .agg(count(lit(1)).as("n"), sum("truth").as("n_true"), sum("rep").as("n_rep"))
          .select(col("nat"), col("n"), col("n_true"), col("n_rep"),
            expr("(4*n_rep - n) * 1000000 div (2*n)").as("est_ppm"),
            expr("n_true * 1000000 div n").as("true_ppm"))
          .withColumn("err_ppm", abs(col("est_ppm") - col("true_ppm")))
          .orderBy("nat")
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |t AS (
             |  SELECT u.user_id, CAST(c.c_nationkey AS BIGINT) AS nat,
             |    CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS truth,
             |    CASE WHEN CAST(('0x' || substring(md5(CAST(u.user_id AS VARCHAR)),1,15)) AS BIGINT) % 4 < 3
             |         THEN 1 ELSE 0 END AS keep
             |  FROM u JOIN customer c ON u.user_id = c.c_custkey),
             |r AS (SELECT nat, truth, CASE WHEN keep = 1 THEN truth ELSE 1 - truth END AS rep FROM t),
             |g AS (SELECT nat, COUNT(*) AS n, CAST(SUM(truth) AS BIGINT) AS n_true,
             |        CAST(SUM(rep) AS BIGINT) AS n_rep
             |      FROM r GROUP BY nat)
             |SELECT nat, n, n_true, n_rep,
             |  (4*n_rep - n) * 1000000 // (2*n) AS est_ppm,
             |  n_true * 1000000 // n AS true_ppm,
             |  abs((4*n_rep - n) * 1000000 // (2*n) - n_true * 1000000 // n) AS err_ppm
             |FROM g ORDER BY nat""".stripMargin),
    ),
  )
}
