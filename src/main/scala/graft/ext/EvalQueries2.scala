package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl

/** Second slice of the evaluation family (q284+): rater agreement (Cohen's
  * kappa), exact-Gini decision-stump training, Kaplan-Meier time-to-event
  * with administrative censoring, CUPED, the sequential-peeking audit,
  * isotonic recalibration, the Mann-Whitney rank test, SRM detection, and
  * the MDE power table. Same exact-arithmetic discipline as
  * [[EvalQueries]]; float appears only in the KM survival product, as a
  * left-to-right IEEE fold replicated op-for-op by the oracle's recursive
  * CTE (the house double-fold rule, DEVNOTES rule 4). */
object EvalQueries2 {

  def queries: Seq[QueryDef] = Seq(

    // Cohen's kappa between the metadata `lang` column and q31's stopword
    // language detector, binarized to en/not-en, per source — the scalar
    // agreement summary of q230's confusion matrix (raw agreement is
    // inflated by chance; kappa subtracts it). Exact rational over the
    // 2×2 cells: kappa = (N(a+d) − [(a+b)(a+c)+(c+d)(b+d)]) /
    // (N² − [...]), emitted as a truncating-div ppm (numerator can be
    // negative; Spark `div` and DuckDB `//` both truncate toward zero).
    // Map-only detection + one rollup; decimal(38,0) carries N².
    QueryDef(
      "q284_lang_kappa",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .select(col("source"),
            (col("lang") === "en").cast("int").as("r1"),
            (TextAnalysis.langPred(TextAnalysis.stopwordRatio(col("text"))) === "en")
              .cast("int").as("r2"))
        d.groupBy("source")
          .agg(count(lit(1)).as("n"),
            sum(when(col("r1") === 1 && col("r2") === 1, 1L).otherwise(0L)).as("cell_a"),
            sum(when(col("r1") === 1 && col("r2") === 0, 1L).otherwise(0L)).as("cell_b"),
            sum(when(col("r1") === 0 && col("r2") === 1, 1L).otherwise(0L)).as("cell_c"),
            sum(when(col("r1") === 0 && col("r2") === 0, 1L).otherwise(0L)).as("cell_d"))
          .select(col("source"), col("n"),
            col("cell_a"), col("cell_b"), col("cell_c"), col("cell_d"),
            expr("""cast((cast(n as decimal(38,0))*(cell_a+cell_d)
                   |  - ((cell_a+cell_b)*(cell_a+cell_c) + (cell_c+cell_d)*(cell_b+cell_d))) * 1000000
                   |  div nullif(cast(n as decimal(38,0))*n
                   |  - ((cell_a+cell_b)*(cell_a+cell_c) + (cell_c+cell_d)*(cell_b+cell_d)), 0)
                   |  as bigint)""".stripMargin).as("kappa_ppm"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
              |  SELECT source,
              |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS r1,
              |    CASE WHEN CAST(len(list_filter(string_split(text,' '),
              |           w -> w IN (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE)
              |           / len(string_split(text,' ')) >= 0.05 THEN 1 ELSE 0 END AS r2
              |  FROM documents),
              |m AS (SELECT source, COUNT(*) AS n,
              |    CAST(SUM(CASE WHEN r1=1 AND r2=1 THEN 1 ELSE 0 END) AS BIGINT) AS cell_a,
              |    CAST(SUM(CASE WHEN r1=1 AND r2=0 THEN 1 ELSE 0 END) AS BIGINT) AS cell_b,
              |    CAST(SUM(CASE WHEN r1=0 AND r2=1 THEN 1 ELSE 0 END) AS BIGINT) AS cell_c,
              |    CAST(SUM(CASE WHEN r1=0 AND r2=0 THEN 1 ELSE 0 END) AS BIGINT) AS cell_d
              |  FROM d GROUP BY source)
              |SELECT source, n, cell_a, cell_b, cell_c, cell_d,
              |  CAST((CAST(n AS HUGEINT)*(cell_a+cell_d)
              |    - ((cell_a+cell_b)*(cell_a+cell_c) + (cell_c+cell_d)*(cell_b+cell_d))) * 1000000
              |    // NULLIF(CAST(n AS HUGEINT)*n
              |    - ((cell_a+cell_b)*(cell_a+cell_c) + (cell_c+cell_d)*(cell_b+cell_d)), 0) AS BIGINT) AS kappa_ppm
              |FROM m ORDER BY source""".stripMargin),
    ),


    // Decision-stump training at corpus scale: the exact best threshold on
    // n_chars for predicting lang = 'en' by weighted Gini impurity — the
    // split-finding inner loop of every tree learner, run as one pass.
    // Candidate thresholds = DISTINCT feature values (vocabulary-bounded);
    // left/right class counts via one cumulative window over that distinct
    // frame (never the corpus); impurities as e6-scaled exact integers
    // over decimal(38,0) squares (per-side truncating division — the same
    // deterministic quantization both engines apply). Deterministic
    // argmin: min (split_ppm, t). Output: the chosen stump + its gain.
    QueryDef(
      "q285_decision_stump",
      (s, dir) => {
        val sc = tbl(s, dir, "documents")
          .select(col("n_chars").as("x"), (col("lang") === "en").cast("long").as("pos"))
        val dv = sc.groupBy("x")
          .agg(count(lit(1)).as("cnt"), sum("pos").as("cp"))
        val wOrd = Window.orderBy("x")
        val tot = sc.agg(count(lit(1)).as("n"), sum("pos").as("p"))
        val cand = dv
          .select(col("x").as("t"),
            sum("cnt").over(wOrd).as("nl"),
            sum("cp").over(wOrd).as("pl"))
          .crossJoin(broadcast(tot))
          .where(col("nl") < col("n"))
          .select(col("t"), col("nl"), col("pl"),
            (col("n") - col("nl")).as("nr"), (col("p") - col("pl")).as("pr"),
            col("n"), col("p"))
        val imp = cand.select(col("t"), col("nl"), col("nr"), col("n"),
          expr("""(cast(nl as decimal(38,0))*nl - cast(pl as decimal(38,0))*pl
                 | - cast(nl-pl as decimal(38,0))*(nl-pl)) * 1000000
                 | div (cast(nl as decimal(38,0))*nl)""".stripMargin).as("gl"),
          expr("""(cast(nr as decimal(38,0))*nr - cast(pr as decimal(38,0))*pr
                 | - cast(nr-pr as decimal(38,0))*(nr-pr)) * 1000000
                 | div (cast(nr as decimal(38,0))*nr)""".stripMargin).as("gr"),
          expr("""cast((cast(n as decimal(38,0))*n - cast(p as decimal(38,0))*p
                 | - cast(n-p as decimal(38,0))*(n-p)) * 1000000
                 | div (cast(n as decimal(38,0))*n) as bigint)""".stripMargin).as("base_ppm"))
          .select(col("t"), col("base_ppm"),
            expr("cast((nl*gl + nr*gr) div n as bigint)").as("split_ppm"))
        imp.orderBy(col("split_ppm"), col("t")).limit(1)
          .select(col("t").as("best_threshold"), col("base_ppm"), col("split_ppm"),
            (col("base_ppm") - col("split_ppm")).as("gain_ppm"))
      },
      Some("""WITH s AS (SELECT n_chars AS x, CASE WHEN lang='en' THEN 1 ELSE 0 END AS pos FROM documents),
             |tot AS (SELECT COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS p FROM s),
             |dv AS (SELECT x, COUNT(*) AS cnt, CAST(SUM(pos) AS BIGINT) AS cp FROM s GROUP BY x),
             |cum AS (SELECT x, SUM(cnt) OVER (ORDER BY x) AS nl,
             |          CAST(SUM(cp) OVER (ORDER BY x) AS BIGINT) AS pl FROM dv),
             |cand AS (
             |  SELECT c.x AS t, c.nl, c.pl, tot.n - c.nl AS nr, tot.p - c.pl AS pr, tot.n AS n, tot.p AS p
             |  FROM cum c CROSS JOIN tot WHERE c.nl < tot.n),
             |imp AS (
             |  SELECT t, nl, nr, n,
             |    (CAST(nl AS HUGEINT)*nl - CAST(pl AS HUGEINT)*pl - CAST(nl-pl AS HUGEINT)*(nl-pl)) * 1000000
             |      // (CAST(nl AS HUGEINT)*nl) AS gl,
             |    (CAST(nr AS HUGEINT)*nr - CAST(pr AS HUGEINT)*pr - CAST(nr-pr AS HUGEINT)*(nr-pr)) * 1000000
             |      // (CAST(nr AS HUGEINT)*nr) AS gr,
             |    CAST((CAST(n AS HUGEINT)*n - CAST(p AS HUGEINT)*p - CAST(n-p AS HUGEINT)*(n-p)) * 1000000
             |      // (CAST(n AS HUGEINT)*n) AS BIGINT) AS base_ppm
             |  FROM cand),
             |w AS (SELECT t, base_ppm, CAST((nl*gl + nr*gr) // n AS BIGINT) AS split_ppm FROM imp)
             |SELECT t AS best_threshold, base_ppm, split_ppm, base_ppm - split_ppm AS gain_ppm
             |FROM w ORDER BY split_ppm, t LIMIT 1""".stripMargin),
    ),


    // Kaplan-Meier time-to-first-purchase with ADMINISTRATIVE CENSORING:
    // observation window = corpus days [0, 3]; users entering later are
    // excluded, users whose first purchase lands after the window are
    // censored at day 3 (the estimator's whole point — dropping them
    // would bias conversion latency DOWN). Risk sets via one suffix-sum
    // window over the per-day event table (≤ window-length rows); the
    // survival curve is the ordered product Π(1 − dᵗ/nᵗ) as a
    // left-to-right double fold, replicated op-for-op (one divide, one
    // multiply per step) by the oracle's recursive CTE. Heavy lifting
    // (per-user rollup) partial-aggregates; everything after is
    // constant-sized.
    QueryDef(
      "q286_kaplan_meier",
      (s, dir) => {
        val day = 86400000000000L
        val u = tbl(s, dir, "events")
          .groupBy("user_id")
          .agg(min(call_function("div", col("ts"), lit(day))).as("f"),
            min(when(col("event_type") === "purchase",
              call_function("div", col("ts"), lit(day)))).as("fp"))
        val d0 = u.agg(min("f").as("d0"))
        val lf = u.crossJoin(broadcast(d0))
          .select((col("f") - col("d0")).as("fr"),
            (col("fp") - col("d0")).as("fpr"))
          .where(col("fr") <= 3)
          .select(
            when(col("fpr").isNotNull && col("fpr") <= 3, col("fpr") - col("fr"))
              .otherwise(lit(3L) - col("fr")).as("t"),
            when(col("fpr").isNotNull && col("fpr") <= 3, 0L).otherwise(1L).as("cens"))
        val ev = lf.groupBy("t")
          .agg(sum(lit(1L) - col("cens")).as("d"), sum("cens").as("c"))
        val rs = ev.withColumn("n_t",
          sum(col("d") + col("c")).over(Window.orderBy(col("t").desc)))
        // ordered survival product over the ≤4-row curve: collect sorted,
        // prefix-fold per index (O(T²) on a constant-sized frame)
        rs.agg(sort_array(collect_list(struct(col("t"), col("d"), col("c"), col("n_t"))))
            .as("curve"))
          .select(explode(expr(
            """transform(curve, (row, i) ->
              |  named_struct('t', row.t, 'd', row.d, 'c', row.c, 'n_t', row.n_t,
              |    'survival',
              |    aggregate(slice(curve, 1, i + 1), cast(1.0 as double),
              |      (acc, r) -> acc * ((cast(r.n_t as double) - cast(r.d as double)) / cast(r.n_t as double)))))""".stripMargin)).as("r"))
          .select(col("r.t").as("t"), col("r.d").as("d"), col("r.c").as("c"),
            col("r.n_t").as("n_t"), col("r.survival").as("survival"))
          .orderBy("t")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    MIN(epoch_ns(ts) // 86400000000000) AS f,
             |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) // 86400000000000 END) AS fp
             |  FROM events GROUP BY user_id),
             |mn AS (SELECT MIN(f) AS d0 FROM u),
             |w AS (SELECT f - d0 AS fr, fp - d0 AS fpr FROM u CROSS JOIN mn WHERE f - d0 <= 3),
             |lf AS (SELECT CASE WHEN fpr IS NOT NULL AND fpr <= 3 THEN fpr - fr ELSE 3 - fr END AS t,
             |              CASE WHEN fpr IS NOT NULL AND fpr <= 3 THEN 0 ELSE 1 END AS cens FROM w),
             |ev AS (SELECT t, CAST(SUM(1 - cens) AS BIGINT) AS d, CAST(SUM(cens) AS BIGINT) AS c FROM lf GROUP BY t),
             |rs AS (SELECT t, d, c, CAST(SUM(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n_t FROM ev),
             |idx AS (SELECT *, row_number() OVER (ORDER BY t) AS rn FROM rs),
             |km AS (
             |  WITH RECURSIVE k AS (
             |    SELECT t, d, c, n_t, 1.0::DOUBLE * ((CAST(n_t AS DOUBLE) - CAST(d AS DOUBLE)) / CAST(n_t AS DOUBLE)) AS survival, rn
             |    FROM idx WHERE rn = 1
             |    UNION ALL
             |    SELECT r.t, r.d, r.c, r.n_t,
             |      k.survival * ((CAST(r.n_t AS DOUBLE) - CAST(r.d AS DOUBLE)) / CAST(r.n_t AS DOUBLE)), r.rn
             |    FROM k JOIN idx r ON r.rn = k.rn + 1)
             |  SELECT * FROM k)
             |SELECT t, d, c, n_t, survival FROM km ORDER BY t""".stripMargin),
    ),


    // CUPED variance-reduced A/B readout: outcome y = post-period purchase
    // count (days > 6), covariate x = pre-period activity (events in days
    // 0–6), arms by user hash. θ = pooled cov(x,y)/var(x) kept as an
    // exact rational (moment identities over decimal(38,0)); adjusted
    // lift = (ȳ₁−ȳ₂) − θ(x̄₁−x̄₂) emitted as one e6 floor-division over
    // the common denominator n₁n₂·θden — no intermediate float ever. Also
    // reports ρ²: the exact variance-reduction fraction CUPED buys. One
    // per-user rollup then a single-row reduce; the per-user stage
    // partial-aggregates and nothing here shuffles more than the user key.
    QueryDef(
      "q287_cuped_lift",
      (s, dir) => {
        val day = 86400000000000L
        val ev = tbl(s, dir, "events")
        val d0 = ev.agg(min(call_function("div", col("ts"), lit(day))).as("d0"))
        val u = ev.crossJoin(broadcast(d0))
          .select(col("user_id"),
            (call_function("div", col("ts"), lit(day)) - col("d0")).as("rd"),
            (col("event_type") === "purchase").cast("long").as("is_p"))
          .groupBy("user_id")
          .agg(sum(when(col("rd") <= 6, 1L).otherwise(0L)).as("x"),
            sum(when(col("rd") > 6, col("is_p")).otherwise(0L)).as("y"))
          .select(pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"),
            col("x"), col("y"))
        u.groupBy()
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
            sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
            sum(expr("cast(y as decimal(38,0)) * y")).as("syy"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sx1"),
            sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
            sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sx2"),
            sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy2"))
          .select(col("n1"), col("n2"),
            expr("""(cast(sy1 as decimal(38,0))*n2 - cast(sy2 as decimal(38,0))*n1) * 1000000
                   | div (cast(n1 as decimal(38,0))*n2)""".stripMargin).as("diff_raw_e6"),
            expr("""((cast(sy1 as decimal(38,0))*n2 - cast(sy2 as decimal(38,0))*n1)
                   |   * (cast(n as decimal(38,0))*sxx - cast(sx as decimal(38,0))*sx)
                   | - (cast(n as decimal(38,0))*sxy - cast(sx as decimal(38,0))*sy)
                   |   * (cast(sx1 as decimal(38,0))*n2 - cast(sx2 as decimal(38,0))*n1)) * 1000000
                   | div (cast(n1 as decimal(38,0))*n2
                   |   * (cast(n as decimal(38,0))*sxx - cast(sx as decimal(38,0))*sx))""".stripMargin)
              .as("diff_cuped_e6"),
            expr("""(cast(n as decimal(38,0))*sxy - cast(sx as decimal(38,0))*sy) * 1000000
                   | div (cast(n as decimal(38,0))*sxx - cast(sx as decimal(38,0))*sx)""".stripMargin)
              .as("theta_ppm"),
            expr("""(cast(n as decimal(38,0))*sxy - cast(sx as decimal(38,0))*sy)
                   | * (cast(n as decimal(38,0))*sxy - cast(sx as decimal(38,0))*sy) * 1000000
                   | div ((cast(n as decimal(38,0))*sxx - cast(sx as decimal(38,0))*sx)
                   |   * (cast(n as decimal(38,0))*syy - cast(sy as decimal(38,0))*sy))""".stripMargin)
              .as("var_reduction_ppm"))
      },
      Some("""WITH d0 AS (SELECT MIN(epoch_ns(ts) // 86400000000000) AS d0 FROM events),
             |u AS (
             |  SELECT user_id,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    CAST(SUM(CASE WHEN epoch_ns(ts) // 86400000000000 - d0.d0 <= 6 THEN 1 ELSE 0 END) AS BIGINT) AS x,
             |    CAST(SUM(CASE WHEN epoch_ns(ts) // 86400000000000 - d0.d0 > 6
             |              AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
             |  FROM events CROSS JOIN d0 GROUP BY user_id),
             |m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             |        SUM(CAST(x AS HUGEINT)*x) AS sxx, SUM(CAST(x AS HUGEINT)*y) AS sxy, SUM(CAST(y AS HUGEINT)*y) AS syy,
             |        CAST(SUM(CASE WHEN arm=0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |        CAST(SUM(CASE WHEN arm=0 THEN x ELSE 0 END) AS BIGINT) AS sx1,
             |        CAST(SUM(CASE WHEN arm=0 THEN y ELSE 0 END) AS BIGINT) AS sy1,
             |        CAST(SUM(CASE WHEN arm=1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |        CAST(SUM(CASE WHEN arm=1 THEN x ELSE 0 END) AS BIGINT) AS sx2,
             |        CAST(SUM(CASE WHEN arm=1 THEN y ELSE 0 END) AS BIGINT) AS sy2
             |      FROM u),
             |t AS (SELECT *, CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS tnum,
             |        CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS tden,
             |        CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS yvar
             |      FROM m)
             |SELECT n1, n2,
             |  CAST((CAST(sy1 AS HUGEINT)*n2 - CAST(sy2 AS HUGEINT)*n1) * 1000000
             |    // (CAST(n1 AS HUGEINT)*n2) AS BIGINT) AS diff_raw_e6,
             |  CAST(((CAST(sy1 AS HUGEINT)*n2 - CAST(sy2 AS HUGEINT)*n1) * tden
             |    - tnum * (CAST(sx1 AS HUGEINT)*n2 - CAST(sx2 AS HUGEINT)*n1)) * 1000000
             |   // (CAST(n1 AS HUGEINT)*n2*tden) AS BIGINT) AS diff_cuped_e6,
             |  CAST(tnum * 1000000 // tden AS BIGINT) AS theta_ppm,
             |  CAST(tnum * tnum * 1000000 // (tden * yvar) AS BIGINT) AS var_reduction_ppm
             |FROM t""".stripMargin),
    ),


    // Sequential-peeking audit: what a daily-peeking experimenter would
    // have concluded — cumulative two-proportion z² per day, for the real
    // A/A assignment AND a deterministically planted +5%-on-arm-1 effect
    // (hash-injected synthetic conversions), with each scenario's first
    // crossing day. The A/A row should never cross (assignment-hash
    // health); the injected row shows detection latency. Day rollup →
    // 30-row cumulative window → z² — constant-sized after the first
    // partial-agg.
    QueryDef(
      "q288_peeking_audit",
      (s, dir) => {
        val day = 86400000000000L
        val base = tbl(s, dir, "events")
          .select(call_function("div", col("ts"), lit(day)).as("day"),
            pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"),
            (col("event_type") === "purchase").cast("long").as("conv"),
            (col("event_type") === "purchase" ||
              (pmod(Sampling.portableHash(col("user_id")), lit(2)) === 1 &&
                pmod(Sampling.portableHash(col("event_id")), lit(20)) === 0))
              .cast("long").as("conv_inj"))
        def scenario(name: String, convCol: String) = {
          val g = base.groupBy("day")
            .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("dn1"),
              sum(when(col("arm") === 0, col(convCol)).otherwise(0L)).as("dc1"),
              sum(when(col("arm") === 1, 1L).otherwise(0L)).as("dn2"),
              sum(when(col("arm") === 1, col(convCol)).otherwise(0L)).as("dc2"))
          val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
          g.select(lit(name).as("scenario"), col("day"),
            sum("dn1").over(w).as("n1"), sum("dc1").over(w).as("c1"),
            sum("dn2").over(w).as("n2"), sum("dc2").over(w).as("c2"))
        }
        val z = Evaluation.withZ2Ppm(
          scenario("aa", "conv").unionAll(scenario("injected", "conv_inj")))
        z.withColumn("first_cross_day",
            min(when(col("flagged"), col("day")))
              .over(Window.partitionBy("scenario")))
          .orderBy("scenario", "day")
      },
      Some("""WITH e AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
             |    CASE WHEN event_type = 'purchase'
             |          OR (CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 = 1
             |              AND CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)),1,15)) AS BIGINT) % 20 = 0)
             |         THEN 1 ELSE 0 END AS conv_inj
             |  FROM events),
             |g AS (SELECT day,
             |   CAST(SUM(CASE WHEN arm=0 THEN 1 ELSE 0 END) AS BIGINT) AS dn1,
             |   CAST(SUM(CASE WHEN arm=0 THEN conv ELSE 0 END) AS BIGINT) AS dc1a,
             |   CAST(SUM(CASE WHEN arm=0 THEN conv_inj ELSE 0 END) AS BIGINT) AS dc1b,
             |   CAST(SUM(CASE WHEN arm=1 THEN 1 ELSE 0 END) AS BIGINT) AS dn2,
             |   CAST(SUM(CASE WHEN arm=1 THEN conv ELSE 0 END) AS BIGINT) AS dc2a,
             |   CAST(SUM(CASE WHEN arm=1 THEN conv_inj ELSE 0 END) AS BIGINT) AS dc2b
             | FROM e GROUP BY day),
             |s AS (
             |  SELECT 'aa' AS scenario, day,
             |    CAST(SUM(dn1) OVER w AS BIGINT) AS n1, CAST(SUM(dc1a) OVER w AS BIGINT) AS c1,
             |    CAST(SUM(dn2) OVER w AS BIGINT) AS n2, CAST(SUM(dc2a) OVER w AS BIGINT) AS c2
             |  FROM g WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
             |  UNION ALL
             |  SELECT 'injected' AS scenario, day,
             |    CAST(SUM(dn1) OVER w2 AS BIGINT) AS n1, CAST(SUM(dc1b) OVER w2 AS BIGINT) AS c1,
             |    CAST(SUM(dn2) OVER w2 AS BIGINT) AS n2, CAST(SUM(dc2b) OVER w2 AS BIGINT) AS c2
             |  FROM g WINDOW w2 AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
             |z AS (SELECT scenario, day, n1, c1, n2, c2,
             |  CASE WHEN (c1+c2) = 0 OR (c1+c2) = (n1+n2) OR n1 = 0 OR n2 = 0 THEN NULL
             |    ELSE CAST(CAST(n1+n2 AS HUGEINT)*(c1*n2 - c2*n1)*(c1*n2 - c2*n1)*1000000
             |         // (CAST(c1+c2 AS HUGEINT)*((n1+n2)-(c1+c2))*n1*n2) AS BIGINT)
             |    END AS z2_ppm
             | FROM s),
             |f AS (SELECT *, COALESCE(z2_ppm > 4000000, FALSE) AS flagged FROM z)
             |SELECT scenario, day, n1, c1, n2, c2, z2_ppm, flagged,
             |  MIN(CASE WHEN flagged THEN day END) OVER (PARTITION BY scenario) AS first_cross_day
             |FROM f ORDER BY scenario, day""".stripMargin),
    ),


    // Isotonic (PAV) recalibration of the q279 reliability bins — the
    // standard fix when a classifier's scores rank well (q278) but
    // mis-calibrate (q279): the exact monotone-non-decreasing fit via the
    // minimax identity iso_i = max_{j≤i} min_{k≥i} rate(j..k), evaluated
    // RELATIONALLY over the constant-cardinality bin frame (T³ tiny rows;
    // scale-free once the corpus rolls up). Interval rates compare by the
    // exact quantized key rate·10¹⁸ (two distinct fractions with
    // denominators ≤ 10⁹ differ by ≥ 10⁻¹⁸, so the key ordering IS the
    // rational ordering — the documented bound); decimal(38,0) carries
    // the 10²⁷-sized products. iso_ppm = key div 10¹² is exactly
    // floor(rate·10⁶).
    QueryDef(
      "q292_isotonic_calibration",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val m = Curation.linearGate(docs, "text", "doc_id",
            Curation.DemoWeights.toMap, Curation.DemoBias)
          .join(docs.select(col("doc_id"),
            (col("lang") === "en").cast("long").as("pos")), Seq("doc_id"))
          .select(
            call_function("div", col("margin") - pmod(col("margin"), lit(5L)), lit(5L))
              .as("bin"), col("pos"))
        val idx = m.groupBy("bin")
          .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
          .withColumn("i", row_number().over(Window.orderBy("bin")).cast("long"))
        val pre = idx.select(col("i"), col("bin"), col("n"), col("n_pos"),
          sum("n").over(Window.orderBy("i")).as("cn"),
          sum("n_pos").over(Window.orderBy("i")).as("cp"))
        val pre0 = pre.select(col("i"), col("cn"), col("cp"))
          .unionByName(idx.sparkSession.range(1).select(
            lit(0L).as("i"), lit(0L).as("cn"), lit(0L).as("cp")))
        val fr = pre0.as("lo").join(pre0.as("hi"), col("hi.i") > col("lo.i"))
          .select((col("lo.i") + 1L).as("j"), col("hi.i").as("k"),
            expr("""cast(cast(hi.cp - lo.cp as decimal(38,0)) * 1000000000000000000
                   | div (hi.cn - lo.cn) as decimal(38,0))""".stripMargin).as("key"))
        val innerMin = pre.select(col("i"))
          .join(fr, col("j") <= col("i") && col("k") >= col("i"))
          .groupBy(col("i"), col("j")).agg(min("key").as("mn"))
        val iso = innerMin.groupBy("i").agg(max("mn").as("iso_key"))
        pre.join(iso, Seq("i"))
          .select(col("bin"), col("n"), col("n_pos"),
            expr("n_pos * 1000000 div n").as("obs_ppm"),
            expr("cast(iso_key div 1000000000000 as bigint)").as("iso_ppm"))
          .orderBy("bin")
      },
      Some(s"""WITH w(tok, wt) AS (SELECT * FROM (VALUES ${Curation.demoWeightsValuesSql})),
              |t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
              |m AS (SELECT t.doc_id, CAST(${Curation.DemoBias} + COALESCE(SUM(w.wt),0) AS BIGINT) AS margin
              |      FROM t LEFT JOIN w USING (tok) GROUP BY t.doc_id),
              |s AS (SELECT CAST(floor(m.margin / 5.0) AS BIGINT) AS bin,
              |        CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
              |      FROM m JOIN documents d USING (doc_id)),
              |b AS (SELECT bin, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos FROM s GROUP BY bin),
              |idx AS (SELECT bin, n, n_pos, row_number() OVER (ORDER BY bin) AS i FROM b),
              |pre AS (SELECT i, bin, n, n_pos,
              |         CAST(SUM(n) OVER (ORDER BY i) AS BIGINT) AS cn,
              |         CAST(SUM(n_pos) OVER (ORDER BY i) AS BIGINT) AS cp
              |       FROM idx),
              |pre0 AS (SELECT i, cn, cp FROM pre UNION ALL SELECT 0, 0, 0),
              |fr AS (
              |  SELECT lo.i + 1 AS j, hi.i AS k,
              |    CAST(CAST(hi.cp - lo.cp AS HUGEINT) * 1000000000000000000 // (hi.cn - lo.cn) AS HUGEINT) AS key
              |  FROM pre0 lo JOIN pre0 hi ON hi.i > lo.i),
              |inner_min AS (
              |  SELECT p.i, f.j, MIN(f.key) AS mn
              |  FROM pre p JOIN fr f ON f.j <= p.i AND f.k >= p.i
              |  GROUP BY p.i, f.j),
              |iso AS (SELECT i, MAX(mn) AS iso_key FROM inner_min GROUP BY i)
              |SELECT p.bin, p.n, p.n_pos, p.n_pos*1000000 // p.n AS obs_ppm,
              |  CAST(iso.iso_key // 1000000000000 AS BIGINT) AS iso_ppm
              |FROM pre p JOIN iso ON iso.i = p.i ORDER BY p.bin""".stripMargin),
    ),


    // Mann-Whitney rank-sum A/B test on per-user spend, per market
    // segment — the NONPARAMETRIC member of the experimentation toolkit
    // (q280 tests proportions, q287 means; this tests stochastic
    // dominance, robust to spend's heavy tail). Doubled average ranks
    // keep the tie-corrected statistic integral (2U₁ = 2R₁ − n₁(n₁+1));
    // the tie-corrected variance folds into one exact rational:
    // z²·10⁶ = (2U₁−n₁n₂)²·3n(n−1)·10⁶ div (n₁n₂·[(n+1)n(n−1) − Σ(t³−t)]).
    // decimal(38,0) carries the products exactly to ~3·10⁵ users per
    // segment (beyond, pre-bucket spend — the documented switch). One
    // user rollup, one segment-keyed window pass, two rollups.
    QueryDef(
      "q295_mann_whitney",
      (s, dir) => {
        val u = tbl(s, dir, "events")
          .groupBy("user_id")
          .agg(sum(when(col("event_type") === "purchase",
            round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("spend"))
          .select(col("user_id"),
            pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"), col("spend"))
        val g = u.join(
          tbl(s, dir, "customer").select(col("c_custkey").as("user_id"),
            col("c_mktsegment").as("grp")), Seq("user_id"))
        val r = g.select(col("grp"), col("arm"),
          rank().over(Window.partitionBy("grp").orderBy("spend")).cast("long").as("rk"),
          count(lit(1)).over(Window.partitionBy("grp", "spend")).as("ties"))
        val t3 = g.groupBy("grp", "spend").agg(count(lit(1)).as("t"))
          .groupBy("grp")
          .agg(sum(col("t") * col("t") * col("t") - col("t")).as("t3"))
        val m = r.groupBy("grp")
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
            sum(when(col("arm") === 0, lit(2L) * col("rk") + col("ties") - 1L)
              .otherwise(0L)).as("r2_1"))
        m.join(t3, Seq("grp"))
          .select(col("grp"), col("n1"), col("n2"),
            (col("r2_1") - col("n1") * (col("n1") + 1L) - col("n1") * col("n2")).as("d2"),
            col("t3"))
          .withColumn("z2_ppm", expr(
            """cast(cast(d2 as decimal(38,0))*d2 * 3*(n1+n2)*(n1+n2-1) * 1000000
              | div nullif(cast(n1 as decimal(38,0))*n2
              |   * ((n1+n2+1)*cast(n1+n2 as decimal(38,0))*(n1+n2-1) - t3), 0)
              | as bigint)""".stripMargin))
          .withColumn("significant", coalesce(col("z2_ppm") > 4000000L, lit(false)))
          .orderBy("grp")
      },
      Some("""WITH u AS (
             |  SELECT e.user_id,
             |    CAST(('0x' || substring(md5(CAST(e.user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    CAST(SUM(CASE WHEN e.event_type='purchase' THEN CAST(round(e.value*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS spend
             |  FROM events e GROUP BY e.user_id),
             |g AS (
             |  SELECT c.c_mktsegment AS grp, u.arm, u.spend
             |  FROM u JOIN customer c ON u.user_id = c.c_custkey),
             |r AS (
             |  SELECT grp, arm, spend,
             |    rank() OVER (PARTITION BY grp ORDER BY spend) AS rk,
             |    COUNT(*) OVER (PARTITION BY grp, spend) AS ties
             |  FROM g),
             |ties AS (
             |  SELECT grp, CAST(SUM(t*t*t - t) AS BIGINT) AS t3
             |  FROM (SELECT grp, spend, COUNT(*) AS t FROM g GROUP BY 1, 2) GROUP BY grp),
             |m AS (
             |  SELECT grp,
             |    CAST(SUM(CASE WHEN arm=0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN arm=1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(SUM(CASE WHEN arm=0 THEN 2*rk + ties - 1 ELSE 0 END) AS BIGINT) AS r2_1
             |  FROM r GROUP BY grp),
             |z AS (
             |  SELECT m.grp, n1, n2,
             |    r2_1 - n1*(n1+1) - n1*n2 AS d2, t3
             |  FROM m JOIN ties ON ties.grp = m.grp),
             |f AS (
             |  SELECT grp, n1, n2, d2, t3,
             |    CAST(CAST(d2 AS HUGEINT)*d2 * 3*(n1+n2)*(n1+n2-1) * 1000000
             |      // NULLIF(CAST(n1 AS HUGEINT)*n2
             |        * ((n1+n2+1)*CAST(n1+n2 AS HUGEINT)*(n1+n2-1) - t3), 0) AS BIGINT) AS z2_ppm
             |  FROM z)
             |SELECT grp, n1, n2, d2, t3, z2_ppm,
             |  COALESCE(z2_ppm > 4000000, FALSE) AS significant
             |FROM f ORDER BY grp""".stripMargin),
    ),


    // Sample-ratio-mismatch (SRM) detector — the assignment-health
    // guardrail every experiment platform runs before trusting a readout:
    // χ²(1 df) of observed arm counts vs the designed 50/50 split,
    // per day over DISTINCT daily users and overall over DISTINCT users
    // (NOT user-days: heavy users repeat across days, and rolling up
    // user-days is the classic false-alarm unit mismatch — probed here,
    // it flags a phantom SRM). χ²·10⁶ = (n₁−n₂)²·10⁶ div (n₁+n₂), exact;
    // gate = 3.841 (α=0.05, 1 df). Two distinct rollups, both
    // partial-agg; decimal is the documented escape past ~10⁹ units.
    QueryDef(
      "q296_srm_detector",
      (s, dir) => {
        val a = tbl(s, dir, "events")
          .select(col("user_id"),
            pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"),
            call_function("div", col("ts"), lit(86400000000000L)).as("day"))
        val perDay = a.select(col("day"), col("user_id"), col("arm")).distinct()
          .groupBy("day")
          .agg(sum(lit(1L) - col("arm")).as("n1"), sum("arm").as("n2"))
        val overall = a.select(col("user_id"), col("arm")).distinct()
          .agg(sum(lit(1L) - col("arm")).as("n1"), sum("arm").as("n2"))
          .select(lit(-1L).as("day"), col("n1"), col("n2"))
        perDay.unionByName(overall)
          .select(col("day"), col("n1"), col("n2"),
            expr("(n1-n2)*(n1-n2) * 1000000 div (n1+n2)").as("chi2_ppm"))
          .withColumn("srm", col("chi2_ppm") > 3841000L)
          .orderBy("day")
      },
      Some("""WITH a AS (
             |  SELECT user_id,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    epoch_ns(ts) // 86400000000000 AS day
             |  FROM events),
             |e AS (SELECT DISTINCT day, user_id, arm FROM a),
             |perday AS (
             |  SELECT day, CAST(SUM(1-arm) AS BIGINT) AS n1, CAST(SUM(arm) AS BIGINT) AS n2
             |  FROM e GROUP BY day),
             |overall AS (
             |  SELECT CAST(-1 AS BIGINT) AS day,
             |    CAST(SUM(1-arm) AS BIGINT) AS n1, CAST(SUM(arm) AS BIGINT) AS n2
             |  FROM (SELECT DISTINCT user_id, arm FROM a)),
             |g AS (SELECT * FROM perday UNION ALL SELECT * FROM overall)
             |SELECT day, n1, n2,
             |  (n1-n2)*(n1-n2) * 1000000 // (n1+n2) AS chi2_ppm,
             |  (n1-n2)*(n1-n2) * 1000000 // (n1+n2) > 3841000 AS srm
             |FROM g ORDER BY day""".stripMargin),
    ),


    // Minimum-detectable-effect table — the power-planning readout next
    // to q280's test and q296's health check: at each day's accumulated
    // sample (cumulative arm sizes, pooled conversion rate), the absolute
    // effect detectable at α=0.05 / 80% power,
    // MDE = (z₀.₉₇₅+z₀.₈)·√(p(1−p)(1/n₁+1/n₂)) with the z-sum as the
    // fixed literal 2.8016. All integer: the radicand floor-assembles on
    // decimal(38,0) rails and the exact isqrt (double seed + two integer
    // corrections — the q126 recipe, replicated in the oracle) takes the
    // root, so MDE_ppm is bit-equal across engines. One day rollup + a
    // 30-row cumulative window.
    QueryDef(
      "q297_mde_table",
      (s, dir) => {
        val g = tbl(s, dir, "events")
          .select(call_function("div", col("ts"), lit(86400000000000L)).as("day"),
            pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"),
            (col("event_type") === "purchase").cast("long").as("conv"))
          .groupBy("day")
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("dn1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("dn2"),
            sum("conv").as("dc"))
        val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        val cum = g.select(col("day"),
          sum("dn1").over(w).as("n1"), sum("dn2").over(w).as("n2"),
          sum("dc").over(w).as("c"))
        cum.select(col("day"), col("n1"), col("n2"),
            expr("c * 1000000 div (n1+n2)").as("p_ppm"),
            expr("""cast((cast(784896256 as decimal(38,0)) * c * ((n1+n2) - c) * (n1+n2) * 10000)
                   | div (cast(n1+n2 as decimal(38,0)) * (n1+n2) * n1 * n2) as bigint)""".stripMargin)
              .as("rad"))
          .withColumn("mde_ppm", Sampling.isqrt(col("rad")))
          .drop("rad")
          .orderBy("day")
      },
      Some("""WITH e AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
             |  FROM events),
             |g AS (SELECT day,
             |   CAST(SUM(CASE WHEN arm=0 THEN 1 ELSE 0 END) AS BIGINT) AS dn1,
             |   CAST(SUM(CASE WHEN arm=1 THEN 1 ELSE 0 END) AS BIGINT) AS dn2,
             |   CAST(SUM(conv) AS BIGINT) AS dc
             | FROM e GROUP BY day),
             |cum AS (SELECT day,
             |   CAST(SUM(dn1) OVER w AS BIGINT) AS n1,
             |   CAST(SUM(dn2) OVER w AS BIGINT) AS n2,
             |   CAST(SUM(dc) OVER w AS BIGINT) AS c
             | FROM g WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
             |r AS (SELECT day, n1, n2,
             |   c * 1000000 // (n1+n2) AS p_ppm,
             |   CAST((CAST(784896256 AS HUGEINT) * c * ((n1+n2) - c) * (n1+n2) * 10000)
             |     // (CAST(n1+n2 AS HUGEINT) * (n1+n2) * n1 * n2) AS BIGINT) AS rad
             | FROM cum),
             |s0 AS (SELECT r.*, CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) AS a FROM r),
             |s1 AS (SELECT s0.*, CASE WHEN a*a > rad THEN a-1 ELSE a END AS b FROM s0)
             |SELECT day, n1, n2, p_ppm,
             |  CASE WHEN (b+1)*(b+1) <= rad THEN b+1 ELSE b END AS mde_ppm
             |FROM s1 ORDER BY day""".stripMargin),
    ),


    // Difference-in-differences on per-user spend: pre/post (corpus day
    // 15 boundary) × hash arm, DiD = (Δ̄ treated) − (Δ̄ control) on cell
    // means — the causal-adjustment workhorse when assignment isn't
    // random in time. One exact floor-division over the four-cell common
    // denominator n₁₁n₁₀n₀₁n₀₀ (decimal(38,0) rails), emitted in
    // centi-cents. One user-period rollup, a 4-row pivot, one row out.
    QueryDef(
      "q298_diff_in_diff",
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        val d0 = ev.agg(min(call_function("div", col("ts"), lit(86400000000000L)))
          .as("d0"))
        val u = ev.crossJoin(broadcast(d0))
          .select(col("user_id"),
            pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"),
            when(call_function("div", col("ts"), lit(86400000000000L)) - col("d0") < 15, 0L)
              .otherwise(1L).as("period"),
            when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L).as("cents"))
        val cell = u.groupBy("arm", "period")
          .agg(countDistinct("user_id").as("n"), sum("cents").as("s"))
        cell.groupBy()
          .agg(
            max(when(col("arm") === 1 && col("period") === 1, col("n"))).as("n11"),
            max(when(col("arm") === 1 && col("period") === 1, col("s"))).as("s11"),
            max(when(col("arm") === 1 && col("period") === 0, col("n"))).as("n10"),
            max(when(col("arm") === 1 && col("period") === 0, col("s"))).as("s10"),
            max(when(col("arm") === 0 && col("period") === 1, col("n"))).as("n01"),
            max(when(col("arm") === 0 && col("period") === 1, col("s"))).as("s01"),
            max(when(col("arm") === 0 && col("period") === 0, col("n"))).as("n00"),
            max(when(col("arm") === 0 && col("period") === 0, col("s"))).as("s00"))
          .select(col("n11"), col("n10"), col("n01"), col("n00"),
            expr("""cast(((cast(s11 as decimal(38,0))*n10 - cast(s10 as decimal(38,0))*n11)
                   |    * (cast(n01 as decimal(38,0))*n00)
                   |  - (cast(s01 as decimal(38,0))*n00 - cast(s00 as decimal(38,0))*n01)
                   |    * (cast(n11 as decimal(38,0))*n10)) * 100
                   | div (cast(n11 as decimal(38,0))*n10*n01*n00) as bigint)""".stripMargin)
              .as("did_centicents"))
      },
      Some("""WITH d0 AS (SELECT MIN(epoch_ns(ts) // 86400000000000) AS d0 FROM events),
             |u AS (
             |  SELECT user_id,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    CASE WHEN epoch_ns(ts) // 86400000000000 - d0.d0 < 15 THEN 0 ELSE 1 END AS period,
             |    CASE WHEN event_type='purchase' THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END AS cents
             |  FROM events CROSS JOIN d0),
             |cell AS (
             |  SELECT arm, period, COUNT(DISTINCT user_id) AS n, CAST(SUM(cents) AS BIGINT) AS s
             |  FROM u GROUP BY arm, period),
             |w AS (
             |  SELECT
             |    MAX(CASE WHEN arm=1 AND period=1 THEN n END) AS n11, MAX(CASE WHEN arm=1 AND period=1 THEN s END) AS s11,
             |    MAX(CASE WHEN arm=1 AND period=0 THEN n END) AS n10, MAX(CASE WHEN arm=1 AND period=0 THEN s END) AS s10,
             |    MAX(CASE WHEN arm=0 AND period=1 THEN n END) AS n01, MAX(CASE WHEN arm=0 AND period=1 THEN s END) AS s01,
             |    MAX(CASE WHEN arm=0 AND period=0 THEN n END) AS n00, MAX(CASE WHEN arm=0 AND period=0 THEN s END) AS s00
             |  FROM cell)
             |SELECT n11, n10, n01, n00,
             |  CAST(((CAST(s11 AS HUGEINT)*n10 - CAST(s10 AS HUGEINT)*n11) * (CAST(n01 AS HUGEINT)*n00)
             |      - (CAST(s01 AS HUGEINT)*n00 - CAST(s00 AS HUGEINT)*n01) * (CAST(n11 AS HUGEINT)*n10)) * 100
             |    // (CAST(n11 AS HUGEINT)*n10*n01*n00) AS BIGINT) AS did_centicents
             |FROM w""".stripMargin),
    ),


    // Deterministic hash-bootstrap CI on the per-user-spend A/B lift:
    // 32 half-sample resamples (membership = hash(user·64 + b) parity —
    // pure function of (user, resample), so the whole CI is replayable),
    // per-resample mean difference in centi-cents, CI = the 2nd/31st
    // order statistics (a ~94% percentile interval). The resample
    // explosion is a bounded ×32 on the per-USER frame (already rolled
    // up), not on events; order statistics run over 32 rows.
    QueryDef(
      "q299_bootstrap_ci",
      (s, dir) => {
        val u = tbl(s, dir, "events")
          .groupBy("user_id")
          .agg(sum(when(col("event_type") === "purchase",
            round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("spend"))
          .select(col("user_id"),
            pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"), col("spend"))
        val r = u.select(col("user_id"), col("arm"), col("spend"),
            explode(sequence(lit(0L), lit(31L))).as("bs"))
          .withColumn("inb",
            (pmod(Sampling.portableHash(col("user_id") * 64 + col("bs")), lit(2)) === 0)
              .cast("long"))
        val g = r.groupBy("bs")
          .agg(sum(when(col("arm") === 0 && col("inb") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0 && col("inb") === 1, col("spend")).otherwise(0L)).as("s1"),
            sum(when(col("arm") === 1 && col("inb") === 1, 1L).otherwise(0L)).as("n2"),
            sum(when(col("arm") === 1 && col("inb") === 1, col("spend")).otherwise(0L)).as("s2"))
          .select(col("bs"), expr(
            """cast((cast(s1 as decimal(38,0))*n2 - cast(s2 as decimal(38,0))*n1) * 100
              | div nullif(cast(n1 as decimal(38,0))*n2, 0) as bigint)""".stripMargin)
            .as("diff_cc"))
        val o = g.select(col("bs"), col("diff_cc"),
          row_number().over(Window.orderBy(col("diff_cc"), col("bs"))).as("rk"))
        o.agg(
          min(when(col("rk") === 2, col("diff_cc"))).as("ci_lo_cc"),
          min(when(col("rk") === 31, col("diff_cc"))).as("ci_hi_cc"),
          min(when(col("rk") === 16, col("diff_cc"))).as("med_lo_cc"),
          count(lit(1)).as("n_resamples"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS spend
             |  FROM events GROUP BY user_id),
             |b AS (SELECT unnest(generate_series(0, 31)) AS bs),
             |r AS (
             |  SELECT b.bs, u.arm, u.spend,
             |    CASE WHEN CAST(('0x' || substring(md5(CAST(u.user_id * 64 + b.bs AS VARCHAR)),1,15)) AS BIGINT) % 2 = 0
             |         THEN 1 ELSE 0 END AS inb
             |  FROM u CROSS JOIN b),
             |g AS (
             |  SELECT bs,
             |    CAST(SUM(CASE WHEN arm=0 AND inb=1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN arm=0 AND inb=1 THEN spend ELSE 0 END) AS BIGINT) AS s1,
             |    CAST(SUM(CASE WHEN arm=1 AND inb=1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(SUM(CASE WHEN arm=1 AND inb=1 THEN spend ELSE 0 END) AS BIGINT) AS s2
             |  FROM r GROUP BY bs),
             |d AS (
             |  SELECT bs, CAST((CAST(s1 AS HUGEINT)*n2 - CAST(s2 AS HUGEINT)*n1) * 100
             |    // NULLIF(CAST(n1 AS HUGEINT)*n2, 0) AS BIGINT) AS diff_cc
             |  FROM g),
             |o AS (SELECT bs, diff_cc, row_number() OVER (ORDER BY diff_cc, bs) AS rk FROM d)
             |SELECT
             |  MIN(CASE WHEN rk = 2 THEN diff_cc END) AS ci_lo_cc,
             |  MIN(CASE WHEN rk = 31 THEN diff_cc END) AS ci_hi_cc,
             |  MIN(CASE WHEN rk = 16 THEN diff_cc END) AS med_lo_cc,
             |  COUNT(*) AS n_resamples
             |FROM o""".stripMargin),
    ),


    // The composed experiment scorecard — the family's curate(): ONE
    // decision row from the guardrail + readout + power chain: overall
    // SRM check (q296's distinct-user χ²), overall two-proportion z²
    // (q280's statistic on the full window), the MDE at the achieved
    // sample (q297's isqrt radicand), and the verdict the pieces imply
    // (invalid on SRM; else effect / no-effect-above-MDE). Demonstrates
    // the operators composing declaratively: three rollups over one
    // event scan, joined broadcast-style, zero iteration.
    QueryDef(
      "q300_experiment_scorecard",
      (s, dir) => {
        val base = tbl(s, dir, "events")
          .select(col("user_id"),
            pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"),
            (col("event_type") === "purchase").cast("long").as("conv"))
        val users = base.select(col("user_id"), col("arm")).distinct()
          .agg(sum(lit(1L) - col("arm")).as("u1"), sum("arm").as("u2"))
          .select(col("u1"), col("u2"),
            expr("(u1-u2)*(u1-u2) * 1000000 div (u1+u2)").as("srm_chi2_ppm"))
        val contingency = base.groupBy()
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
            sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c2"))
          .transform(Evaluation.withZ2Ppm)
        contingency.crossJoin(broadcast(users))
          .withColumn("rad", expr(
            """cast((cast(784896256 as decimal(38,0)) * (c1+c2) * ((n1+n2) - (c1+c2)) * (n1+n2) * 10000)
              | div (cast(n1+n2 as decimal(38,0)) * (n1+n2) * n1 * n2) as bigint)""".stripMargin))
          .withColumn("mde_ppm", Sampling.isqrt(col("rad")))
          .withColumn("lift_ppm",
            expr("""c1 * 1000000 div n1 - c2 * 1000000 div n2"""))
          .withColumn("srm", col("srm_chi2_ppm") > 3841000L)
          .withColumn("verdict",
            when(col("srm"), "invalid_srm")
              .when(col("flagged"), "effect")
              .otherwise("no_effect_above_mde"))
          .select(col("u1"), col("u2"), col("srm_chi2_ppm"), col("srm"),
            col("n1"), col("c1"), col("n2"), col("c2"), col("z2_ppm"),
            col("flagged"), col("lift_ppm"), col("mde_ppm"), col("verdict"))
      },
      Some("""WITH a AS (
             |  SELECT user_id,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
             |  FROM events),
             |us AS (
             |  SELECT CAST(SUM(1-arm) AS BIGINT) AS u1, CAST(SUM(arm) AS BIGINT) AS u2,
             |    CAST((SUM(1-arm)-SUM(arm))*(SUM(1-arm)-SUM(arm)) * 1000000
             |      // (SUM(1-arm)+SUM(arm)) AS BIGINT) AS srm_chi2_ppm
             |  FROM (SELECT DISTINCT user_id, arm FROM a)),
             |g AS (SELECT
             |   CAST(SUM(CASE WHEN arm=0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |   CAST(SUM(CASE WHEN arm=0 THEN conv ELSE 0 END) AS BIGINT) AS c1,
             |   CAST(SUM(CASE WHEN arm=1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |   CAST(SUM(CASE WHEN arm=1 THEN conv ELSE 0 END) AS BIGINT) AS c2
             | FROM a),
             |z AS (SELECT g.*, us.*,
             |  CASE WHEN (c1+c2) = 0 OR (c1+c2) = (n1+n2) OR n1 = 0 OR n2 = 0 THEN NULL
             |    ELSE CAST(CAST(n1+n2 AS HUGEINT)*(c1*n2 - c2*n1)*(c1*n2 - c2*n1)*1000000
             |         // (CAST(c1+c2 AS HUGEINT)*((n1+n2)-(c1+c2))*n1*n2) AS BIGINT)
             |    END AS z2_ppm,
             |  CAST((CAST(784896256 AS HUGEINT) * (c1+c2) * ((n1+n2) - (c1+c2)) * (n1+n2) * 10000)
             |    // (CAST(n1+n2 AS HUGEINT) * (n1+n2) * n1 * n2) AS BIGINT) AS rad
             | FROM g CROSS JOIN us),
             |s0 AS (SELECT z.*, CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) AS sa FROM z),
             |s1 AS (SELECT s0.*, CASE WHEN sa*sa > rad THEN sa-1 ELSE sa END AS sb FROM s0),
             |f AS (SELECT s1.*,
             |  COALESCE(z2_ppm > 4000000, FALSE) AS flagged,
             |  CASE WHEN (sb+1)*(sb+1) <= rad THEN sb+1 ELSE sb END AS mde_ppm,
             |  c1 * 1000000 // n1 - c2 * 1000000 // n2 AS lift_ppm,
             |  srm_chi2_ppm > 3841000 AS srm
             | FROM s1)
             |SELECT u1, u2, srm_chi2_ppm, srm, n1, c1, n2, c2, z2_ppm, flagged,
             |  lift_ppm, mde_ppm,
             |  CASE WHEN srm THEN 'invalid_srm'
             |       WHEN flagged THEN 'effect'
             |       ELSE 'no_effect_above_mde' END AS verdict
             |FROM f""".stripMargin),
    ),


    // Event-study readout (the parallel-trends diagnostic behind q298's
    // DiD): the per-day arm gap in mean per-user purchase cents, indexed
    // relative to the day-15 boundary — pre-boundary gaps hovering near
    // zero is what LICENSES the DiD reading; a pre-trend kills it. One
    // (day, arm) rollup with distinct-user denominators, a 30-row pivot,
    // exact centi-cent gaps.
    QueryDef(
      "q301_event_study",
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        val d0 = ev.agg(min(call_function("div", col("ts"), lit(86400000000000L)))
          .as("d0"))
        val e = ev.crossJoin(broadcast(d0))
          .select(
            (call_function("div", col("ts"), lit(86400000000000L)) - col("d0")).as("rd"),
            pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"),
            col("user_id"),
            when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L).as("cents"))
        val g = e.groupBy("rd", "arm")
          .agg(countDistinct("user_id").as("n"), sum("cents").as("s"))
        g.groupBy("rd")
          .agg(max(when(col("arm") === 1, col("n"))).as("n1"),
            max(when(col("arm") === 1, col("s"))).as("s1"),
            max(when(col("arm") === 0, col("n"))).as("n0"),
            max(when(col("arm") === 0, col("s"))).as("s0"))
          .select(col("rd"), (col("rd") - 15L).as("rel_day"), col("n1"), col("n0"),
            expr("""cast((cast(s1 as decimal(38,0))*n0 - cast(s0 as decimal(38,0))*n1) * 100
                   | div nullif(cast(n1 as decimal(38,0))*n0, 0) as bigint)""".stripMargin)
              .as("gap_cc"))
          .orderBy("rd")
      },
      Some("""WITH d0 AS (SELECT MIN(epoch_ns(ts) // 86400000000000) AS d0 FROM events),
             |e AS (
             |  SELECT epoch_ns(ts) // 86400000000000 - d0.d0 AS rd,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    user_id,
             |    CASE WHEN event_type='purchase' THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END AS cents
             |  FROM events CROSS JOIN d0),
             |g AS (
             |  SELECT rd, arm, COUNT(DISTINCT user_id) AS n, CAST(SUM(cents) AS BIGINT) AS s
             |  FROM e GROUP BY rd, arm),
             |p AS (
             |  SELECT rd,
             |    MAX(CASE WHEN arm=1 THEN n END) AS n1, MAX(CASE WHEN arm=1 THEN s END) AS s1,
             |    MAX(CASE WHEN arm=0 THEN n END) AS n0, MAX(CASE WHEN arm=0 THEN s END) AS s0
             |  FROM g GROUP BY rd)
             |SELECT rd, rd - 15 AS rel_day, n1, n0,
             |  CAST((CAST(s1 AS HUGEINT)*n0 - CAST(s0 AS HUGEINT)*n1) * 100
             |    // NULLIF(CAST(n1 AS HUGEINT)*n0, 0) AS BIGINT) AS gap_cc
             |FROM p ORDER BY rd""".stripMargin),
    ),


    // Quantile treatment effects: the A/B lift at the p25/p50/p75/p90
    // of per-user spend — where mean lifts (q287) hide who moved,
    // quantile gaps show whether the treatment shifted the tail or the
    // median. Exact type-1 quantiles (k-th order statistic,
    // k = ⌈q·n⌉ via integer ceil-div) per arm from one rank window;
    // zero interpolation, zero floats.
    QueryDef(
      "q302_quantile_effects",
      (s, dir) => {
        val u = tbl(s, dir, "events")
          .groupBy("user_id")
          .agg(sum(when(col("event_type") === "purchase",
            round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("spend"))
          .select(col("user_id"),
            pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"), col("spend"))
        val r = u.select(col("arm"), col("spend"),
          row_number().over(Window.partitionBy("arm").orderBy(col("spend"), col("user_id")))
            .cast("long").as("rk"),
          count(lit(1)).over(Window.partitionBy("arm")).as("n"))
        val qs = s.range(1).select(explode(typedLit(Seq(25L, 50L, 75L, 90L))).as("q_pct"))
        val k = r.crossJoin(broadcast(qs))
          .where(col("rk") === expr("(q_pct * n + 99) div 100"))
        k.groupBy("q_pct")
          .agg(max(when(col("arm") === 1, col("spend"))).as("q_treat"),
            max(when(col("arm") === 0, col("spend"))).as("q_ctrl"))
          .withColumn("qte_cents", col("q_treat") - col("q_ctrl"))
          .orderBy("q_pct")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS spend
             |  FROM events GROUP BY user_id),
             |r AS (SELECT arm, spend,
             |        row_number() OVER (PARTITION BY arm ORDER BY spend, user_id) AS rk,
             |        COUNT(*) OVER (PARTITION BY arm) AS n
             |      FROM u),
             |qs(q_pct) AS (SELECT * FROM (VALUES (25), (50), (75), (90))),
             |k AS (SELECT qs.q_pct, r.arm, r.spend
             |      FROM r CROSS JOIN qs WHERE r.rk = (qs.q_pct * r.n + 99) // 100),
             |p AS (SELECT q_pct,
             |    MAX(CASE WHEN arm=1 THEN spend END) AS q_treat,
             |    MAX(CASE WHEN arm=0 THEN spend END) AS q_ctrl
             |  FROM k GROUP BY q_pct)
             |SELECT CAST(q_pct AS BIGINT) AS q_pct, q_treat, q_ctrl,
             |  q_treat - q_ctrl AS qte_cents
             |FROM p ORDER BY q_pct""".stripMargin),
    ),


    // Covariate balance table (standardized mean differences) — the
    // diagnostic run before trusting any observational/experimental
    // comparison: per covariate, SMD = |x̄₁−x̄₂| / √((v₁+v₂)/2) with the
    // 0.1 rule of thumb as the balance gate. With population variances
    // the (n₁n₂)² denominators CANCEL: SMD² = 2D²/(A·n₂² + B·n₁²) where
    // D = S₁n₂−S₂n₁, A = n₁ΣX₁²−S₁², B = n₂ΣX₂²−S₂² — one exact
    // decimal(38,0) fraction per covariate, rooted by the exact isqrt.
    // One user rollup, a 4-covariate unpivot, a 4-row reduce.
    QueryDef(
      "q303_covariate_balance",
      (s, dir) => {
        val u = tbl(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("spend"))
          .join(tbl(s, dir, "customer").select(col("c_custkey").as("user_id"),
            round(col("c_acctbal") * 100, 0).cast("long").as("acctbal")), Seq("user_id"))
          .select(pmod(Sampling.portableHash(col("user_id")), lit(2)).as("arm"),
            col("n_events"), col("n_errors"), col("spend"), col("acctbal"))
        val long = u.select(col("arm"), explode(array(
          struct(lit("n_events").as("covariate"), col("n_events").as("x")),
          struct(lit("n_errors").as("covariate"), col("n_errors").as("x")),
          struct(lit("spend_cents").as("covariate"), col("spend").as("x")),
          struct(lit("acctbal_cents").as("covariate"), col("acctbal").as("x")))).as("c"))
          .select(col("arm"), col("c.covariate").as("covariate"), col("c.x").as("x"))
        long.groupBy("covariate")
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("s1"),
            sum(when(col("arm") === 0, expr("cast(x as decimal(38,0)) * x"))).as("sxx1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
            sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("s2"),
            sum(when(col("arm") === 1, expr("cast(x as decimal(38,0)) * x"))).as("sxx2"))
          .select(col("covariate"), col("n1"), col("n2"),
            expr("""cast(2000000 * (cast(s1 as decimal(38,0))*n2 - cast(s2 as decimal(38,0))*n1)
                   |   * (cast(s1 as decimal(38,0))*n2 - cast(s2 as decimal(38,0))*n1)
                   | div nullif((cast(n1 as decimal(38,0))*sxx1 - cast(s1 as decimal(38,0))*s1) * n2 * n2
                   |   + (cast(n2 as decimal(38,0))*sxx2 - cast(s2 as decimal(38,0))*s2) * n1 * n1, 0)
                   | as bigint)""".stripMargin).as("rad"))
          .withColumn("smd_milli", Sampling.isqrt(col("rad")))
          .withColumn("balanced", col("smd_milli") < 100L)
          .drop("rad")
          .orderBy("covariate")
      },
      Some("""WITH u AS (
             |  SELECT e.user_id,
             |    CAST(('0x' || substring(md5(CAST(e.user_id AS VARCHAR)),1,15)) AS BIGINT) % 2 AS arm,
             |    COUNT(*) AS n_events,
             |    CAST(SUM(CASE WHEN e.event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
             |    CAST(SUM(CASE WHEN e.event_type='purchase' THEN CAST(round(e.value*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS spend
             |  FROM events e GROUP BY e.user_id),
             |j AS (SELECT u.*, CAST(round(c.c_acctbal*100,0) AS BIGINT) AS acctbal
             |      FROM u JOIN customer c ON u.user_id = c.c_custkey),
             |lng AS (
             |  SELECT arm, 'n_events' AS covariate, CAST(n_events AS BIGINT) AS x FROM j
             |  UNION ALL SELECT arm, 'n_errors', n_errors FROM j
             |  UNION ALL SELECT arm, 'spend_cents', spend FROM j
             |  UNION ALL SELECT arm, 'acctbal_cents', acctbal FROM j),
             |m AS (
             |  SELECT covariate,
             |    CAST(SUM(CASE WHEN arm=0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN arm=0 THEN x ELSE 0 END) AS BIGINT) AS s1,
             |    SUM(CASE WHEN arm=0 THEN CAST(x AS HUGEINT)*x ELSE 0 END) AS sxx1,
             |    CAST(SUM(CASE WHEN arm=1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(SUM(CASE WHEN arm=1 THEN x ELSE 0 END) AS BIGINT) AS s2,
             |    SUM(CASE WHEN arm=1 THEN CAST(x AS HUGEINT)*x ELSE 0 END) AS sxx2
             |  FROM lng GROUP BY covariate),
             |d AS (
             |  SELECT covariate, n1, n2,
             |    CAST(s1 AS HUGEINT)*n2 - CAST(s2 AS HUGEINT)*n1 AS dd,
             |    (CAST(n1 AS HUGEINT)*sxx1 - CAST(s1 AS HUGEINT)*s1) * n2 * n2
             |      + (CAST(n2 AS HUGEINT)*sxx2 - CAST(s2 AS HUGEINT)*s2) * n1 * n1 AS den
             |  FROM m),
             |r AS (SELECT covariate, n1, n2,
             |    CAST(2000000 * dd * dd // NULLIF(den, 0) AS BIGINT) AS rad
             |  FROM d),
             |s0 AS (SELECT r.*, CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) AS a FROM r),
             |s1 AS (SELECT s0.*, CASE WHEN a*a > rad THEN a-1 ELSE a END AS b FROM s0)
             |SELECT covariate, n1, n2,
             |  CASE WHEN (b+1)*(b+1) <= rad THEN b+1 ELSE b END AS smd_milli,
             |  CASE WHEN (b+1)*(b+1) <= rad THEN b+1 ELSE b END < 100 AS balanced
             |FROM s1 ORDER BY covariate""".stripMargin),
    ),

    // Unbiased pass@k (the Codex estimator — THE sampling-eval statistic
    // for generation pipelines): per user-task, n = attempts (events),
    // c = successes (purchases), pass@k = 1 − C(n−c,k)/C(n,k) for
    // k ∈ {1,3,5} in STEPWISE ppm floor-division (overflow-free at any
    // n, unlike the closed-form falling-factorial product —
    // Evaluation.passAtK documents the < k-ulp deterministic floor).
    // The oracle replays the identical nested expression.
    QueryDef(
      "q319_pass_at_k",
      (s, dir) => Evaluation.passAtK(tbl(s, dir, "events"),
          "user_id", col("event_type") === "purchase", Seq(1, 3, 5))
        .withColumnRenamed("task", "user_id")
        .orderBy(col("user_id")),
      Some({
        val ratio = (k: Int) => (0 until k).foldLeft("1000000") { (acc, i) =>
          s"(($acc * (n - c - $i)) // (n - $i))"
        }
        s"""WITH t AS (
           |  SELECT user_id, COUNT(*) AS n,
           |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c
           |  FROM events GROUP BY user_id HAVING COUNT(*) >= 5)
           |SELECT user_id, n, c,
           |  CAST(1000000 - ${ratio(1)} AS BIGINT) AS pass1_ppm,
           |  CAST(1000000 - ${ratio(3)} AS BIGINT) AS pass3_ppm,
           |  CAST(1000000 - ${ratio(5)} AS BIGINT) AS pass5_ppm
           |FROM t ORDER BY user_id""".stripMargin
      }),
    ),

    // Bradley–Terry source ratings from pairwise quality matches among
    // NEAR-DUPLICATE documents (the RLHF-preference machinery applied to
    // curation): when two sources publish near-identical content, the
    // longer copy "wins" the pair (ties to the smaller doc_id's source);
    // 4 MM rounds in integer fixed point rate every source by its win
    // pattern — the transitive strength readout a curator uses to pick
    // canonical copies, where raw win-rate is confounded by WHO each
    // source happens to collide with. Exact: floor per pair-term + one
    // floor per player per round (Evaluation.bradleyTerry); the oracle
    // replays the 4 rounds as chained CTEs over the same match table.
    QueryDef(
      "q320_bradley_terry",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val pairs = PinnedCache.pin(
          Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5)
            .select(col("a_id"), col("b_id")))
        val m = pairs
          .join(d.select(col("doc_id").as("a_id"), col("source").as("sa"),
            col("n_chars").as("ca")), "a_id")
          .join(d.select(col("doc_id").as("b_id"), col("source").as("sb"),
            col("n_chars").as("cb")), "b_id")
          .where(col("sa") =!= col("sb"))
          .select(
            when(col("ca") > col("cb"), col("sa"))
              .when(col("cb") > col("ca"), col("sb"))
              .otherwise(when(col("a_id") < col("b_id"), col("sa"))
                .otherwise(col("sb"))).as("winner"),
            when(col("ca") > col("cb"), col("sb"))
              .when(col("cb") > col("ca"), col("sa"))
              .otherwise(when(col("a_id") < col("b_id"), col("sb"))
                .otherwise(col("sa"))).as("loser"))
        Evaluation.bradleyTerry(m, iters = 4)
          .withColumnRenamed("player", "source")
          .orderBy(col("source"))
      },
      Some({
        val round = (i: Int) =>
          s"""d$i AS MATERIALIZED (
             |  SELECT g.p, CAST(SUM((g.n_pq * 1000000000000)
             |    // GREATEST(rp.r + rq.r, 1)) AS BIGINT) AS denom
             |  FROM g JOIN r${i - 1} rp ON rp.p = g.p
             |         JOIN r${i - 1} rq ON rq.p = g.q
             |  GROUP BY g.p),
             |r$i AS MATERIALIZED (
             |  SELECT pl.p, CAST((pl.w * 1000000000000) // GREATEST(d$i.denom, 1) AS BIGINT) AS r
             |  FROM pl JOIN d$i ON d$i.p = pl.p)""".stripMargin
        s"""WITH sh AS (
           |  SELECT doc_id, list_distinct([toks[i]||' '||toks[i+1]||' '||toks[i+2]
           |                                FOR i IN generate_series(1, len(toks)-2)]) AS s
           |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
           |  WHERE len(toks) >= 3),
           |e0 AS MATERIALIZED (
           |  SELECT a.doc_id AS a, b.doc_id AS b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
           |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
           |mt AS MATERIALIZED (
           |  SELECT CASE WHEN da.n_chars > db.n_chars THEN da.source
           |              WHEN db.n_chars > da.n_chars THEN db.source
           |              ELSE (CASE WHEN e0.a < e0.b THEN da.source ELSE db.source END)
           |         END AS winner,
           |         CASE WHEN da.n_chars > db.n_chars THEN db.source
           |              WHEN db.n_chars > da.n_chars THEN da.source
           |              ELSE (CASE WHEN e0.a < e0.b THEN db.source ELSE da.source END)
           |         END AS loser
           |  FROM e0 JOIN documents da ON da.doc_id = e0.a
           |          JOIN documents db ON db.doc_id = e0.b
           |  WHERE da.source <> db.source),
           |g AS MATERIALIZED (
           |  SELECT p, q, COUNT(*) AS n_pq FROM (
           |    SELECT winner AS p, loser AS q FROM mt
           |    UNION ALL SELECT loser AS p, winner AS q FROM mt)
           |  GROUP BY p, q),
           |pl AS MATERIALIZED (
           |  SELECT p, CAST(COALESCE(w.w, 0) AS BIGINT) AS w
           |  FROM (SELECT DISTINCT p FROM g)
           |  LEFT JOIN (SELECT winner AS wp, COUNT(*) AS w FROM mt GROUP BY winner) w
           |    ON w.wp = p),
           |r0 AS (SELECT p, CAST(1000000 AS BIGINT) AS r FROM pl),
           |${(1 to 4).map(round).mkString(",\n")},
           |gm AS (SELECT p, CAST(SUM(n_pq) AS BIGINT) AS games FROM g GROUP BY p)
           |SELECT pl.p AS source, gm.games, pl.w AS wins, r4.r AS rating_ppm
           |FROM pl JOIN r4 ON r4.p = pl.p JOIN gm ON gm.p = pl.p
           |ORDER BY source""".stripMargin
      }),
    ),

    // WILSON lower confidence bound (z = 2, integer-exact) on per-user
    // purchase rate — THE small-n rate-ranking fix: raw rate puts a
    // 1-for-1 user above a 95-for-100 one; ranking by the Wilson LOWER
    // bound orders users by the rate their evidence supports
    // (Evaluation.wilsonLowerBound: one 1e12-scaled floored radicand,
    // one exact integer sqrt — the q287 MDE recipe — one final floor;
    // decimal(38,0) rails, loud only past n = 6e12). The oracle replays
    // the identical chain on HUGEINT with the s0/s1 correction ladder.
    QueryDef(
      "q330_wilson_rate_rank",
      (s, dir) => {
        val g = tbl(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
        Evaluation.wilsonLowerBound(g, "n", "p")
          .orderBy(col("user_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, COUNT(*) AS n,
             |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
             |  FROM events GROUP BY user_id),
             |r AS (SELECT user_id, n, p,
             |    (CAST(p AS HUGEINT) * 1000000) // n AS rate_ppm,
             |    (CAST(p AS HUGEINT) * (n - p) * 1000000000000) // n
             |      + 1000000000000 AS rad
             |  FROM g),
             |s0 AS (SELECT r.*, CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) AS a FROM r),
             |s1 AS (SELECT s0.*, CASE WHEN CAST(a AS HUGEINT)*a > rad THEN a-1 ELSE a END AS b FROM s0),
             |s2 AS (SELECT s1.*, CASE WHEN CAST(b+1 AS HUGEINT)*(b+1) <= rad THEN b+1 ELSE b END AS rt FROM s1)
             |SELECT user_id, n, p, CAST(rate_ppm AS BIGINT) AS rate_ppm,
             |  CAST(((CAST(p AS HUGEINT) + 2) * 1000000 - 2 * rt) // (n + 4) AS BIGINT) AS wilson_lb_ppm
             |FROM s2 ORDER BY user_id""".stripMargin),
    ),

    // KRIPPENDORFF's alpha (nominal, m = 3) over three deterministic
    // document labelers — the inter-annotator statistic generalizing
    // q284's two-rater kappa, here reading how SENSITIVE a length-based
    // quality gate is to its threshold: annotators = the same
    // "long-document" rule at cutoffs 200/250/300 chars; low alpha
    // says the gate's verdicts are threshold-artifacts, high alpha
    // says the corpus separates cleanly (Evaluation.krippendorffAlpha:
    // without-replacement chance disagreement — the alpha-vs-Fleiss
    // correction — in two-stage floored ppm, all guards loud). The
    // oracle replays the pair-count chains.
    QueryDef(
      "q331_krippendorff_alpha",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        val ann = Seq(200L, 250L, 300L).map(t =>
          d.select(col("doc_id").as("unit"), lit(s"cut$t").as("annotator"),
            when(col("n_chars") >= t, "long").otherwise("short").as("label")))
          .reduce(_ unionByName _)
        Evaluation.krippendorffAlpha(ann, m = 3)
      },
      Some("""WITH ann AS (
             |  SELECT doc_id AS unit, 'cut200' AS annotator,
             |    CASE WHEN n_chars >= 200 THEN 'long' ELSE 'short' END AS label FROM documents
             |  UNION ALL
             |  SELECT doc_id, 'cut250',
             |    CASE WHEN n_chars >= 250 THEN 'long' ELSE 'short' END FROM documents
             |  UNION ALL
             |  SELECT doc_id, 'cut300',
             |    CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END FROM documents),
             |pu AS (
             |  SELECT unit, SUM(nuc * (nuc - 1)) AS agree2
             |  FROM (SELECT unit, label, COUNT(*) AS nuc FROM ann GROUP BY unit, label)
             |  GROUP BY unit),
             |tot AS (SELECT COUNT(*) AS n_units, SUM(6 - agree2) AS dis2 FROM pu),
             |bl AS (SELECT SUM(nc) AS nn, SUM(nc * (nc - 1)) AS same2
             |       FROM (SELECT label, COUNT(*) AS nc FROM ann GROUP BY label)),
             |r AS (
             |  SELECT CAST(n_units AS BIGINT) AS n_units, CAST(nn AS BIGINT) AS n_annotations,
             |    CAST((dis2 * 1000000) // (n_units * 6) AS BIGINT) AS do_ppm,
             |    CAST(1000000 - (same2 * 1000000) // (nn * (nn - 1)) AS BIGINT) AS de_ppm
             |  FROM tot, bl)
             |SELECT n_units, n_annotations, do_ppm, de_ppm,
             |  CAST(1000000 - (do_ppm * 1000000) // de_ppm AS BIGINT) AS alpha_ppm
             |FROM r""".stripMargin),
    ),

    // KENDALL's tau-a between two quality signals on a deterministic
    // 5% document sample — do char-length and whitespace token count
    // ORDER the corpus the same way (they should, strongly — a tau far
    // from 1e6 would flag a tokenizer artifact)? Exact integer
    // concordance, no sqrt (Evaluation.kendallTauA); the O(n²) pair
    // cost is the operator's stated contract, paid here on the q109
    // deterministic md5 sample — the at-scale recipe. The oracle
    // replays sample, pairs, signs, and the shifted floor.
    QueryDef(
      "q343_kendall_tau",
      (s, dir) => Evaluation.kendallTauA(
        Sampling.deterministicSample(tbl(s, dir, "documents"), "doc_id", 1, 20)
          .select(col("doc_id").as("id"), col("n_chars").as("x"),
            size(split(col("text"), " ")).cast("long").as("y"))),
      Some("""WITH smp AS (
             |  SELECT doc_id AS id, n_chars AS x,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS y
             |  FROM documents
             |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
             |        AS BIGINT) % 20 < 1),
             |agg AS (
             |  SELECT COUNT(*) AS np,
             |    CAST(SUM(CAST(SIGN(p.x - q.x) AS BIGINT)
             |             * CAST(SIGN(p.y - q.y) AS BIGINT)) AS HUGEINT) AS s
             |  FROM smp p JOIN smp q ON p.id < q.id),
             |n1 AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM smp)
             |SELECT CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s,
             |  CAST(((s + n * (n - 1) // 2) * 1000000)
             |       // (n * (n - 1) // 2) - 1000000 AS BIGINT) AS tau_a_ppm
             |FROM agg, n1""".stripMargin),
    ),

    // SIMPSON diversity of languages per source — the exact-rational
    // concentration readout a mixture planner reads next to the q115
    // weights (a source with simpson ≈ 0 is one language; higher
    // spreads): 1e6 − Σc²·1e6 div N², one floor on decimal rails, no
    // logs (Evaluation.simpsonDiversity — Shannon entropy would not be
    // engine-exact). The oracle replays the two rollups.
    QueryDef(
      "q344_simpson_diversity",
      (s, dir) => Evaluation.simpsonDiversity(
          tbl(s, dir, "documents"), "source", "lang")
        .orderBy(col("grp")),
      Some("""WITH c AS (
             |  SELECT source AS grp, lang AS cat, COUNT(*) AS c
             |  FROM documents GROUP BY 1, 2),
             |g AS (
             |  SELECT grp, SUM(c) AS n_rows, COUNT(*) AS n_categories,
             |    SUM(CAST(c AS HUGEINT) * c) AS c2
             |  FROM c GROUP BY grp)
             |SELECT grp, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_categories AS BIGINT) AS n_categories,
             |  CAST(1000000 - (c2 * 1000000)
             |       // (CAST(n_rows AS HUGEINT) * n_rows) AS BIGINT) AS simpson_ppm
             |FROM g ORDER BY grp""".stripMargin),
    ),

    // Spearman's rho between part revenue and part quantity — do the
    // two size measures RANK parts the same way? (Pearson on raw values
    // is hostage to the revenue tail; ranks are the robust question.)
    // Tie-corrected exactly via doubled average ranks over the
    // distinct-value rollup; integer moments on decimal rails; ONE
    // double division + sqrt (the q223 discipline) — and unlike
    // Kendall (q343) there is no O(n^2) pair join, so this is the
    // rank-correlation form that runs at corpus scale.
    QueryDef(
      "q357_spearman",
      (s, dir) => {
        val pp = tbl(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("id"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("x"),
            sum(col("l_quantity").cast("decimal(18,2)")).as("y"))
        Evaluation.spearmanRho(pp)
      },
      Some("""WITH pp AS (
             |  SELECT l_partkey AS id,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS x,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS y
             |  FROM lineitem GROUP BY 1),
             |rx AS (SELECT id, 2*(RANK() OVER (ORDER BY x))
             |              + (COUNT(*) OVER (PARTITION BY x)) - 1 AS r2x FROM pp),
             |ry AS (SELECT id, 2*(RANK() OVER (ORDER BY y))
             |              + (COUNT(*) OVER (PARTITION BY y)) - 1 AS r2y FROM pp),
             |j AS (SELECT r2x, r2y FROM rx JOIN ry USING (id)),
             |m AS (SELECT COUNT(*) AS n,
             |  SUM(CAST(r2x AS HUGEINT)) AS sx, SUM(CAST(r2y AS HUGEINT)) AS sy,
             |  SUM(CAST(r2x AS HUGEINT)*r2y) AS sxy,
             |  SUM(CAST(r2x AS HUGEINT)*r2x) AS sxx,
             |  SUM(CAST(r2y AS HUGEINT)*r2y) AS syy FROM j)
             |SELECT CAST(n AS BIGINT) AS n,
             |  CAST(n*sxy - sx*sy AS DOUBLE)
             |    / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) AS rho
             |FROM m""".stripMargin),
    ),

    // Rank-biased overlap between the early-period and late-period
    // part-revenue top-10 — "did the bestseller list change?" asked the
    // way a ranking comparison should be: top-weighted (rank 1 moves
    // matter more than rank 10 moves), well-defined on lists that only
    // partially overlap — exactly where Spearman/Kendall need a common
    // support. Exact scaled-integer arithmetic (p = 9/10, lcm 2520
    // clears every /d); only the two top-10 lists are ever ranked.
    QueryDef(
      "q358_rbo",
      (s, dir) => {
        val cut = to_timestamp(lit("1998-07-01"))
        def rev(pred: org.apache.spark.sql.Column) =
          sum(when(pred, col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .otherwise(lit(0).cast("decimal(18,2)")))
        val scores = tbl(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("id"))
          .agg(rev(col("l_shipdate") < cut).as("sa"),
            rev(col("l_shipdate") >= cut).as("sb"))
        Evaluation.rankBiasedOverlap(scores, "id", "sa", "sb", depth = 10)
      },
      Some(s"""WITH s AS (
             |  SELECT l_partkey AS id,
             |    SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-07-01'
             |        THEN CAST(l_extendedprice AS DECIMAL(18,2))
             |             * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END) AS sa,
             |    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-07-01'
             |        THEN CAST(l_extendedprice AS DECIMAL(18,2))
             |             * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END) AS sb
             |  FROM lineitem GROUP BY 1),
             |ta AS (SELECT * FROM (SELECT id,
             |    ROW_NUMBER() OVER (ORDER BY sa DESC, id) AS ra FROM s) WHERE ra <= 10),
             |tb AS (SELECT * FROM (SELECT id,
             |    ROW_NUMBER() OVER (ORDER BY sb DESC, id) AS rb FROM s) WHERE rb <= 10),
             |co(m, coef) AS (VALUES ${RboCoefs.table(10)
               .map { case (m, c) => s"($m, ${c}::BIGINT)" }.mkString(", ")}),
             |j AS (SELECT GREATEST(ra, rb) AS m FROM ta JOIN tb USING (id)),
             |a AS (SELECT COUNT(*) AS in_both,
             |        COALESCE(SUM(CAST(coef AS HUGEINT)), 0) AS sc
             |      FROM j JOIN co USING (m))
             |SELECT 10 AS depth, CAST(in_both AS BIGINT) AS in_both,
             |  CAST((sc * 100000) // ${RboCoefs.denom(10)} AS BIGINT) AS rbo_ppm
             |FROM a""".stripMargin),
    ),

    // MAP@10 + MRR@10 of brute-force cosine retrieval judged by label
    // agreement — the retrieval scorecard for an embedding space: does
    // nearest-by-cosine mean same-class? Relevance = neighbor shares
    // the query's label; the AP denominator is min(class size - 1, 10).
    // Exact rational per-query scores (lcm 2520 clears /rank), then
    // truncating-div query means — deterministic end to end (rank ties
    // break by nid, so the oracle replays every decision).
    QueryDef(
      "q359_map_mrr",
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        val qs = emb.where(col("vec_id") < 20)
        val ranked = Similarity.bruteForceTopK(emb, qs, "embedding", "vec_id", 10)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))))
          .join(emb.select(col("vec_id").as("qid"), col("label").as("qlab")), "qid")
          .join(emb.select(col("vec_id").as("nid"), col("label").as("nlab")), "nid")
          .select(col("qid"), col("rank"),
            when(col("qlab") === col("nlab"), 1L).otherwise(0L).as("rel"))
        val labCnt = emb.groupBy(col("label")).agg(count(lit(1)).as("lc"))
        val totalRel = qs.select(col("vec_id").as("qid"), col("label"))
          .join(broadcast(labCnt), "label")
          .select(col("qid"), (col("lc") - 1L).as("r_total"))
        Evaluation.mapMrrAtK(ranked, totalRel, k = 10)
      },
      Some("""WITH n AS (
             |  SELECT vec_id, label, embedding,
             |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*embedding[i]
             |                   FOR i IN generate_series(1,len(embedding))])) AS nrm
             |  FROM embeddings),
             |ranked AS (
             |  SELECT qid, rank, rel FROM (
             |    SELECT q.vec_id AS qid, c.vec_id AS nid,
             |      CASE WHEN q.label = c.label THEN 1 ELSE 0 END AS rel,
             |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             |        (list_sum([CAST(q.embedding[i] AS DOUBLE)*c.embedding[i]
             |                   FOR i IN generate_series(1,len(q.embedding))])/(q.nrm*c.nrm)) DESC,
             |        c.vec_id) AS rank
             |    FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id != c.vec_id)
             |  WHERE rank <= 10),
             |hits AS (
             |  SELECT qid, rank, rel,
             |    SUM(rel) OVER (PARTITION BY qid ORDER BY rank) AS relcnt
             |  FROM ranked),
             |perq AS (
             |  SELECT qid,
             |    SUM(CASE WHEN rel = 1 THEN (2520 // rank) * relcnt ELSE 0 END) AS apnum,
             |    MIN(CASE WHEN rel = 1 THEN rank END) AS firstrel
             |  FROM hits GROUP BY qid),
             |tot AS (
             |  SELECT q.vec_id AS qid, lc.c - 1 AS r_total
             |  FROM embeddings q
             |  JOIN (SELECT label, COUNT(*) AS c FROM embeddings GROUP BY 1) lc
             |    ON lc.label = q.label
             |  WHERE q.vec_id < 20),
             |scored AS (
             |  SELECT t.qid, t.r_total, COALESCE(p.apnum, 0) AS apnum, p.firstrel
             |  FROM tot t LEFT JOIN perq p ON p.qid = t.qid),
             |agg AS (
             |  SELECT SUM(CASE WHEN r_total > 0 THEN 1 ELSE 0 END) AS n_queries,
             |    SUM(CASE WHEN r_total = 0 THEN 1 ELSE 0 END) AS n_undefined,
             |    SUM(CASE WHEN r_total > 0
             |        THEN (apnum * 1000000) // (2520 * LEAST(r_total, 10)) ELSE 0 END) AS apsum,
             |    SUM(CASE WHEN r_total > 0
             |        THEN COALESCE(1000000 // firstrel, 0) ELSE 0 END) AS rrsum
             |  FROM scored)
             |SELECT CAST(n_queries AS BIGINT) AS n_queries,
             |  CAST(n_undefined AS BIGINT) AS n_undefined,
             |  CAST(apsum // n_queries AS BIGINT) AS map_ppm,
             |  CAST(rrsum // n_queries AS BIGINT) AS mrr_ppm
             |FROM agg""".stripMargin),
    ),

    // Precision/recall threshold sweep over cosine pair scores judged
    // by label agreement — q359's scorecard asks "how good is the
    // ranking?"; this asks the OPERATING-POINT question: at which
    // similarity cutoff does same-class retrieval hit the target
    // precision? Thresholds in integer basis points (identical double
    // re-derivation in both engines); NULL precision when a cutoff
    // predicts nothing — an honest no-operating-point.
    QueryDef(
      "q370_pr_curve",
      (s, dir) => {
        val n = Similarity.withNorm(tbl(s, dir, "embeddings"), "embedding")
        val q = n.where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("v_q"),
            col("nrm").as("nrm_q"), col("label").as("qlab"))
        val scored = n.crossJoin(broadcast(q))
          .where(col("qid") =!= col("vec_id"))
          .select(
            (Similarity.dot(col("v_q"), col("embedding")) /
              (col("nrm_q") * col("nrm"))).as("score"),
            when(col("qlab") === col("label"), 1L).otherwise(0L).as("pos"))
        Evaluation.prCurve(scored, Seq(-1000, 0, 500, 1000, 2000))
      },
      Some("""WITH n AS (
             |  SELECT vec_id, label, embedding,
             |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*embedding[i]
             |                   FOR i IN generate_series(1,len(embedding))])) AS nrm
             |  FROM embeddings),
             |s AS (
             |  SELECT CASE WHEN q.label = c.label THEN 1 ELSE 0 END AS pos,
             |    list_sum([CAST(q.embedding[i] AS DOUBLE)*c.embedding[i]
             |              FOR i IN generate_series(1,len(q.embedding))])/(q.nrm*c.nrm) AS score
             |  FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id != c.vec_id),
             |th(theta_bp) AS (VALUES (-1000), (0), (500), (1000), (2000)),
             |x AS (SELECT theta_bp, pos,
             |        score >= CAST(theta_bp AS DOUBLE)/10000.0 AS pred
             |      FROM s CROSS JOIN th),
             |g AS (
             |  SELECT theta_bp,
             |    SUM(CASE WHEN pos = 1 AND pred THEN 1 ELSE 0 END) AS tp,
             |    SUM(CASE WHEN pos = 0 AND pred THEN 1 ELSE 0 END) AS fp,
             |    SUM(CASE WHEN pos = 1 AND NOT pred THEN 1 ELSE 0 END) AS fn
             |  FROM x GROUP BY 1)
             |SELECT theta_bp, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             |  CAST(fn AS BIGINT) AS fn,
             |  CAST(CASE WHEN tp + fp > 0
             |    THEN (CAST(tp AS HUGEINT) * 1000000) // (tp + fp) END AS BIGINT)
             |    AS precision_ppm,
             |  CAST(CASE WHEN tp + fn > 0
             |    THEN (CAST(tp AS HUGEINT) * 1000000) // (tp + fn) END AS BIGINT)
             |    AS recall_ppm
             |FROM g ORDER BY theta_bp""".stripMargin),
    ),

    // McNemar's paired test: do the cheap length filter (n_chars >= 300)
    // and the cheap token filter (>= 60 whitespace tokens) make
    // DIFFERENT mistakes predicting English? Both classifiers score the
    // SAME documents, so the two-proportion z is invalid — McNemar's
    // asymmetric-disagreement counts are the correct comparison; exact
    // integer chi2 ppm on decimal rails, loud raise when b + c = 0.
    QueryDef(
      "q360_mcnemar",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .select(
            when((col("n_chars") >= 300) === (col("lang") === "en"), 1L)
              .otherwise(0L).as("a_ok"),
            when((size(split(col("text"), " ")) >= 60) === (col("lang") === "en"), 1L)
              .otherwise(0L).as("b_ok"))
        Evaluation.mcnemar(d, "a_ok", "b_ok")
      },
      Some("""WITH d AS (
             |  SELECT CASE WHEN (n_chars >= 300) = (lang = 'en') THEN 1 ELSE 0 END AS a_ok,
             |    CASE WHEN (len(string_split(text, ' ')) >= 60) = (lang = 'en') THEN 1 ELSE 0 END AS b_ok
             |  FROM documents),
             |m AS (
             |  SELECT COUNT(*) AS n,
             |    SUM(CASE WHEN a_ok = 1 AND b_ok = 0 THEN 1 ELSE 0 END) AS b,
             |    SUM(CASE WHEN a_ok = 0 AND b_ok = 1 THEN 1 ELSE 0 END) AS c
             |  FROM d)
             |SELECT CAST(n AS BIGINT) AS n, CAST(b AS BIGINT) AS b,
             |  CAST(c AS BIGINT) AS c,
             |  CAST(((CAST(b AS HUGEINT) - c) * (b - c) * 1000000)
             |       // (CAST(b AS HUGEINT) + c) AS BIGINT) AS chi2_ppm
             |FROM m""".stripMargin),
    ),
  )
}
