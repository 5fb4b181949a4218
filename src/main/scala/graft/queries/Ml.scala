package graft.queries

import graft.Tables
import graft.functions.Registry

/** The presto-ml surface (`presto-ml/.../MLFunctions.java`,
  * `LearnRegressorAggregation.java`, `LearnClassifierAggregation.java`,
  * `EvaluateClassifierPredictionsAggregation.java`) exercised as verbatim
  * Presto SQL through the registry. Model family diverges by design —
  * closed-form OLS / nearest-centroid instead of libsvm (see
  * `functions/LinearModel.scala`) — so the oracles replay THIS engine's
  * documented math, not libsvm's.
  *
  * Scale: learning is one partial+final aggregation with bounded state
  * ((d+1)² doubles per group for OLS, #labels×d for the classifier), so
  * a 100 TB training pass shuffles one small buffer per group — the
  * whole point of swapping the reference's driver-iterative SVM for
  * associative sufficient statistics. Prediction is map-only against a
  * broadcast 1-row model.
  */
object Ml extends QueryPack {

  override def defs: Map[String, Q] = Map(
    // learn_regressor + regress + features, verbatim Presto SQL: per
    // returnflag, fit price ~ quantity and predict at fixed quantities.
    // The oracle replays the same normal equations closed-form; round(3)
    // absorbs the ~1e-10-relative FP divergence between solve orders.
    "qm0_learn_regressor" -> ((s, dir) => {
      Tables.register(s, dir)
      Registry.install(s)
      s.sql(
        """SELECT l_returnflag,
          |  round(regress(features(10.0), m), 3) AS pred10,
          |  round(regress(features(25.0), m), 3) AS pred25,
          |  round(regress(features(40.0), m), 3) AS pred40
          |FROM (SELECT l_returnflag,
          |        learn_regressor(l_extendedprice, features(l_quantity)) AS m
          |      FROM lineitem GROUP BY l_returnflag) t
          |ORDER BY l_returnflag""".stripMargin)
    }),

    // learn_classifier + classify: three well-separated synthetic
    // clusters keyed off c_custkey; train on the full table, classify a
    // held probe set. The oracle recomputes the nearest centroid
    // directly (per-label AVG + arg_min) — an independent replay of the
    // documented model. 100-unit cluster separation vs ~1e-12 centroid
    // FP noise keeps the argmin deterministic.
    "qm1_learn_classifier" -> ((s, dir) => {
      Tables.register(s, dir)
      Registry.install(s)
      s.sql(
        """WITH feats AS (
          |  SELECT c_custkey, c_custkey % 3 AS lbl,
          |    cast(c_custkey % 3 * 100 + c_custkey % 7 AS double) AS f1,
          |    cast((2 - c_custkey % 3) * 50 + c_custkey % 5 AS double) AS f2
          |  FROM customer),
          |model AS (SELECT learn_classifier(lbl, features(f1, f2)) AS m
          |          FROM feats)
          |SELECT /*+ BROADCAST(model) */ c_custkey, lbl AS truth,
          |  classify(features(f1, f2), m) AS predicted
          |FROM feats CROSS JOIN model
          |WHERE c_custkey <= 20
          |ORDER BY c_custkey""".stripMargin)
    }),

    // evaluate_classifier_predictions: the reference's accuracy/
    // precision/recall report text, replayed character-for-character by
    // the oracle from the same confusion counts (labels sorted — the
    // reference's hash-set iteration order is unspecified).
    "qm2_evaluate_predictions" -> ((s, dir) => {
      Tables.register(s, dir)
      Registry.install(s)
      s.sql(
        """SELECT evaluate_classifier_predictions(c_custkey % 2,
          |  CASE WHEN c_custkey % 7 < 5 THEN c_custkey % 2
          |       ELSE 1 - c_custkey % 2 END) AS report
          |FROM customer""".stripMargin)
    }))

  override def oracles: Map[String, String] = Map(
    "qm0_learn_regressor" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    cast(count(*) AS double) AS n,
        |    cast(sum(l_quantity) AS double) AS sx,
        |    cast(sum(l_extendedprice) AS double) AS sy,
        |    cast(sum(l_quantity * l_quantity) AS double) AS sxx,
        |    cast(sum(l_quantity * l_extendedprice) AS double) AS sxy
        |  FROM lineitem GROUP BY l_returnflag),
        |w AS (
        |  SELECT l_returnflag,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
        |      AS icpt
        |  FROM s)
        |SELECT l_returnflag,
        |  round(icpt + slope * 10, 3) AS pred10,
        |  round(icpt + slope * 25, 3) AS pred25,
        |  round(icpt + slope * 40, 3) AS pred40
        |FROM w ORDER BY l_returnflag""".stripMargin,
    "qm1_learn_classifier" ->
      """WITH feats AS (
        |  SELECT c_custkey, c_custkey % 3 AS lbl,
        |    cast(c_custkey % 3 * 100 + c_custkey % 7 AS double) AS f1,
        |    cast((2 - c_custkey % 3) * 50 + c_custkey % 5 AS double) AS f2
        |  FROM customer),
        |cent AS (SELECT lbl AS clbl, avg(f1) AS a1, avg(f2) AS a2
        |         FROM feats GROUP BY lbl),
        |probe AS (SELECT * FROM feats WHERE c_custkey <= 20),
        |d AS (SELECT p.c_custkey, p.lbl, c.clbl,
        |        (p.f1 - c.a1) * (p.f1 - c.a1) +
        |        (p.f2 - c.a2) * (p.f2 - c.a2) AS dd
        |      FROM probe p CROSS JOIN cent c)
        |SELECT c_custkey, cast(lbl AS bigint) AS truth,
        |  cast(arg_min(clbl, dd) AS bigint) AS predicted
        |FROM d GROUP BY c_custkey, lbl ORDER BY c_custkey""".stripMargin,
    "qm2_evaluate_predictions" ->
      """WITH t AS (
        |  SELECT c_custkey % 2 AS truth,
        |    CASE WHEN c_custkey % 7 < 5 THEN c_custkey % 2
        |         ELSE 1 - c_custkey % 2 END AS pred
        |  FROM customer),
        |c AS (SELECT
        |    cast(sum(CASE WHEN truth = pred THEN 1 ELSE 0 END) AS bigint)
        |      AS correct,
        |    cast(count(*) AS bigint) AS total,
        |    cast(sum(CASE WHEN truth = pred AND truth = 0 THEN 1 ELSE 0 END)
        |      AS bigint) AS tp0,
        |    cast(sum(CASE WHEN truth = pred AND truth = 1 THEN 1 ELSE 0 END)
        |      AS bigint) AS tp1,
        |    cast(sum(CASE WHEN truth <> pred AND pred = 0 THEN 1 ELSE 0 END)
        |      AS bigint) AS fp0,
        |    cast(sum(CASE WHEN truth <> pred AND pred = 1 THEN 1 ELSE 0 END)
        |      AS bigint) AS fp1,
        |    cast(sum(CASE WHEN truth <> pred AND truth = 0 THEN 1 ELSE 0 END)
        |      AS bigint) AS fn0,
        |    cast(sum(CASE WHEN truth <> pred AND truth = 1 THEN 1 ELSE 0 END)
        |      AS bigint) AS fn1
        |  FROM t)
        |SELECT printf('Accuracy: %d/%d (%.2f%%)', correct, total,
        |    100.0 * correct / total) || chr(10) ||
        |  'Class ''0''' || chr(10) ||
        |  printf('Precision: %d/%d (%.2f%%)', tp0, tp0 + fp0,
        |    100.0 * tp0 / (tp0 + fp0)) || chr(10) ||
        |  printf('Recall: %d/%d (%.2f%%)', tp0, tp0 + fn0,
        |    100.0 * tp0 / (tp0 + fn0)) || chr(10) ||
        |  'Class ''1''' || chr(10) ||
        |  printf('Precision: %d/%d (%.2f%%)', tp1, tp1 + fp1,
        |    100.0 * tp1 / (tp1 + fp1)) || chr(10) ||
        |  printf('Recall: %d/%d (%.2f%%)', tp1, tp1 + fn1,
        |    100.0 * tp1 / (tp1 + fn1)) || chr(10) AS report
        |FROM c""".stripMargin)
}
