-- 8-query TIME-OF-DAY + kind-resolved calendar AQP workload over the
-- driver testdata stream table — external-file coverage of the round-16
-- late SQL-text widenings: hour(ts)/minute(ts) cyclic buckets over the
-- SECS-modeled events.ts (key k = the union of its step slice in every
-- domain period), dayofmonth over either date encoding, year() over a
-- secs column (the ×86 400 units dispatch), date-SHAPED predicate
-- literals rescaled to the column's modeled unit, and the
-- predicate-narrowed bucket domain (minute() folds only under a narrow
-- window). The SAME text runs on the exact plane via spark.sql for
-- truth. One query per line (testdata_30.sql layout); grouped truth for
-- sf0.01 committed as testdata_timeofday_8_true_sf0.01.csv (regenerate
-- with --dump-group-truth). events.ts spans 2024-01-01 → 2024-01-30
-- (FIXTURES.md), so every hourly span stays under the 400-bucket cap.
SELECT hour(ts), COUNT(*) FROM events GROUP BY hour(ts);
SELECT hour(ts), AVG(value) FROM events GROUP BY hour(ts);
SELECT hour(ts), event_type, COUNT(*) FROM events WHERE value < 250 GROUP BY hour(ts), event_type;
SELECT minute(ts), COUNT(*) FROM events WHERE ts < DATE '2024-01-02' GROUP BY minute(ts);
SELECT year(ts), COUNT(*) FROM events GROUP BY year(ts);
SELECT dayofmonth(o_orderdate), COUNT(*) FROM orders GROUP BY dayofmonth(o_orderdate);
SELECT dayofmonth(ts), SUM(value) FROM events WHERE ts >= DATE '2024-01-08' AND ts < DATE '2024-01-22' GROUP BY dayofmonth(ts);
SELECT hour(ts), COUNT(*) FROM events WHERE (event_type = 'purchase') OR (value > 400) GROUP BY hour(ts);
