-- 6-query WINDOW-grouping AQP workload over the driver testdata stream
-- table — external-file coverage of the round-16 late window widenings:
-- tumbling windows (size == slide), SLIDING windows (overlapping buckets,
-- each an independent range query), window × dimension enumeration,
-- window × cross-column OR through inclusion-exclusion, AVG/SUM riding
-- the bucket path, and the predicate-narrowed bucket domain (sub-day
-- windows fold only under a narrow span — the 400-bucket cap). Keys
-- render as the exact plane's struct Row.toString ("[start,end]"), so
-- the SAME text runs on the exact plane via spark.sql for truth. One
-- query per line (testdata_30.sql layout); grouped truth for sf0.01
-- committed as testdata_window_6_true_sf0.01.csv (regenerate with
-- --dump-group-truth). events.ts spans 2024-01-01 → 2024-01-30.
SELECT window(ts, '1 day'), COUNT(*) FROM events GROUP BY window(ts, '1 day');
SELECT window(ts, '2 days', '1 day'), COUNT(*) FROM events GROUP BY window(ts, '2 days', '1 day');
SELECT window(ts, '6 hours'), AVG(value) FROM events WHERE ts < DATE '2024-01-15' GROUP BY window(ts, '6 hours');
SELECT window(ts, '12 hours', '6 hours'), event_type, COUNT(*) FROM events WHERE ts < DATE '2024-01-11' GROUP BY window(ts, '12 hours', '6 hours'), event_type;
SELECT window(ts, '1 day'), SUM(value) FROM events WHERE (event_type = 'purchase') OR (value > 400) GROUP BY window(ts, '1 day');
SELECT window(ts, '3 hours', '2 hours'), COUNT(*) FROM events WHERE ts >= DATE '2024-01-08' AND ts < DATE '2024-01-12' GROUP BY window(ts, '3 hours', '2 hours');
