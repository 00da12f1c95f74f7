-- 8-query GROUPING-SET AQP workload over the driver testdata star schema
-- — external-file coverage of the ROLLUP/CUBE class on the SQL-TEXT plane
-- (r15): SqlParser parses the grouping-set sugar, SqlEstimate answers
-- every subset through estGroupingSetsAgg/estGroupingSetsAvg (COUNT, SUM,
-- SUM(a*b) and AVG per set under one shared expectation memo — the
-- Catalyst grouping-set fold's semantics on the text plane); query 7 adds
-- the HAVING/ORDER BY post clauses post() now applies to GroupSets rows.
-- The SAME text runs on the exact plane via spark.sql for truth; a
-- grouped-out key column is SQL NULL there and "NULL" in the replay keys.
-- One query per line (testdata_30.sql layout); grouped truth for sf0.01
-- committed as testdata_rollup_8_true_sf0.01.csv (regenerate with
-- --dump-group-truth). Predicates stay inside the measured fixture
-- domains (FIXTURES.md) so the workload is answerable at every SF.
SELECT l_returnflag, l_linestatus, COUNT(*) FROM lineitem WHERE l_quantity < 35 GROUP BY ROLLUP(l_returnflag, l_linestatus);
SELECT l_returnflag, l_linestatus, SUM(l_extendedprice) FROM lineitem WHERE l_quantity < 35 GROUP BY ROLLUP(l_returnflag, l_linestatus);
SELECT l_returnflag, AVG(l_extendedprice) FROM lineitem GROUP BY ROLLUP(l_returnflag);
SELECT l_linestatus, SUM(l_extendedprice * l_discount) FROM lineitem WHERE l_quantity < 30 GROUP BY ROLLUP(l_linestatus);
SELECT o_orderstatus, o_orderpriority, COUNT(*) FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority);
SELECT o_orderstatus, SUM(o_totalprice) FROM orders WHERE o_totalprice < 150000 GROUP BY CUBE(o_orderstatus);
SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) HAVING COUNT(*) > 10 ORDER BY n DESC;
SELECT o_orderstatus, o_orderpriority, AVG(o_totalprice) FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority);
