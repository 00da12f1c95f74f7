-- 8-query BINNED-GROUP-BY + grouped-combination AQP workload over the
-- driver testdata star schema — external-file coverage of the round-16
-- SQL-text widenings: arithmetic-bin grouping (floor(x/w) /
-- width_bucket(x, lo, hi, n) / round(x, -k) — each bin ONE half-open
-- NumericLeaf range estimation, the class the realized-value enumeration
-- refuses on near-continuous columns), the calendar × bin cross product,
-- and grouped ± aggregate combinations (SUM(a) − SUM(b) per group over
-- the shared dictionary universe). The SAME text runs on the exact plane
-- via spark.sql for truth. One query per line (testdata_30.sql layout);
-- grouped truth for sf0.01 committed as
-- testdata_binned_8_true_sf0.01.csv (regenerate with --dump-group-truth).
-- Predicates and bin widths stay inside the measured fixture domains
-- (FIXTURES.md: l_extendedprice ~[900, 105000], o_totalprice
-- ~[1000, 500000]) so every query folds under the 400-bucket cap at any SF.
SELECT floor(l_extendedprice/20000), COUNT(*) FROM lineitem WHERE l_quantity < 35 GROUP BY floor(l_extendedprice/20000);
SELECT floor(l_extendedprice/10000), SUM(l_extendedprice) FROM lineitem GROUP BY floor(l_extendedprice/10000);
SELECT width_bucket(o_totalprice, 50000, 450000, 8), COUNT(*) FROM orders GROUP BY width_bucket(o_totalprice, 50000, 450000, 8);
SELECT round(l_extendedprice, -4), AVG(l_discount) FROM lineitem GROUP BY round(l_extendedprice, -4);
SELECT year(o_orderdate), floor(o_totalprice/100000), COUNT(*) FROM orders GROUP BY year(o_orderdate), floor(o_totalprice/100000);
SELECT floor(o_totalprice/100000), o_orderstatus, COUNT(*) FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY floor(o_totalprice/100000), o_orderstatus;
SELECT l_returnflag, SUM(l_extendedprice) - SUM(l_quantity) FROM lineitem WHERE l_quantity < 30 GROUP BY l_returnflag;
SELECT o_orderstatus, COUNT(*) + SUM(o_totalprice) FROM orders WHERE o_totalprice > 50000 GROUP BY o_orderstatus;
