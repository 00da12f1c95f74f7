-- 24-query CALENDAR-GROUPED AQP workload over the driver testdata star
-- schema — external-file coverage of the calendar bucket class the
-- transparent Catalyst fold serves (GROUP BY year/month/quarter over a
-- days-modeled column), replayed through the SQL-TEXT plane: SqlParser
-- parses the calendar grouping, SqlEstimate buckets the model's realized
-- date domain (linear year ranges / cross-year cyclic multi-intervals)
-- and answers each bucket as one range-conjoined estimation — zero scans;
-- queries 21-24 MIX the calendar key with dictionary dimension columns
-- (the Catalyst mixed fold's shape), enumerated per bucket.
-- The SAME text runs on the exact plane via spark.sql for truth. One
-- query per line (testdata_30.sql layout); grouped truth for sf0.01
-- committed as testdata_calendar_24_true_sf0.01.csv (regenerate with
-- --dump-group-truth). Predicates stay inside the measured fixture
-- domains (FIXTURES.md) so the workload is answerable at every SF.
SELECT year(o_orderdate), COUNT(*) FROM orders GROUP BY year(o_orderdate);
SELECT year(o_orderdate), COUNT(*) FROM orders WHERE o_totalprice < 150000 GROUP BY year(o_orderdate);
SELECT month(o_orderdate), COUNT(*) FROM orders GROUP BY month(o_orderdate);
SELECT quarter(o_orderdate), COUNT(*) FROM orders GROUP BY quarter(o_orderdate);
SELECT year(o_orderdate), SUM(o_totalprice) FROM orders GROUP BY year(o_orderdate);
SELECT year(o_orderdate), AVG(o_totalprice) FROM orders GROUP BY year(o_orderdate);
SELECT month(o_orderdate), SUM(o_totalprice) FROM orders WHERE o_orderstatus = 'F' GROUP BY month(o_orderdate);
SELECT year(l_shipdate), COUNT(*) FROM lineitem GROUP BY year(l_shipdate);
SELECT year(l_shipdate), SUM(l_extendedprice) FROM lineitem WHERE l_quantity < 30 GROUP BY year(l_shipdate);
SELECT month(l_shipdate), COUNT(*) FROM lineitem WHERE l_returnflag = 'A' GROUP BY month(l_shipdate);
SELECT quarter(l_shipdate), AVG(l_quantity) FROM lineitem GROUP BY quarter(l_shipdate);
SELECT year(o_orderdate), COUNT(*) FROM orders WHERE o_orderdate >= '1995-01-01' GROUP BY year(o_orderdate);
SELECT year(o_orderdate), COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_quantity < 25 GROUP BY year(o_orderdate);
SELECT month(o_orderdate), COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_returnflag = 'R' GROUP BY month(o_orderdate);
SELECT year(l_shipdate), SUM(l_extendedprice) FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_totalprice < 120000 GROUP BY year(l_shipdate);
SELECT quarter(o_orderdate), SUM(o_totalprice) FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY quarter(o_orderdate);
SELECT year(o_orderdate), AVG(o_totalprice) FROM orders WHERE o_orderstatus = 'O' GROUP BY year(o_orderdate);
SELECT month(l_shipdate), SUM(l_quantity) FROM lineitem WHERE l_discount < 0.05 GROUP BY month(l_shipdate);
SELECT year(o_orderdate), COUNT(*) FROM orders WHERE o_orderdate < '1997-06-01' GROUP BY year(o_orderdate);
SELECT quarter(l_shipdate), COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 10 AND 40 GROUP BY quarter(l_shipdate);
SELECT year(o_orderdate), o_orderpriority, COUNT(*) FROM orders GROUP BY year(o_orderdate), o_orderpriority;
SELECT month(o_orderdate), o_orderstatus, COUNT(*) FROM orders WHERE o_totalprice < 150000 GROUP BY month(o_orderdate), o_orderstatus;
SELECT year(l_shipdate), l_returnflag, SUM(l_extendedprice) FROM lineitem GROUP BY year(l_shipdate), l_returnflag;
SELECT quarter(o_orderdate), c_mktsegment, COUNT(*) FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY quarter(o_orderdate), c_mktsegment;
