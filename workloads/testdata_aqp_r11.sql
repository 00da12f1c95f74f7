-- Round-11 AQP workload: the predicate/aggregate shapes BOTH planes
-- learned this round — negated dictionary predicates (!= / NOT IN),
-- LIKE closure with multi-wildcard patterns, COUNT(DISTINCT cat) —
-- over the driver testdata star schema, one query per line (the
-- testdata_aqp_20.sql layout). Gated by WorkloadSpec (text plane vs
-- live exact, relative error) AND by SpnAqpSpec's cross-plane
-- agreement (the transparent Catalyst rule must produce the SAME
-- numbers as the SQL-text estimator for every query here).
SELECT COUNT(*) FROM lineitem l WHERE l.l_returnflag != 'N';
SELECT COUNT(*) FROM orders o WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH');
SELECT COUNT(*) FROM orders o WHERE o.o_orderpriority LIKE '1%';
SELECT COUNT(*) FROM lineitem l WHERE l.l_returnflag LIKE '%A%' AND l.l_quantity < 30;
SELECT COUNT(DISTINCT l_linestatus) FROM lineitem l WHERE l.l_quantity < 25;
SELECT COUNT(DISTINCT o_orderpriority) FROM orders o WHERE o.o_totalprice < 150000;
SELECT SUM(l_extendedprice) FROM lineitem l WHERE l.l_returnflag != 'A';
SELECT AVG(o_totalprice) FROM orders o WHERE o.o_orderpriority LIKE '%URGENT%';
SELECT COUNT(*) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_orderpriority LIKE '1%' AND l.l_quantity < 24;
SELECT SUM(l_quantity) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_orderstatus != 'F';
SELECT COUNT(DISTINCT c_mktsegment) FROM customer c,orders o WHERE c.c_custkey=o.o_custkey AND o.o_totalprice < 100000;
SELECT AVG(l_extendedprice) FROM lineitem l WHERE l.l_linestatus != 'F' AND l.l_discount < 0.08;
