-- 10-query GROUPED-AGGREGATE JOIN AQP workload — the reference's
-- aqp_evaluation.py grouped surface over JOIN CHAINS (testdata_joins_30
-- is COUNT-only; the reference's AQP evaluation runs grouped SUM/AVG over
-- joins). Same one-query-per-line layout and comma-join form as the
-- join-chain file; group columns are categorical modeled columns so the
-- SAME text runs on both planes. Evaluated by graft.QErrorEval
-- --workload with per-group CI checks in the artifact; grouped truth for
-- sf0.01 committed as testdata_joins_grouped_10_true_sf0.01.csv
-- (regenerate with --dump-group-truth).
SELECT l_returnflag, COUNT(*) FROM lineitem l,orders o WHERE l.l_orderkey=o.o_orderkey AND o.o_totalprice < 150000 GROUP BY l_returnflag;
SELECT o_orderpriority, SUM(l_extendedprice) FROM lineitem l,orders o WHERE l.l_orderkey=o.o_orderkey AND l.l_quantity < 30 GROUP BY o_orderpriority;
SELECT c_mktsegment, SUM(o_totalprice) FROM orders o,customer c WHERE o.o_custkey=c.c_custkey AND o.o_orderstatus = 'F' GROUP BY c_mktsegment;
SELECT c_mktsegment, COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_returnflag = 'A' GROUP BY c_mktsegment;
SELECT l_linestatus, AVG(l_extendedprice) FROM lineitem l,orders o WHERE l.l_orderkey=o.o_orderkey AND o.o_totalprice < 100000 GROUP BY l_linestatus;
SELECT p_brand, COUNT(*) FROM lineitem l,part p WHERE l.l_partkey=p.p_partkey AND l.l_quantity > 25 GROUP BY p_brand;
SELECT p_type, SUM(l_extendedprice) FROM lineitem l,part p WHERE l.l_partkey=p.p_partkey AND p.p_retailprice < 980 GROUP BY p_type;
SELECT o_orderstatus, SUM(l_quantity) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND c.c_acctbal > 2000 GROUP BY o_orderstatus;
SELECT l_returnflag, AVG(o_totalprice) FROM lineitem l,orders o WHERE l.l_orderkey=o.o_orderkey AND l.l_discount < 0.05 GROUP BY l_returnflag;
SELECT c_mktsegment, SUM(o_totalprice) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_linestatus = 'O' GROUP BY c_mktsegment;
