-- SSB-flight AQP workload: the reference's headline experiment (deepdb's
-- aqp evaluation runs on the Star Schema Benchmark) re-cut to the
-- restricted model-plane SQL class — scalar aggregates over the fact and
-- its dimensions, flights sliced to one group each (the model answers
-- grouped flights via est_groupby / spn_groupby; the file format is one
-- scalar query per line). Flight 1 = discount-window revenue by order
-- year; flight 2 = part-sliced revenue; flight 3 = customer-sliced
-- revenue over a date range; flight 4 = the profit-shaped SUM±SUM.
-- Evaluated by graft.QErrorEval --workload (agg_rel_err block) and gated
-- in WorkloadSpec next to the generic AQP workload.
SELECT SUM(l_extendedprice * l_discount) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1996-01-01' AND l.l_discount BETWEEN 0.02 AND 0.04 AND l.l_quantity < 25;
SELECT SUM(l_extendedprice * l_discount) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1997-01-01' AND l.l_discount BETWEEN 0.04 AND 0.06 AND l.l_quantity BETWEEN 26 AND 35;
SELECT SUM(l_extendedprice * l_discount) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_orderdate >= '1997-01-01' AND o.o_orderdate < '1998-01-01' AND l.l_discount BETWEEN 0.05 AND 0.07 AND l.l_quantity < 35;
SELECT SUM(l_extendedprice) FROM lineitem l,part p WHERE p.p_partkey=l.l_partkey AND p.p_type = 'PROMO' AND p.p_brand = 'Brand#12';
SELECT SUM(l_extendedprice * l_discount) FROM lineitem l,part p WHERE p.p_partkey=l.l_partkey AND p.p_type = 'ECONOMY' AND p.p_size < 25;
SELECT SUM(l_extendedprice) FROM orders o,lineitem l,part p WHERE o.o_orderkey=l.l_orderkey AND p.p_partkey=l.l_partkey AND p.p_type = 'PROMO' AND o.o_orderdate >= '1997-01-01';
SELECT SUM(l_extendedprice) FROM customer c,orders o,lineitem l WHERE c.c_custkey=o.o_custkey AND o.o_orderkey=l.l_orderkey AND c.c_mktsegment = 'BUILDING' AND o.o_orderdate BETWEEN '1995-01-01' AND '1997-12-31';
SELECT AVG(l_extendedprice) FROM customer c,orders o,lineitem l WHERE c.c_custkey=o.o_custkey AND o.o_orderkey=l.l_orderkey AND c.c_acctbal > 1000 AND l.l_discount < 0.05;
SELECT SUM(l_extendedprice) - SUM(l_extendedprice * l_discount) FROM customer c,orders o,lineitem l WHERE c.c_custkey=o.o_custkey AND o.o_orderkey=l.l_orderkey AND c.c_mktsegment = 'MACHINERY';
SELECT SUM(l_extendedprice) FROM lineitem l,orders o,supplier s WHERE o.o_orderkey=l.l_orderkey AND s.s_suppkey=l.l_suppkey AND s.s_acctbal > 0 AND o.o_orderstatus = 'F';
