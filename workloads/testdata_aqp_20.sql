-- 20-query AQP workload (SUM / AVG / SUM(a*b) / SUM±SUM) over the driver
-- testdata star schema — the reference's aqp_evaluation.py surface
-- (relative error of model answers vs exact) in the same one-query-per-line
-- file layout as testdata_30.sql. Evaluated by graft.QErrorEval
-- --workload; the JSON artifact carries an agg_rel_err block for these.
SELECT SUM(l_extendedprice) FROM lineitem l WHERE l.l_quantity < 25;
SELECT SUM(l_quantity) FROM lineitem l WHERE l.l_returnflag = 'A';
SELECT AVG(l_extendedprice) FROM lineitem l WHERE l.l_discount < 0.05;
SELECT AVG(l_quantity) FROM lineitem l WHERE l.l_shipdate >= '1996-01-01';
SELECT SUM(l_extendedprice) FROM lineitem l WHERE l.l_shipdate BETWEEN '1996-01-01' AND '1997-12-31';
SELECT SUM(o_totalprice) FROM orders o WHERE o.o_orderstatus = 'F';
SELECT AVG(o_totalprice) FROM orders o WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH');
SELECT SUM(o_totalprice) FROM orders o WHERE o.o_orderdate < '1999-01-01';
SELECT SUM(l_extendedprice * l_discount) FROM lineitem l WHERE l.l_quantity < 30;
SELECT SUM(l_extendedprice * l_tax) FROM lineitem l WHERE l.l_returnflag = 'N';
SELECT SUM(l_quantity * l_discount) FROM lineitem l WHERE l.l_shipdate >= '1996-01-01';
SELECT SUM(l_extendedprice * l_discount) FROM lineitem l WHERE l.l_linestatus = 'O';
SELECT SUM(l_extendedprice) - SUM(l_quantity) FROM lineitem l WHERE l.l_quantity < 20;
SELECT SUM(o_totalprice) + SUM(o_totalprice) FROM orders o WHERE o.o_orderstatus = 'O';
SELECT SUM(l_extendedprice) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_orderstatus = 'F';
SELECT AVG(l_quantity) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_totalprice < 100000;
SELECT SUM(l_extendedprice) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_orderpriority = '5-LOW' AND l.l_discount < 0.06;
SELECT SUM(o_totalprice) FROM orders o,customer c WHERE c.c_custkey=o.o_custkey AND c.c_mktsegment = 'BUILDING';
SELECT AVG(o_totalprice) FROM orders o,customer c WHERE c.c_custkey=o.o_custkey AND c.c_acctbal > 1000;
SELECT SUM(l_quantity) FROM customer c,orders o,lineitem l WHERE c.c_custkey=o.o_custkey AND o.o_orderkey=l.l_orderkey AND c.c_mktsegment = 'MACHINERY';
