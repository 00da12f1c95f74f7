-- 10-query GROUP BY AQP workload over the driver testdata star schema —
-- the reference's evaluation/aqp_evaluation.py grouped surface (per-group
-- relative error of model answers vs exact) in the same one-query-per-line
-- file layout as testdata_30.sql. Group columns are categorical modeled
-- columns (rspn/Ensemble colSpecs) and appear in the SELECT list so the
-- SAME text runs on both planes: spark.sql yields (group..., agg) truth
-- rows, SqlEstimate yields the model's per-group estimates. Evaluated by
-- graft.QErrorEval --workload (grouped truth is computed live; the scalar
-- truth-CSV layout cannot carry per-group values).
SELECT l_returnflag, COUNT(*) FROM lineitem l GROUP BY l_returnflag;
SELECT l_linestatus, COUNT(*) FROM lineitem l WHERE l.l_quantity < 25 GROUP BY l_linestatus;
SELECT l_returnflag, SUM(l_extendedprice) FROM lineitem l GROUP BY l_returnflag;
SELECT l_returnflag, AVG(l_quantity) FROM lineitem l WHERE l.l_discount < 0.05 GROUP BY l_returnflag;
SELECT o_orderstatus, COUNT(*) FROM orders o GROUP BY o_orderstatus;
SELECT o_orderpriority, COUNT(*) FROM orders o WHERE o.o_totalprice < 150000 GROUP BY o_orderpriority;
SELECT c_mktsegment, COUNT(*) FROM customer c GROUP BY c_mktsegment;
SELECT c_mktsegment, COUNT(*) FROM customer c,orders o WHERE c.c_custkey=o.o_custkey GROUP BY c_mktsegment;
SELECT l_returnflag, l_linestatus, COUNT(*) FROM lineitem l GROUP BY l_returnflag, l_linestatus;
SELECT o_orderpriority, SUM(l_extendedprice) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey GROUP BY o_orderpriority;
