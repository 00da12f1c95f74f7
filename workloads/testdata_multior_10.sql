-- 10-query MULTI-OR cardinality workload over the driver testdata star
-- schema — external-file coverage of the round-17 SQL-text widening: two
-- or three INDEPENDENT parenthesized OR groups per WHERE, answered through
-- Ensemble's signed 3^N conjunctive expansion (exactly the Catalyst
-- plane's multi-disjunction class). Groups mix cross-column and
-- same-column branches, conjunction branches, dates resolved in the
-- modeled encoding, and one FK join with a cross-TABLE branch pair.
-- Predicates stay on modeled columns inside the fixture domains. Evaluated
-- by graft.QErrorEval --workload; truth for sf0.01 committed as
-- testdata_multior_10_true_sf0.01.csv (DuckDB-generated, drift-pinned by
-- WorkloadSpec against the live exact plane).
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity < 10 OR l.l_quantity > 40) AND (l.l_discount < 0.03 OR l.l_tax > 0.05);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_returnflag = 'A' OR l.l_linestatus = 'O') AND (l.l_quantity < 25 OR l.l_discount > 0.07);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_shipdate < DATE '1994-01-01' OR l.l_shipdate >= DATE '1997-01-01') AND (l.l_quantity < 15 OR l.l_quantity > 35);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_extendedprice < 20000 OR l.l_extendedprice > 80000) AND (l.l_returnflag = 'R' OR l.l_tax < 0.02);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity < 10 OR l.l_quantity > 40) AND (l.l_discount < 0.03 OR l.l_tax > 0.05) AND (l.l_returnflag = 'N' OR l.l_linestatus = 'F');
SELECT COUNT(*) FROM orders o WHERE (o.o_orderstatus = 'F' OR o.o_orderpriority = '1-URGENT') AND (o.o_totalprice < 50000 OR o.o_totalprice > 150000);
SELECT COUNT(*) FROM orders o WHERE (o.o_orderdate < DATE '1994-01-01' OR o.o_orderdate >= DATE '1996-06-01') AND (o.o_orderpriority = '5-LOW' OR o.o_orderstatus = 'O');
SELECT COUNT(*) FROM orders o, lineitem l WHERE l.l_orderkey = o.o_orderkey AND (o.o_orderpriority = '1-URGENT' OR l.l_quantity > 45) AND (l.l_discount < 0.02 OR l.l_tax > 0.06);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity BETWEEN 5 AND 15 OR l.l_quantity BETWEEN 30 AND 40) AND (l.l_returnflag = 'A' OR l.l_returnflag = 'R');
SELECT COUNT(*) FROM lineitem l WHERE (l.l_shipdate >= DATE '1995-01-01' AND l.l_shipdate < DATE '1996-01-01' OR l.l_quantity > 45) AND (l.l_linestatus = 'F' OR l.l_tax < 0.01);
