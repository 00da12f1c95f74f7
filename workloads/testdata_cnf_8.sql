-- 8-query CNF-ABSORPTION cardinality workload (round 18) — external-file
-- coverage of the pre-simplification pass: every WHERE writes FOUR OR MORE
-- parenthesized disjunctions, but same-column branches absorb into single
-- range-union / value-set conjuncts BEFORE the 3^N cap counts groups, so
-- each query is semantically <= 3 effective groups and must ANSWER (the
-- unabsorbed spelling would fail loudly at parse). Shapes: disjoint
-- numeric range unions (NumUnion -> MultiRange), dictionary value unions,
-- three-way same-column disjunctions, IS NOT NULL absorption, branch
-- subsumption, date-range unions in the modeled encoding, and one FK join.
-- Truth for sf0.01 committed as testdata_cnf_8_true_sf0.01.csv
-- (DuckDB-generated, drift-pinned by WorkloadSpec against the live exact
-- plane).
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity < 10 OR l.l_quantity > 40) AND (l.l_returnflag = 'A' OR l.l_returnflag = 'R') AND (l.l_discount < 0.02 OR l.l_tax > 0.06) AND (l.l_linestatus = 'F' OR l.l_extendedprice > 60000);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_returnflag = 'A' OR l.l_returnflag = 'R' OR l.l_returnflag = 'N') AND (l.l_quantity < 15 OR l.l_quantity BETWEEN 30 AND 35 OR l.l_quantity > 45) AND (l.l_discount < 0.03 OR l.l_tax > 0.05);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_extendedprice < 20000 OR l.l_extendedprice > 80000) AND (l.l_shipdate < DATE '1994-01-01' OR l.l_shipdate >= DATE '1997-01-01') AND (l.l_quantity < 20 OR l.l_quantity > 30) AND (l.l_returnflag = 'N' OR l.l_linestatus = 'O');
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity < 12 OR l.l_quantity > 38) AND (l.l_returnflag = 'A' OR l.l_returnflag = 'N') AND (l.l_discount < 0.02 OR l.l_extendedprice > 50000);
SELECT COUNT(*) FROM orders o WHERE (o.o_totalprice < 50000 OR o.o_totalprice > 150000) AND (o.o_orderpriority = '1-URGENT' OR o.o_orderpriority = '5-LOW') AND (o.o_orderdate < DATE '1993-06-01' OR o.o_orderdate >= DATE '1996-01-01') AND (o.o_orderstatus = 'F' OR o.o_totalprice > 100000);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity IS NOT NULL OR l.l_quantity < 10) AND (l.l_tax < 0.01 OR l.l_tax > 0.07) AND (l.l_returnflag = 'R' OR l.l_linestatus = 'F') AND (l.l_discount < 0.04 OR l.l_extendedprice < 30000);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity < 10 AND l.l_discount < 0.05 OR l.l_quantity < 10) AND (l.l_shipdate >= DATE '1995-01-01' OR l.l_shipdate < DATE '1993-01-01') AND (l.l_returnflag = 'A' OR l.l_tax > 0.06);
SELECT COUNT(*) FROM orders o, lineitem l WHERE l.l_orderkey = o.o_orderkey AND (l.l_quantity < 8 OR l.l_quantity > 42) AND (o.o_orderpriority = '1-URGENT' OR o.o_orderpriority = '2-HIGH') AND (o.o_totalprice < 60000 OR l.l_discount > 0.08) AND (l.l_returnflag = 'A' OR l.l_returnflag = 'R');
