-- 8-query N-BRANCH DISJUNCTION cardinality workload (round 18) —
-- external-file coverage of the full per-group inclusion–exclusion
-- expansion: every WHERE holds at least one parenthesized disjunction
-- with THREE OR MORE branches that do NOT absorb (mixed columns /
-- conjunction branches), so each query exercises the 2^k−1 signed picks
-- the r17 two-branch slots could not express, under the total-term
-- Π(2^k−1) <= 27 cap. Shapes: 3-branch mixed-column, 4-branch (15
-- terms), the TPC-H Q19 disjunction-of-conjunctions shape, 3×2-group
-- layouts (21 terms), a common conjunct distributing into every term,
-- cross-TABLE branches over one FK join, and modeled-unit date literals.
-- Truth for sf0.01 committed as testdata_orbranches_8_true_sf0.01.csv
-- (DuckDB-generated, drift-pinned by WorkloadSpec against the live exact
-- plane).
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity < 8 OR l.l_discount > 0.08 OR l.l_tax < 0.01);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity < 10 AND l.l_returnflag = 'A' OR l.l_quantity > 40 AND l.l_linestatus = 'F' OR l.l_discount > 0.08 AND l.l_tax < 0.03);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity < 3 OR l.l_discount > 0.09 OR l.l_returnflag = 'R' OR l.l_tax < 0.01);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity < 10 OR l.l_discount > 0.07 OR l.l_tax < 0.02) AND (l.l_linestatus = 'F' OR l.l_tax > 0.05);
SELECT COUNT(*) FROM orders o WHERE (o.o_totalprice < 40000 OR o.o_orderpriority = '1-URGENT' OR o.o_orderdate >= DATE '1997-06-01');
SELECT COUNT(*) FROM lineitem l WHERE l.l_shipdate >= DATE '1994-01-01' AND (l.l_quantity < 12 OR l.l_discount > 0.07 OR l.l_returnflag = 'R') AND (l.l_linestatus = 'O' OR l.l_tax > 0.06);
SELECT COUNT(*) FROM orders o, lineitem l WHERE l.l_orderkey = o.o_orderkey AND (o.o_totalprice < 60000 OR l.l_discount > 0.08 OR l.l_quantity > 45);
SELECT COUNT(*) FROM orders o, lineitem l WHERE l.l_orderkey = o.o_orderkey AND (l.l_quantity < 6 AND l.l_returnflag = 'A' OR o.o_orderpriority = '1-URGENT' AND l.l_discount > 0.05 OR l.l_tax < 0.01 AND o.o_totalprice > 150000);
