-- 8-query ALIAS-SPELLING + CROSS-GROUP SUBSUMPTION workload (round 19) —
-- external-file gate on the r18 wrong-answer class: branches of one
-- disjunction that are different SPELLINGS of the same predicate
-- (BETWEEN vs paired bounds, IN vs =, flipped conjunct order) must
-- dedupe before the signed inclusion–exclusion expansion (A∨A≡A at the
-- compiled layer) instead of silently cancelling terms, and a group
-- whose branch set subsumes another group's must drop before the
-- Π(2^k−1) <= 27 cap ((A∨B)∧(A∨B∨C) ≡ (A∨B)). Q1 is the round-18
-- judge counterexample verbatim (buggy est 3737 vs true 9376); Q5 only
-- parses at all with the cross-group law (raw product 189 > 27); Q6
-- exercises conjunct-absorption A∧(A∨C) ≡ A. Truth for sf0.01 committed
-- as testdata_aliasdup_8_true_sf0.01.csv, drift-pinned by WorkloadSpec
-- against the live exact plane.
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity BETWEEN 1 AND 5 OR l.l_quantity >= 1 AND l.l_quantity <= 5 OR l.l_tax > 0.07);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_returnflag IN ('A') OR l.l_returnflag = 'A' OR l.l_quantity < 5);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity >= 1 AND l.l_quantity <= 5 OR l.l_quantity <= 5 AND l.l_quantity >= 1 OR l.l_discount > 0.08);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity BETWEEN 30 AND 35 OR l.l_quantity >= 30 AND l.l_quantity <= 35 OR l.l_returnflag = 'R') AND (l.l_tax < 0.02 OR l.l_discount > 0.07);
SELECT COUNT(*) FROM lineitem l WHERE (l.l_quantity < 10 OR l.l_discount > 0.07) AND (l.l_quantity < 10 OR l.l_discount > 0.07 OR l.l_tax < 0.02) AND (l.l_returnflag = 'A' OR l.l_linestatus = 'F') AND (l.l_shipdate >= DATE '1995-01-01' OR l.l_tax > 0.05);
SELECT COUNT(*) FROM lineitem l WHERE l.l_returnflag = 'A' AND (l.l_returnflag = 'A' OR l.l_quantity > 45) AND (l.l_tax < 0.02 OR l.l_discount > 0.08);
SELECT COUNT(*) FROM orders o WHERE (o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31' OR o.o_orderdate >= DATE '1995-01-01' AND o.o_orderdate <= DATE '1995-12-31' OR o.o_orderpriority IN ('1-URGENT'));
SELECT COUNT(*) FROM orders o, lineitem l WHERE l.l_orderkey = o.o_orderkey AND (l.l_quantity BETWEEN 1 AND 5 OR l.l_quantity >= 1 AND l.l_quantity <= 5 OR o.o_totalprice > 250000);
