-- 30-query cardinality workload over the driver testdata star schema,
-- in the reference's JOB-light file format (deepdb-public
-- benchmarks/job-light/sql/job_light_queries.sql): one COUNT(*) query per
-- line, implicit comma joins with aliases, conjunctive predicates.
-- Predicates stay on modeled columns (rspn/Ensemble colSpecs) inside the
-- measured fixture domains (FIXTURES.md) so the workload is answerable at
-- every SF. Evaluated by graft.QErrorEval --workload; truth for sf0.01 is
-- committed as testdata_30_true_sf0.01.csv (regenerate with --dump-truth).
SELECT COUNT(*) FROM lineitem l WHERE l.l_quantity < 25;
SELECT COUNT(*) FROM lineitem l WHERE l.l_quantity BETWEEN 10 AND 30 AND l.l_discount < 0.05;
SELECT COUNT(*) FROM lineitem l WHERE l.l_returnflag = 'A' AND l.l_quantity > 20;
SELECT COUNT(*) FROM lineitem l WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01';
SELECT COUNT(*) FROM lineitem l WHERE l.l_extendedprice > 30000 AND l.l_tax < 0.05;
SELECT COUNT(*) FROM orders o WHERE o.o_totalprice < 150000;
SELECT COUNT(*) FROM orders o WHERE o.o_orderstatus = 'F' AND o.o_orderdate < '1999-01-01';
SELECT COUNT(*) FROM orders o WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH');
SELECT COUNT(*) FROM part p WHERE p.p_size BETWEEN 10 AND 40;
SELECT COUNT(*) FROM customer c WHERE c.c_acctbal > 1000;
SELECT COUNT(*) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_orderstatus = 'F';
SELECT COUNT(*) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND l.l_quantity < 20;
SELECT COUNT(*) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_totalprice < 100000 AND l.l_returnflag = 'N';
SELECT COUNT(*) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND o.o_orderdate >= '1996-01-01' AND l.l_discount > 0.02;
SELECT COUNT(*) FROM lineitem l,orders o WHERE o.o_orderkey=l.l_orderkey AND l.l_shipdate < '1997-06-01' AND o.o_orderpriority = '5-LOW';
SELECT COUNT(*) FROM orders o,customer c WHERE c.c_custkey=o.o_custkey AND c.c_mktsegment = 'BUILDING';
SELECT COUNT(*) FROM orders o,customer c WHERE c.c_custkey=o.o_custkey AND c.c_acctbal < 5000 AND o.o_orderstatus = 'O';
SELECT COUNT(*) FROM orders o,customer c WHERE c.c_custkey=o.o_custkey AND o.o_totalprice > 200000;
SELECT COUNT(*) FROM orders o,customer c WHERE c.c_custkey=o.o_custkey AND c.c_mktsegment IN ('MACHINERY', 'HOUSEHOLD') AND o.o_orderdate < '2000-01-01';
SELECT COUNT(*) FROM lineitem l,part p WHERE p.p_partkey=l.l_partkey AND p.p_size < 25;
SELECT COUNT(*) FROM lineitem l,part p WHERE p.p_partkey=l.l_partkey AND p.p_retailprice > 1200 AND l.l_quantity < 30;
SELECT COUNT(*) FROM lineitem l,supplier s WHERE s.s_suppkey=l.l_suppkey AND s.s_acctbal > 0;
SELECT COUNT(*) FROM customer c,orders o,lineitem l WHERE c.c_custkey=o.o_custkey AND o.o_orderkey=l.l_orderkey AND c.c_mktsegment = 'BUILDING';
SELECT COUNT(*) FROM customer c,orders o,lineitem l WHERE c.c_custkey=o.o_custkey AND o.o_orderkey=l.l_orderkey AND c.c_mktsegment = 'AUTOMOBILE' AND l.l_quantity < 30;
SELECT COUNT(*) FROM customer c,orders o,lineitem l WHERE c.c_custkey=o.o_custkey AND o.o_orderkey=l.l_orderkey AND c.c_acctbal > 2000 AND l.l_returnflag = 'R';
SELECT COUNT(*) FROM customer c,orders o,lineitem l WHERE c.c_custkey=o.o_custkey AND o.o_orderkey=l.l_orderkey AND o.o_orderstatus = 'O' AND l.l_shipdate >= '1996-01-01';
SELECT COUNT(*) FROM customer c,orders o,lineitem l WHERE c.c_custkey=o.o_custkey AND o.o_orderkey=l.l_orderkey AND c.c_mktsegment = 'FURNITURE' AND o.o_totalprice < 250000 AND l.l_discount < 0.08;
SELECT COUNT(*) FROM orders o,lineitem l,part p WHERE o.o_orderkey=l.l_orderkey AND p.p_partkey=l.l_partkey AND p.p_size < 30 AND o.o_orderstatus = 'F';
SELECT COUNT(*) FROM orders o,lineitem l,part p WHERE o.o_orderkey=l.l_orderkey AND p.p_partkey=l.l_partkey AND p.p_retailprice < 1500 AND l.l_quantity BETWEEN 5 AND 35;
SELECT COUNT(*) FROM orders o,lineitem l,part p WHERE o.o_orderkey=l.l_orderkey AND p.p_partkey=l.l_partkey AND o.o_orderdate >= '1995-06-01' AND p.p_size > 15 AND l.l_returnflag = 'N';
