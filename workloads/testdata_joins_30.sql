-- 30-query JOIN-CHAIN cardinality workload over the driver testdata star
-- schema, in the reference's JOB-light file format (deepdb-public
-- benchmarks/job-light/sql/job_light_queries.sql): one COUNT(*) per line,
-- implicit comma joins with aliases, conjunctive predicates. Where
-- testdata_30.sql is mostly 1-2 tables, every query here chains 3-5
-- tables — the class where model choice (chain SPN vs factored
-- composition over PK-FK edges) carries the estimate, the reference's
-- defining JOB-light stress. Predicates stay on modeled columns inside
-- the measured fixture domains (FIXTURES.md) so the workload is
-- answerable at every SF. Evaluated by graft.QErrorEval --workload; truth
-- for sf0.01 committed as testdata_joins_30_true_sf0.01.csv (regenerate
-- with --dump-truth).
SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_quantity < 25;
SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND c.c_mktsegment = 'BUILDING';
SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND o.o_totalprice < 50000 AND l.l_returnflag = 'A';
SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND c.c_acctbal > 5000 AND l.l_quantity BETWEEN 10 AND 30;
SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND o.o_orderpriority = '1-URGENT' AND l.l_discount < 0.05;
SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND o.o_orderdate >= '1997-01-01' AND c.c_mktsegment = 'MACHINERY';
SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_shipdate < '1998-01-01' AND o.o_orderstatus = 'F' AND c.c_acctbal < 2000;
SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_linestatus = 'O' AND o.o_totalprice BETWEEN 20000 AND 150000;
SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_quantity > 40 AND c.c_mktsegment = 'AUTOMOBILE' AND o.o_orderstatus = 'O';
SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_tax < 0.04 AND o.o_orderdate < '1999-06-01' AND c.c_acctbal > 0;
SELECT COUNT(*) FROM lineitem l,orders o,part p WHERE l.l_orderkey=o.o_orderkey AND l.l_partkey=p.p_partkey AND p.p_size < 20 AND o.o_totalprice < 100000;
SELECT COUNT(*) FROM lineitem l,orders o,part p WHERE l.l_orderkey=o.o_orderkey AND l.l_partkey=p.p_partkey AND p.p_brand = 'Brand#11' AND l.l_quantity < 30;
SELECT COUNT(*) FROM lineitem l,orders o,part p WHERE l.l_orderkey=o.o_orderkey AND l.l_partkey=p.p_partkey AND p.p_retailprice > 950 AND o.o_orderpriority = '5-LOW';
SELECT COUNT(*) FROM lineitem l,part p,supplier s WHERE l.l_partkey=p.p_partkey AND l.l_suppkey=s.s_suppkey AND p.p_size BETWEEN 10 AND 40 AND s.s_acctbal > 3000;
SELECT COUNT(*) FROM lineitem l,part p,supplier s WHERE l.l_partkey=p.p_partkey AND l.l_suppkey=s.s_suppkey AND p.p_type = 'STANDARD' AND l.l_returnflag = 'N';
SELECT COUNT(*) FROM lineitem l,orders o,supplier s WHERE l.l_orderkey=o.o_orderkey AND l.l_suppkey=s.s_suppkey AND s.s_acctbal < 5000 AND o.o_orderstatus = 'F';
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND p.p_size < 25 AND c.c_mktsegment = 'BUILDING';
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND p.p_brand = 'Brand#22' AND o.o_totalprice < 120000;
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND l.l_quantity < 20 AND c.c_acctbal > 4000 AND p.p_retailprice < 980;
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '2000-01-01' AND p.p_type = 'ECONOMY';
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND l.l_returnflag = 'R' AND c.c_mktsegment = 'HOUSEHOLD' AND p.p_size > 30;
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND l.l_discount > 0.06 AND o.o_orderpriority = '2-HIGH';
SELECT COUNT(*) FROM lineitem l,orders o,part p,supplier s WHERE l.l_orderkey=o.o_orderkey AND l.l_partkey=p.p_partkey AND l.l_suppkey=s.s_suppkey AND p.p_size < 15 AND s.s_acctbal > 0 AND o.o_orderstatus = 'O';
SELECT COUNT(*) FROM lineitem l,orders o,part p,supplier s WHERE l.l_orderkey=o.o_orderkey AND l.l_partkey=p.p_partkey AND l.l_suppkey=s.s_suppkey AND p.p_type = 'PROMO' AND l.l_quantity > 25;
SELECT COUNT(*) FROM lineitem l,orders o,customer c,supplier s WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_suppkey=s.s_suppkey AND c.c_acctbal > 2000 AND s.s_acctbal > 2000;
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p,supplier s WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND l.l_suppkey=s.s_suppkey AND p.p_size < 30 AND c.c_mktsegment = 'FURNITURE';
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p,supplier s WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND l.l_suppkey=s.s_suppkey AND l.l_quantity < 15 AND s.s_acctbal < 8000;
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p,supplier s WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND l.l_suppkey=s.s_suppkey AND o.o_totalprice < 80000 AND p.p_retailprice > 940;
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p,supplier s WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND l.l_suppkey=s.s_suppkey AND o.o_orderdate >= '1998-01-01' AND p.p_brand = 'Brand#21' AND c.c_acctbal > 0;
SELECT COUNT(*) FROM lineitem l,orders o,customer c,part p,supplier s WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_partkey=p.p_partkey AND l.l_suppkey=s.s_suppkey AND l.l_returnflag = 'A' AND l.l_linestatus = 'F' AND s.s_acctbal > 1000;
