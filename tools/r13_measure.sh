#!/bin/bash
# Round-13 measurement batch — run sequentially on an otherwise-quiet box.
# Produces the BASELINE.md evidence for: the q182 A/B (verdict ask #2),
# the widening-operator g-rehearsals (ask #5), and the unigram tick
# rehearsal (ask #8). One JSON line per measurement on stdout.
set -u
cd /root/repo
run() { timeout 1500 sbt -batch "$@" 2>&1; }

echo "=== q182 A/B: r13 tree vs r11 tree (a1dd9ae), interleaved min-of-3 x3 ==="
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    run "runMain graft.Bench q182_key_stats_nightly" \
    | grep '"metric":"detail"' | sed "s/^/r13[$i] /"
  (cd target/r11tree && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    timeout 1500 sbt -batch "runMain graft.Bench q182_key_stats_nightly" 2>&1 \
    | grep '"metric":"detail"' | sed "s/^/r11[$i] /")
done

echo "=== fixtures (heaps-consistent a1/h10/h100) ==="
SPARK_GRAFT_CPUS=32 run "runMain graft.ScaleFixture 50000 20000 target/fx_a1 100000 10000 15000 1" | tail -2
SPARK_GRAFT_CPUS=32 run "runMain graft.ScaleFixture 500000 200000 target/fx_h10 1000000 100000 150000 3" | tail -2
SPARK_GRAFT_CPUS=32 run "runMain graft.ScaleFixture 5000000 2000000 target/fx_h100 10000000 1000000 1500000 10" | tail -2

echo "=== unigram tick rehearsal (ask #8: ~30% churn snapshot delta) ==="
for d in fx_a1 fx_h10 fx_h100; do
  SPARK_GRAFT_CPUS=32 run "runMain graft.TickRehearse unigram target/$d $d" | grep '"mode"'
done

echo "=== widening g-rehearsals (ask #5) ==="
for n in 100000 1000000 10000000; do
  SPARK_GRAFT_CPUS=32 run "runMain graft.WideningRehearse pagerank_dense $n" | grep '"mode"'
done
for n in 100000 1000000 10000000; do
  SPARK_GRAFT_CPUS=32 run "runMain graft.WideningRehearse assoc_capped $n" | grep '"mode"'
done
for n in 100000 1000000 4000000; do
  SPARK_GRAFT_CPUS=32 run "runMain graft.WideningRehearse triples_capped $n" | grep '"mode"'
done
for n in 500000 5000000 50000000; do
  SPARK_GRAFT_CPUS=32 run "runMain graft.WideningRehearse bootstrap $n" | grep '"mode"'
done
echo "=== done ==="
