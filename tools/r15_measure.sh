#!/bin/bash
# Round-15 measurement batch (sequential; quiet box).
# Produces BASELINE.md evidence for: the q05/q61/q106 bench A/B
# (verdict ask #3), the q46/q58 streaming A/B (ask #4), and the
# COMPOSED q157 nightly g-rehearsal at a1/h10/h100 (ask #7).
# Baseline tree = the round-13 close 206b1b0 in target/r13tree.
set -u
cd /root/repo
run() { timeout 2400 sbt -batch "$@" 2>&1; }
runb() { (cd target/r13tree && timeout 2400 sbt -batch "$@" 2>&1); }

echo "=== warm both trees (compile + one untimed subset pass) ==="
run "runMain graft.Bench q05_session_metadata" | grep '"metric":"total"' | sed 's/^/warm-head /'
runb "runMain graft.Bench q05_session_metadata" | grep '"metric":"total"' | sed 's/^/warm-r13 /'

echo "=== ask 3: q05/q61/q106 A/B, interleaved min-of-3 x3, sf0.1 ==="
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    run "runMain graft.Bench q05_session_metadata q61_doc_chunking q106_contamination_spans" \
    | grep -E '"metric":"(detail|mins)"' | sed "s/^/head[$i] /"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    runb "runMain graft.Bench q05_session_metadata q61_doc_chunking q106_contamination_spans" \
    | grep -E '"metric":"(detail|mins)"' | sed "s/^/r13 [$i] /"
done

echo "=== ask 4: streaming gates A/B, interleaved x3, sf0.1 ==="
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    run "runMain graft.Bench streaming" | grep '"metric":"streaming"' | sed "s/^/head[$i] /"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    runb "runMain graft.Bench streaming" | grep '"metric":"streaming"' | sed "s/^/r13 [$i] /"
done

echo "=== ask 7: COMPOSED q157 nightly5 g-rehearsal (bootstrap+tick, ~30% churn) ==="
for d in fx_a1 fx_h10 fx_h100; do
  SPARK_GRAFT_CPUS=32 run "runMain graft.TickRehearse nightly5 target/$d $d" | grep '"mode"'
done
echo "=== done ==="
