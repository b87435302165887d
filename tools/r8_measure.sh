#!/bin/bash
# Round-8 measurement chain: sf0.1 correctness sweep, then full-registry
# bench records at sf0.1 / sf1 / sf2 (sf1+sf2 regenerated in /tmp —
# they do not survive between rounds). One script so the sbt project
# lock serializes everything.
set -x
cd /root/repo

# 1. sf0.1 full Verify dump (the 10x-gate correctness sweep)
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01_r8" \
  > /tmp/r8_verify_sf01.log 2>&1

# 2. bench at sf0.1 (prior = r07 record in bench_last.json, same sf)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/r8_bench_sf01.log 2>&1
cp bench_last.json /tmp/r8_bench_sf01.json

# 3. regenerate sf1 and bench there
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10" \
  > /tmp/r8_scaleup_sf1.log 2>&1
cp bench_sf1.json bench_last.json   # prior for min2redo at /tmp/sf1
SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt -batch "runMain graft.Bench" \
  > /tmp/r8_bench_sf1.log 2>&1
cp bench_last.json /tmp/r8_bench_sf1.json

# 4. regenerate sf2 and bench there
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf2 20" \
  > /tmp/r8_scaleup_sf2.log 2>&1
cp bench_sf2.json bench_last.json
SPARK_GRAFT_SF_DIR=/tmp/sf2 sbt -batch "runMain graft.Bench" \
  > /tmp/r8_bench_sf2.log 2>&1
cp bench_last.json /tmp/r8_bench_sf2.json

# restore the sf0.1 record as the canonical bench_last
cp /tmp/r8_bench_sf01.json bench_last.json
echo CHAIN_DONE
