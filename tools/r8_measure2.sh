#!/bin/bash
# Round-8 FINAL measurement chain (post perf-work + new queries).
# /tmp/sf1 and /tmp/sf2 already exist from the early-round chain.
set -x
cd /root/repo

# 1. sf0.1 full Verify dump (the 10x-gate correctness sweep)
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01_r8b" \
  > /tmp/r8b_verify_sf01.log 2>&1

# 2. bench at sf0.1 (prior = the restored r7-era sf0.1 record)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/r8b_bench_sf01.log 2>&1
cp bench_last.json /tmp/r8b_bench_sf01.json

# 3. bench at sf1 (prior = early-r8 sf1 record)
cp /tmp/r8_bench_sf1.json bench_last.json
SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt -batch "runMain graft.Bench" \
  > /tmp/r8b_bench_sf1.log 2>&1
cp bench_last.json /tmp/r8b_bench_sf1.json

# 4. bench at sf2 (prior = early-r8 sf2 record)
cp /tmp/r8_bench_sf2.json bench_last.json
SPARK_GRAFT_SF_DIR=/tmp/sf2 sbt -batch "runMain graft.Bench" \
  > /tmp/r8b_bench_sf2.log 2>&1
cp bench_last.json /tmp/r8b_bench_sf2.json

# restore the sf0.1 record as the canonical bench_last
cp /tmp/r8b_bench_sf01.json bench_last.json
echo CHAIN2_DONE
