#!/bin/bash
# Round-8 FINAL measurement chain (after the third operator wave:
# LLR, RRF, DiD, attribution, CUPED + the KM streaming twin): one full
# sf0.1 oracle sweep of the whole registry plus full-registry bench
# re-records at sf0.1/sf1/sf2, replacing the per-query patched blends
# with single consistent runs. Each bench run's min2redo prior is the
# matching committed record.
set -x
cd /root/repo

# 1. sf0.1 full Verify dump + oracle compare (the 10x-gate sweep)
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01_r8e" \
  > /tmp/r8e_verify_sf01.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.1 /tmp/verify_sf01_r8e \
  > /tmp/r8e_oracle_sf01.log 2>&1

# 2. bench at sf0.1 (prior = committed sf0.1 record)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/r8e_bench_sf01.log 2>&1
cp bench_last.json /tmp/r8e_bench_sf01.json

# 3. bench at sf1 (prior = committed sf1 record)
cp bench_sf1.json bench_last.json
SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt -batch "runMain graft.Bench" \
  > /tmp/r8e_bench_sf1.log 2>&1
cp bench_last.json /tmp/r8e_bench_sf1.json

# 4. bench at sf2 (prior = committed sf2 record)
cp bench_sf2.json bench_last.json
SPARK_GRAFT_SF_DIR=/tmp/sf2 sbt -batch "runMain graft.Bench" \
  > /tmp/r8e_bench_sf2.log 2>&1
cp bench_last.json /tmp/r8e_bench_sf2.json

# restore the committed sf0.1 blend until results are adjudicated
git checkout -- bench_last.json
echo CHAIN3_DONE
