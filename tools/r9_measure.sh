#!/bin/bash
set -x
cd /root/repo
# 1. sf0.1 full verify + oracle sweep (10x-gate correctness evidence)
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/r9_verify_sf01_full" > /tmp/r9_m_verify.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.1 /tmp/r9_verify_sf01_full > /tmp/r9_m_oracle.log 2>&1
tail -1 /tmp/r9_m_oracle.log
# 2. full bench at sf0.1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r9_m_bench01.log 2>&1
cp bench_last.json /tmp/r9_bench_sf01.json
# 3. full bench at sf1
SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt -batch "runMain graft.Bench" > /tmp/r9_m_bench1.log 2>&1
cp bench_last.json /tmp/r9_bench_sf1.json
# 4. full bench at sf2
SPARK_GRAFT_SF_DIR=/tmp/sf2 sbt -batch "runMain graft.Bench" > /tmp/r9_m_bench2.log 2>&1
cp bench_last.json /tmp/r9_bench_sf2.json
echo DONE_R9_MEASURE
