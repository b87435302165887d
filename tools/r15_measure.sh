#!/bin/bash
# Round-15 at-scale measurement chain (r14 VERDICT tasks 1, 5, 7 + ADVICE 1):
#   1. New/touched r15 queries verified at sf1 AND spot-checked at sf2,
#      INCLUDING mm_audio_fingerprint (r14 ADVICE: the r14 gates omitted
#      it; registry is 320 after mm_framehash_dedup + curation_pack_delta).
#   2. Task 5: hot-template DOCUMENT skew — pair families verified N/N on
#      /tmp/skewdoc01 (sf0.1-based: below the caps, the pair-flood case)
#      and the dedup+mm families on /tmp/skewdoc1 (sf1-based: the
#      ShingleDfCap crossing); SkewDocStudy names what the cap drops in
#      records/skewdoc.jsonl (committed).
#   3. Task 7: sf5 (500x) spot oracle tier for the 5 heaviest-output
#      queries.
#   4. Scale records: bench at sf1 and sf2 on the final tree (prior
#      artifact swapped in per SF so vs_prior/median_query_ratio read
#      same-SF priors).
# Corpora: /tmp/sf1 /tmp/sf2 persist from r14; sf5/skewdoc* built here
# (ScaleUp/SkewUp are deterministic).
set -e
cd /root/repo

test -d /tmp/sf1 || sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10"
test -d /tmp/sf2 || sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf2 20"
test -d /tmp/sf5 || sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf5 50"
test -d /tmp/skewdoc01 || sbt -batch "runMain graft.tools.SkewUp /root/testdata/sf0.1 /tmp/skewdoc01"
test -d /tmp/skewdoc1 || sbt -batch "runMain graft.tools.SkewUp /tmp/sf1 /tmp/skewdoc1"

# 1a. round-15 queries (+ the r14 audio gap + touched pack family) at sf1
NEW15='^(mm_framehash_dedup|mm_audio_fingerprint|curation_pack_delta|curation_pack_bins)$'
sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/r15_verify_sf1 \"$NEW15\"" \
  > /tmp/r15_vsf1.log 2>&1
python3 tools/check_oracle.py /tmp/sf1 /tmp/r15_verify_sf1 "$NEW15" \
  > /tmp/r15_oracle_sf1.log 2>&1
tail -1 /tmp/r15_oracle_sf1.log

# 1b. sf2 spot for the same set
sbt -batch "runMain graft.Verify /tmp/sf2 /tmp/r15_verify_sf2 \"$NEW15\"" \
  > /tmp/r15_vsf2.log 2>&1
python3 tools/check_oracle.py /tmp/sf2 /tmp/r15_verify_sf2 "$NEW15" \
  > /tmp/r15_oracle_sf2.log 2>&1
tail -1 /tmp/r15_oracle_sf2.log

# 2a. hot-template doc skew, sf0.1-based: full pair-family sweep
FAM='^(dedup_|text_|curation_|mm_|cdc_recuration_delta)'
sbt -batch "runMain graft.Verify /tmp/skewdoc01 /tmp/r15_verify_skewdoc \"$FAM\"" \
  > /tmp/r15_vskewdoc.log 2>&1
python3 tools/check_oracle.py /tmp/skewdoc01 /tmp/r15_verify_skewdoc "$FAM" \
  > /tmp/r15_oracle_skewdoc.log 2>&1
tail -1 /tmp/r15_oracle_skewdoc.log

# 2b. sf1-based doc skew (the df-cap crossing): dedup + mm families
DFAM='^(dedup_|mm_phash_dedup|mm_phash_components|curation_dup_inflation)'
sbt -batch "runMain graft.Verify /tmp/skewdoc1 /tmp/r15_verify_skewdoc1 \"$DFAM\"" \
  > /tmp/r15_vskewdoc1.log 2>&1
python3 tools/check_oracle.py /tmp/skewdoc1 /tmp/r15_verify_skewdoc1 "$DFAM" \
  > /tmp/r15_oracle_skewdoc1.log 2>&1
tail -1 /tmp/r15_oracle_skewdoc1.log

# 2c. name what the caps dropped (appends records/skewdoc.jsonl)
sbt -batch "runMain graft.tools.SkewDocStudy /tmp/skewdoc01" 2>/dev/null | grep '"metric"'
sbt -batch "runMain graft.tools.SkewDocStudy /tmp/skewdoc1" 2>/dev/null | grep '"metric"'

# 3. sf5 (500x) spot tier: the 5 heaviest-output queries
SF5='^(mm_phash_dedup|dedup_edit_distance|dedup_edit_topk|dedup_embedding_cosine|text_rouge_pairs)$'
sbt -batch "runMain graft.Verify /tmp/sf5 /tmp/r15_verify_sf5 \"$SF5\"" \
  > /tmp/r15_vsf5.log 2>&1
python3 tools/check_oracle.py /tmp/sf5 /tmp/r15_verify_sf5 "$SF5" \
  > /tmp/r15_oracle_sf5.log 2>&1
tail -1 /tmp/r15_oracle_sf5.log

# 4. scale bench records (same-SF prior swapped in for vs_prior)
cp bench_sf1.json bench_last.json
SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt -batch "runMain graft.Bench" \
  > /tmp/r15_bench_sf1.log 2>&1 || true
cp bench_last.json bench_sf1.json
cp bench_sf2.json bench_last.json
SPARK_GRAFT_SF_DIR=/tmp/sf2 sbt -batch "runMain graft.Bench" \
  > /tmp/r15_bench_sf2.log 2>&1 || true
cp bench_last.json bench_sf2.json
git checkout bench_last.json

echo DONE_R15_MEASURE
