#!/bin/bash
# Round-13 at-scale measurement chain (r12 VERDICT tasks 1 + 3):
#   1. FULL-registry oracle sweep at sf1 (100x the driver gate) — the
#      first complete sf1 tier including the quadratic-oracle pair
#      family (r10 covered 286 queries; r12 took the pair family to
#      sf0.5 + its 5 heaviest members to sf1; this run covers EVERY
#      registered query at sf1 on the round-13 tree).
#   2. Skew-robustness study: hot-keyed corpus via SkewUp, the
#      AQE-split / salted / broadcast / bucketed measurement, and the
#      q46/q84/cdc oracle family re-verified on the skewed corpus.
# Queries registered after the sf1 Verify ran (curation_pack_bins,
# sim_sq8_rerank, sim_sq8_tuning) were verified at sf1 by filtered
# runs (r13_v5/v8/v11) — see SURVEY §6.1.
set -e
cd /root/repo

# corpora (≈25 min total on this box)
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10"
sbt -batch "runMain graft.tools.SkewUp /tmp/sf1 /tmp/skew1"
test -d /tmp/sf1 && test -d /tmp/skew1

# 1. sf1 FULL registry
sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/r13_verify_sf1" \
  > /tmp/r13_verify_sf1.log 2>&1
python3 tools/check_oracle.py /tmp/sf1 /tmp/r13_verify_sf1 \
  > /tmp/r13_oracle_sf1.log 2>&1
tail -1 /tmp/r13_oracle_sf1.log

# 2. skew study + oracle family on the skewed corpus
sbt -batch "runMain graft.tools.SkewStudy /tmp/skew1" \
  > /tmp/r13_skewstudy.log 2>&1
tail -1 /tmp/r13_skewstudy.log
SKEW_FAMILY='^(q46_salted_join|q84_bucketed_join|cdc_.*)$'
sbt -batch "runMain graft.Verify /tmp/skew1 /tmp/r13_verify_skew \"$SKEW_FAMILY\"" \
  > /tmp/r13_vskew.log 2>&1
python3 tools/check_oracle.py /tmp/skew1 /tmp/r13_verify_skew "$SKEW_FAMILY"

echo DONE_R13_MEASURE
