#!/bin/bash
# Round-14 at-scale measurement chain (r13 VERDICT tasks 1, 5, 6, 7):
#   1. New/touched queries verified at sf1 (the 100x gate tier stays
#      complete as the registry grows 314 -> 317).
#   2. Task 5: skew-corpus correctness broadened from the 16-query
#      join family to the window / as-of / funnel / rank families that
#      also reshuffle by the skewed keys.
#   3. Task 6: sf2 (200x) spot oracle tier for the heaviest-output
#      queries (pair dumps, quadratic oracles, top stats) + the new
#      round-14 queries.
#   4. Task 7: text_repetition sf1/sf2 adjudicated by a same-session
#      read (tools/ScalePair - the r12 sim_topk_cosine procedure).
# Corpora: /tmp/sf1 /tmp/sf2 /tmp/skew1 (r13 chain; rebuilt here only
# if absent - ScaleUp/SkewUp are deterministic).
set -e
cd /root/repo

test -d /tmp/sf1 || sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10"
test -d /tmp/sf2 || sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf2 20"
test -d /tmp/skew1 || sbt -batch "runMain graft.tools.SkewUp /tmp/sf1 /tmp/skew1"

# 1. round-14 queries (+ touched shared-build consumers) at sf1
NEW14='^(mm_phash_dedup|mm_phash_components|mm_phash_rescale|cdc_recuration_delta|dedup_embedding_cosine|curation_pack_bins)$'
sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/r14_verify_sf1 \"$NEW14\"" \
  > /tmp/r14_vsf1.log 2>&1
python3 tools/check_oracle.py /tmp/sf1 /tmp/r14_verify_sf1 "$NEW14" \
  > /tmp/r14_oracle_sf1.log 2>&1
tail -1 /tmp/r14_oracle_sf1.log

# 2. task 5: widened skew-corpus family (windows/as-of/funnel/rank + cdc)
SKEW_FAM='^(q08_topk_per_group|q09_window_analytic|q10_rank_family|q20_time_bucket|q22_asof_join|q29_session_window|q32_window_distribution|q44_moving_window|q46_salted_join|q66_funnel|q73_hopping_windows|q83_rank_with_ties|q84_bucketed_join|q89_window_funnel|q145_window_funnel_strict|q151_skyline|cdc_.*)$'
sbt -batch "runMain graft.Verify /tmp/skew1 /tmp/r14_verify_skew \"$SKEW_FAM\"" \
  > /tmp/r14_vskew.log 2>&1
python3 tools/check_oracle.py /tmp/skew1 /tmp/r14_verify_skew "$SKEW_FAM" \
  > /tmp/r14_oracle_skew.log 2>&1
tail -1 /tmp/r14_oracle_skew.log

# 3. task 6: sf2 spot tier - heaviest-output + new queries
SF2_SPOT='^(dedup_edit_distance|dedup_edit_topk|dedup_embedding_cosine|dedup_components|dedup_keep_canonical|text_rouge_pairs|curation_pack_bins|curation_token_budget|q163_anova_f|q164_kendall_tau|q169_price_elasticity|mm_phash_dedup|mm_phash_components|cdc_recuration_delta)$'
sbt -batch "runMain graft.Verify /tmp/sf2 /tmp/r14_verify_sf2 \"$SF2_SPOT\"" \
  > /tmp/r14_vsf2.log 2>&1
python3 tools/check_oracle.py /tmp/sf2 /tmp/r14_verify_sf2 "$SF2_SPOT" \
  > /tmp/r14_oracle_sf2.log 2>&1
tail -1 /tmp/r14_oracle_sf2.log

# 4. task 7: text_repetition sf1/sf2 same-session adjudication
sbt -batch "runMain graft.tools.ScalePair text_repetition /tmp/sf1 /tmp/sf2" \
  2>/dev/null | grep '"metric"' | tee /tmp/r14_scalepair.json

echo DONE_R14_MEASURE
