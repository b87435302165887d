#!/bin/bash
# Round-12 at-scale oracle sweep: closes the r10/r11 gap — the ~20
# quadratic-oracle pair-family queries had no oracle evidence above
# sf0.1 (excluded from the r10 sf1 sweep on DuckDB cost). Route chosen
# per r11 VERDICT task 1: intermediate SFs via ScaleUp.
#   sf0.3 — FULL registry (every query, including all previously
#           excluded ones, at 30x the driver gate / 3x their prior max)
#   sf0.5 — the pair family only (5x their prior max)
# Corpora: sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf03 3"
#          sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf05 5"
set -ex
cd /root/repo
# fail fast if the manually-built corpora are absent (a missing ScaleUp
# run must not let a failed sweep print DONE): r12 ADVICE hardening
test -d /tmp/sf03 && test -d /tmp/sf05

# the pair family: every oracle built on the posting self-join
# (ex a JOIN ex b ON a.shingle = b.shingle) or a vector/prefix pair
# enumeration, plus the two text consumers of the pair relation
PAIR_FAMILY='^(dedup_cluster_size_hist|dedup_components|dedup_containment|dedup_containment_asym|dedup_dfcap_binding|dedup_edit_distance|dedup_edit_topk|dedup_embedding_cosine|dedup_incremental|dedup_inflation|dedup_keep_canonical|dedup_lsh_tuning|dedup_minhash_estimate|dedup_minhash_lsh|dedup_ngram_jaccard|dedup_prefix_trunc|dedup_semantic|dedup_simhash|dedup_source_overlap|dedup_split_assign|dedup_threshold_curve|text_rouge_pairs|text_keep_list)$'

# 1. sf0.3 FULL registry
sbt -batch "runMain graft.Verify /tmp/sf03 /tmp/r12_verify_sf03" > /tmp/r12_verify03.log 2>&1
python3 tools/check_oracle.py /tmp/sf03 /tmp/r12_verify_sf03 > /tmp/r12_oracle03.log 2>&1
tail -1 /tmp/r12_oracle03.log

# 2. sf0.5 pair family
sbt -batch "runMain graft.Verify /tmp/sf05 /tmp/r12_verify_sf05 \"$PAIR_FAMILY\"" > /tmp/r12_verify05.log 2>&1
python3 tools/check_oracle.py /tmp/sf05 /tmp/r12_verify_sf05 "$PAIR_FAMILY" > /tmp/r12_oracle05.log 2>&1
tail -1 /tmp/r12_oracle05.log

echo DONE_R12_MEASURE
