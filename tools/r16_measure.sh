#!/bin/bash
# Round-16 at-scale measurement chain (r15 VERDICT tasks 1, 2, 3, 8 +
# the new-query standing gates):
#   1. Task 1 tail: the sf5 (500x) tier extended from the 5 heaviest-
#      output queries to the 10 heaviest (adds the window/decimal/try
#      family's largest outputs), full DuckDB oracle compare at /tmp/sf5;
#      AggAudit re-run over the FINAL 322-query registry so the committed
#      summary row covers the two round-16 additions.
#   2. New/touched queries at sf1 AND sf2: dedup_dfcap_report,
#      mm_ebml_framehash (new), mm_framehash_dedup (GifFrames single-walk
#      refactor), mm_ebml_tree (EbmlTree.scala gained the stats walker;
#      existing path additive but re-proven anyway).
#   3. Task 2: TwsBench quiet-box re-run, min-of-N appended to committed
#      records/twsbench.jsonl with round=r16; SURVEY 6.5 narrates the
#      committed number.
#   4. Task 3: ScalePair for the two un-adjudicated >2x sf2/sf1 ratios
#      (q109_cramers_v_corrected, sim_rocchio_prf) -> records/scalepair.jsonl;
#      quiet-box sf2 bench re-record (and sf1 for the same-tree pair) so the
#      committed record is not the round's slowest reading.
# Corpora: /tmp/sf1 /tmp/sf2 /tmp/sf5 persist from r14/r15 (ScaleUp is
# deterministic; rebuild lines below if evicted).
set -e
cd /root/repo
export GRAFT_ROUND=r16

test -d /tmp/sf1 || sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10"
test -d /tmp/sf2 || sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf2 20"
test -d /tmp/sf5 || sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf5 50"

# 1a. sf5 tier, 10 heaviest-output queries (5 from r15 + 5 next-largest)
SF5='^(mm_phash_dedup|dedup_edit_distance|dedup_edit_topk|dedup_embedding_cosine|text_rouge_pairs|q09_window_analytic|q35_range_frame|q44_moving_window|q54_decimal_math|q64_try_arith)$'
sbt -batch "runMain graft.Verify /tmp/sf5 /tmp/verify_sf5 \"$SF5\"" \
  > /tmp/verify_sf5.log 2>&1
python3 tools/check_oracle.py /tmp/sf5 /tmp/verify_sf5 "$SF5" \
  > /tmp/oracle_sf5.log 2>&1
tail -1 /tmp/oracle_sf5.log

# 1b. AggAudit over the final registry (appends records/aggaudit.jsonl)
sbt -batch "runMain graft.tools.AggAudit /root/testdata/sf0.01" 2>/dev/null | grep '"metric"' || true

# 2. new/touched queries at sf1 and sf2
NEW16='^(dedup_dfcap_report|mm_ebml_framehash|mm_framehash_dedup|mm_ebml_tree)$'
sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/r16_nq_sf1 \"$NEW16\"" \
  > /tmp/r16_nq_sf1.log 2>&1
python3 tools/check_oracle.py /tmp/sf1 /tmp/r16_nq_sf1 "$NEW16" \
  > /tmp/r16_oracle_sf1.log 2>&1
tail -1 /tmp/r16_oracle_sf1.log
sbt -batch "runMain graft.Verify /tmp/sf2 /tmp/r16_nq_sf2 \"$NEW16\"" \
  > /tmp/r16_nq_sf2.log 2>&1
python3 tools/check_oracle.py /tmp/sf2 /tmp/r16_nq_sf2 "$NEW16" \
  > /tmp/r16_oracle_sf2.log 2>&1
tail -1 /tmp/r16_oracle_sf2.log

# 3. TwsBench quiet-box min-of-N (3 runs; ScalePair.append stamps round)
for i in 1 2 3; do
  sbt -batch "runMain graft.tools.TwsBench" 2>/dev/null | grep '"metric"'
done

# 4a. the two un-adjudicated >2x scalers
sbt -batch "runMain graft.tools.ScalePair q109_cramers_v_corrected /tmp/sf1 /tmp/sf2" 2>/dev/null | grep '"metric"'
sbt -batch "runMain graft.tools.ScalePair sim_rocchio_prf /tmp/sf1 /tmp/sf2" 2>/dev/null | grep '"metric"'

# 4b. quiet-box scale bench re-records (same-SF prior swapped in)
cp bench_sf1.json bench_last.json
SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt -batch "runMain graft.Bench" \
  > /tmp/r16_bench_sf1.log 2>&1 || true
cp bench_last.json bench_sf1.json
cp bench_sf2.json bench_last.json
SPARK_GRAFT_SF_DIR=/tmp/sf2 sbt -batch "runMain graft.Bench" \
  > /tmp/r16_bench_sf2.log 2>&1 || true
cp bench_last.json bench_sf2.json
git checkout bench_last.json

echo DONE_R16_MEASURE
