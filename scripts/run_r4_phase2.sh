#!/bin/bash
# Round-4 phase-2 chip measurements (after run_r4_measurements.sh):
#   * single-kernel LocSplit vs two-launch (r3 VERDICT item 4 Done gate)
#   * text-encode stage throughput (item 5; stage failed in phase 1 on a
#     sys.path bug, fixed)
#   * halo-vs-plain single-chip overhead (r3 VERDICT weak item 6)
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

timeout 4200 python scripts/bench_gwin.py --locsplit \
  2>&1 | tee logs/r4_gwin_locsplit.log

timeout 3000 python scripts/bench_text_encode.py \
  2>&1 | tee logs/r4_text_encode.log

# halo (1x1 mesh, fused kernels + all_to_all plumbing) vs plain single-chip
# full-batch on the same 169K-node graph: the per-epoch overhead of the
# scale-out configuration at S=1
time timeout 2400 python finetune.py --finetune_dataset arxiv_synthetic \
  --epochs 40 --early_stop 40 --repeat 1 --debug --normalize batch \
  2>&1 | tee logs/r4_plain_arxiv.log
time timeout 2400 python finetune.py --finetune_dataset arxiv_synthetic \
  --epochs 40 --early_stop 40 --repeat 1 --debug --normalize batch \
  --halo_shards 1 2>&1 | tee logs/r4_halo1_arxiv.log

echo R4_PHASE2_DONE
