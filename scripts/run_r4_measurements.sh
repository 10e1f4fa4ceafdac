#!/bin/bash
# Round-4 measurement sweep (VERDICT items 5, 6, 7, 9), serialized on the
# one tunneled chip.  Each stage logs to logs/ and is individually
# timeout-guarded so one hang cannot eat the round.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

# item 5: text-encode stage throughput (pure-JAX DistilBERT, ST shape)
timeout 3000 python scripts/bench_text_encode.py \
  2>&1 | tee logs/r4_text_encode.log

# item 7: minibatch step breakdown, offline_all2 vs WN18RR
timeout 3000 python scripts/profile_minibatch.py --mix offline_all2 \
  2>&1 | tee logs/r4_profile_all2.log
timeout 3000 python scripts/profile_minibatch.py --mix WN18RR \
  2>&1 | tee logs/r4_profile_wn.log

# item 6: chempcba-scale synthetic graph-task e2e (400K molecules)
timeout 5400 python scripts/bench_graph_scale.py --num_graphs 400000 \
  --epochs 2 2>&1 | tee logs/r4_graph_scale.log

# item 9: arxiv-scale OOD sweep on the fused layouts (degree-shift already
# ran at this scale in r3; these are the remaining four)
OOD_ARGS="--finetune_dataset arxiv_synthetic --runs 2 --finetune_epochs 80 \
  --early_stop 40 --normalize batch"
timeout 4500 python scripts/homophily_shift_ood.py $OOD_ARGS \
  2>&1 | tee logs/r4_ood_homophily.log
timeout 4500 python scripts/missing_feature.py $OOD_ARGS \
  2>&1 | tee logs/r4_ood_missing.log
timeout 4500 python scripts/random_edge_drop.py $OOD_ARGS \
  2>&1 | tee logs/r4_ood_edgedrop.log
timeout 5400 python scripts/tri_objective.py $OOD_ARGS \
  2>&1 | tee logs/r4_ood_tri.log

echo R4_MEASUREMENTS_DONE
