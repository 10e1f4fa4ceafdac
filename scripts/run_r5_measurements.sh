#!/bin/bash
# Round-5 chip measurements (run stages individually or all; each stage is
# timeout-wrapped and independent — never kill by pattern, docs/wedge.md):
#   A. graph-task eval cost: f32 vs --eval_bf16 at 400K molecules (item 6)
#   B. halo-vs-plain arxiv finetune with the on-device metrics path (item 7)
#   C. arxiv-scale halo pretrain + transfer (item 8)
#   D. perturbation-sensitive OOD sweeps at 169K nodes (item 5)
#   E. bench rerun + hub sweep (item 3)
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

# ---- A: graph-scale eval (the per-epoch 3-split AUC pass is the
# compute-bound stage, BASELINE r4)
time timeout 2000 python scripts/bench_graph_scale.py --epochs 2 \
  2>&1 | tee logs/r5_graph_scale_f32.log
time timeout 2000 python scripts/bench_graph_scale.py --epochs 2 \
  --eval_bf16 1 2>&1 | tee logs/r5_graph_scale_bf16.log

# ---- B: halo S=1 vs plain at arxiv scale (40 epochs, same protocol as r4)
time timeout 2400 python finetune.py --finetune_dataset arxiv_synthetic \
  --epochs 40 --early_stop 40 --repeat 1 --debug --normalize batch \
  2>&1 | tee logs/r5_plain_arxiv.log
time timeout 2400 python finetune.py --finetune_dataset arxiv_synthetic \
  --epochs 40 --early_stop 40 --repeat 1 --debug --normalize batch \
  --halo_shards 1 2>&1 | tee logs/r5_halo1_arxiv.log
time timeout 2400 python finetune.py --finetune_dataset arxiv_synthetic \
  --epochs 40 --early_stop 40 --repeat 1 --debug --normalize batch \
  --halo_shards 1 --eval_every 4 2>&1 | tee logs/r5_halo1_arxiv_ee4.log

# ---- C: arxiv-scale full-graph halo pretrain (169K nodes) + transfer
time timeout 3000 python pretrain.py --pretrain_dataset arxiv_synthetic \
  --halo_shards 1 --epochs 10 --pretrain_run_id r5arxivhalo --debug \
  2>&1 | tee logs/r5_arxiv_halo_pt.log
time timeout 2400 python finetune.py --finetune_dataset arxiv_synthetic \
  --pretrain_run_id r5arxivhalo --pretrain_dataset arxiv_synthetic \
  --pretrain_model_epoch 10 --epochs 40 --early_stop 40 --repeat 1 \
  --debug --normalize batch 2>&1 | tee logs/r5_arxiv_halo_transfer.log

# ---- D: informative OOD sweeps (fragile generator, 169K nodes) — p swept
# for the monotone-sensitivity evidence (r4 VERDICT item 5)
for p in 0.4 0.8; do
  time timeout 2400 python scripts/missing_feature.py \
    --dataset arxiv_synthetic_fragile --runs 2 --finetune_epochs 80 \
    --early_stop 80 --missing_prob $p --debug \
    2>&1 | tee logs/r5_ood_fragile_missing_p$p.log
done
for p in 0.2 0.5; do
  time timeout 2400 python scripts/random_edge_drop.py \
    --dataset arxiv_synthetic_fragile --runs 2 --finetune_epochs 80 \
    --early_stop 80 --drop_prob $p --perturb all --debug \
    2>&1 | tee logs/r5_ood_fragile_edgedrop_p$p.log
done
for s in homophily_shift_ood tri_objective; do
  time timeout 2400 python scripts/$s.py \
    --dataset arxiv_synthetic_fragile --runs 2 --finetune_epochs 80 \
    --early_stop 80 --debug 2>&1 | tee logs/r5_ood_fragile_$s.log
done

# ---- E: bench rerun + post-drop_hash hub sweep
time timeout 2400 python bench.py 2>&1 | tee logs/r5_bench_rerun.log
time timeout 2400 python scripts/sweep_hub.py 2>&1 | tee logs/r5_sweep_hub.log

echo R5_MEASUREMENTS_DONE
