#!/bin/bash
# offline_all2 mix (VERDICT r2 item 5): cora_synthetic + kg_synthetic +
# WN18RR + FB15K237 at reference weights, through BOTH pretrain paths
# (sampled minibatch and --halo_shards full-graph), then transfer
# finetunes to both KG datasets from each checkpoint (3 repeats for the
# transfer check; the 10-repeat faithful rows come from run_kg_faithful).
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
python pretrain.py --pretrain_dataset offline_all2 --text_encoder tfidf \
  --epochs 50 --pretrain_run_id r3mix --debug 2>&1 | tee logs/r3_mix_pt.log
python pretrain.py --pretrain_dataset offline_all2 --text_encoder tfidf \
  --epochs 25 --halo_shards 1 --pretrain_run_id r3mixhalo --debug \
  2>&1 | tee logs/r3_mixhalo_pt.log
for ds in WN18RR FB15K237; do
  for run in r3mix r3mixhalo; do
    ep=50; [ "$run" = r3mixhalo ] && ep=25
    python finetune.py --finetune_dataset $ds --text_encoder tfidf \
      --pretrain_run_id $run --pretrain_dataset offline_all2 \
      --pretrain_model_epoch $ep --batch_size 512 --epochs 15 \
      --early_stop 10 --repeat 3 --donate --debug \
      2>&1 | tee logs/r3_${run}_${ds}_ft.log
  done
done
echo ALL2_DONE
