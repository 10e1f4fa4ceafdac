#!/bin/bash
# Reference-faithful KG runs (VERDICT r2 item 4): pretrain 50 epochs per
# dataset, then finetune with the reference presets (--use_params:
# WN18RR full-batch 1000 epochs/ES 200/lr 1e-3; FB15K237 minibatch 1024,
# 3000 epochs/ES 200/lr 5e-4), 10 repeats.  Run AFTER bench.py (serialize
# TPU clients).  Logs to logs/.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
python pretrain.py --pretrain_dataset WN18RR --text_encoder tfidf \
  --epochs 50 --pretrain_run_id r3wn --debug 2>&1 | tee logs/r3_wn_pt.log
python finetune.py --use_params --finetune_dataset WN18RR \
  --text_encoder tfidf --pretrain_run_id r3wn --pretrain_dataset WN18RR \
  --pretrain_model_epoch 50 --repeat 10 --donate --debug \
  2>&1 | tee logs/r3_wn_ft.log
python pretrain.py --pretrain_dataset FB15K237 --text_encoder tfidf \
  --epochs 50 --pretrain_run_id r3fb --debug 2>&1 | tee logs/r3_fb_pt.log
python finetune.py --use_params --finetune_dataset FB15K237 \
  --text_encoder tfidf --pretrain_run_id r3fb --pretrain_dataset FB15K237 \
  --pretrain_model_epoch 50 --repeat 10 --donate --debug \
  2>&1 | tee logs/r3_fb_ft.log
