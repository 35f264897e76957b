#!/usr/bin/env bash
# Canonical training flag set (reference train.sh parity). Out of the box
# this trains on the committed-schema demo fixtures (auto-generated below);
# point the *_data_path / --token_emb_path flags at your real pkls for real
# runs, and add:
#   --gpt2_ckpt ./pretrained/GPT2_lyrics_ckpt_epoch00.ckpt
# to initialize the decoder from a phase-1 checkpoint (reference
# model.py:345-354; produce one with `python -m mmtg_tpu.pretrain`).
set -euo pipefail
cd "$(dirname "$0")/.."

[ -f ./data/train_data_with_ratings.pkl ] && [ -f ./vocab/token_id2emb_dict.pkl ] \
    || python scripts/make_fixtures.py

python -m mmtg_tpu.train \
    --batch_size 32 \
    --val_batch_size 32 \
    --epochs 5 \
    --lr 1e-05 \
    --curriculums "[1,3]" \
    --seed 42 \
    --log_interval 100 \
    --val_interval_ratio 0.2 \
    --train_data_path ./data/train_data_with_ratings.pkl \
    --val_data_path ./data/val_data_with_ratings.pkl \
    --vocab_path ./vocab/vocab.txt \
    --token_emb_path ./vocab/token_id2emb_dict.pkl \
    --save_path ./models/debug \
    --log_path ./logs/debug.log \
    --alpha 0.2 \
    --save_model
