#!/usr/bin/env bash
# Canonical training flag set (reference train.sh parity; paths are yours).
set -euo pipefail

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
    --gpt2_ckpt ./pretrained/GPT2_lyrics_ckpt_epoch00.ckpt \
    --save_path ./models/debug \
    --log_path ./logs/debug.log \
    --alpha 0.2 \
    --save_model
