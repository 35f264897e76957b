#!/usr/bin/env bash
# Canonical generation flag set (reference generate.sh parity — including
# the line-continuation its line 15 forgot).
set -euo pipefail

python -m mmtg_tpu.generate \
    --batch_size 32 \
    --seed 42 \
    --data_path ./data/final_test.pkl \
    --model_path ./models/debug \
    --tokenizer_path ./vocab/vocab.txt \
    --token_emb_path ./vocab/token_id2emb_dict.pkl \
    --temperature 1.1 \
    --topk 10 \
    --topp 0.7 \
    --repetition_penalty 1.5 \
    --n_samples 10 \
    --save_samples \
    --save_samples_path res/test.txt
