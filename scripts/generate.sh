#!/usr/bin/env bash
# Canonical generation flag set (reference generate.sh parity — including
# the line-continuation its line 15 forgot). Out of the box this decodes
# the demo fixtures with the ./models/debug checkpoint train.sh writes;
# point --data_path / --model_path at your real test pkl + checkpoint.
set -euo pipefail
cd "$(dirname "$0")/.."

[ -f ./data/final_test.pkl ] && [ -f ./vocab/token_id2emb_dict.pkl ] \
    || python scripts/make_fixtures.py
# no checkpoint yet? bootstrap one from the demo fixtures
[ -d ./models/debug ] || bash scripts/train.sh

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
