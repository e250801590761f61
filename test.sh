#!/bin/bash
# Evaluation recipe (reference code/test.sh parity): label propagation on
# DAVIS-2017 -> palette conversion -> J&F. Eval config of record: topk 10,
# videoLen 20, radius 12, temperature 0.05, cropSize -1
# (reference code/test.sh:21-32).

DAVIS=${DAVIS:-/data/DAVIS}
CKPT=${CKPT:-checkpoints/latest/checkpoint.pth}
OUT=${OUT:-results}
VALLIST=${VALLIST:-davis_vallist.txt}

python -m videowalk_tpu.eval.make_davis_vallist --davis "$DAVIS" \
  --out "$VALLIST"

python test.py \
  --filelist "$VALLIST" \
  --model-type scratch \
  --resume "$CKPT" \
  --save-path "$OUT" \
  --topk 10 --videoLen 20 --radius 12 --temperature 0.05 --cropSize -1 \
  "$@"

python -m videowalk_tpu.eval.convert_davis \
  -i "$OUT" -o "${OUT}_converted" -d "$DAVIS"

python -m videowalk_tpu.eval.davis_metrics \
  --results "${OUT}_converted" --davis "$DAVIS"
