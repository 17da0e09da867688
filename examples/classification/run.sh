#!/usr/bin/env bash
# ChunkFormer-TPU speech classification recipe
# (reference: examples/classification/run.sh 7-stage pipeline, adapted to
# our CLIs). Data lists are JSONL lines with "key"/"wav" plus one
# "label_<task>" integer column per task (e.g. label_gender, label_emotion).
set -euo pipefail

stage=${stage:-0}
stop_stage=${stop_stage:-5}
data=${data:-data}
exp=${exp:-exp/chunkformer-classification}
config=${config:-conf/multi_task.yaml}
train_tsv=${train_tsv:-$data/train.tsv}
avg_num=${avg_num:-5}

cd "$(dirname "$0")"
export PYTHONPATH=$(git rev-parse --show-toplevel 2>/dev/null || echo ../..):${PYTHONPATH:-}

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "stage 0: tsv -> data lists"
  python ../../tools/tsv_to_list.py "$train_tsv" "$data/all.list"
  python ../../tools/split_train_test.py "$data/all.list" \
    --train "$data/train.list" --dev "$data/dev.list" --test "$data/internal_test.list"
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: global CMVN stats"
  mkdir -p "$data/train"
  python ../../tools/compute_cmvn_stats.py \
    --in_list "$data/train.list" --out_cmvn "$data/train/global_cmvn"
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: label statistics + validation"
  python ../../tools/compute_label_stats.py \
    "$data/train.list" --out "$data/train/label_stats.json"
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: train multi-task classification heads"
  python -m chunkformer_tpu.bin.train \
    --config "$config" \
    --train_data "$data/train.list" --cv_data "$data/dev.list" \
    --model_dir "$exp" \
    --override_config "cmvn_conf.cmvn_file $data/train/global_cmvn"
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "stage 4: export for inference"
  python - "$exp" "$avg_num" <<'EOF'
import json, os, sys, yaml
from chunkformer_tpu.export import export_model_dir
from chunkformer_tpu.train.checkpoint import load_checkpoint
exp, avg = sys.argv[1], sys.argv[2]
tag = f"avg_{avg}" if os.path.exists(f"{exp}/avg_{avg}") else \
    sorted(t for t in os.listdir(exp) if t.startswith("epoch_") and
           os.path.isdir(f"{exp}/{t}"))[-1]
params, _, _ = load_checkpoint(exp, tag)
with open(f"{exp}/train.yaml") as f:
    cfg = yaml.safe_load(f)
tasks = cfg.get("model_conf", {}).get("tasks", {})
label_mapping = {t: {str(i): i for i in range(n)} for t, n in tasks.items()}
export_model_dir(f"{exp}/export", cfg, params, label_mapping=label_mapping)
print("exported", tag, "to", f"{exp}/export")
EOF
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "stage 5: classify + metrics"
  python -m chunkformer_tpu.bin.classify \
    --model_checkpoint "$exp/export" \
    --test_data "$data/internal_test.list" \
    --output_file "$exp/predictions.tsv" --format tsv
  python ../../tools/compute_classification_metrics.py \
    --hyp "$exp/predictions.tsv" \
    --ref "$data/internal_test.list" || true
fi
