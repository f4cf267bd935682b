#!/bin/bash
# Round-5 queue RESUME 2 (the 13:xx session died mid-item-3, during the
# fcos_center pretrain-ft arm — step 1000/4000, ckpt/1000 intact). This
# script resumes item 3 with --resume and runs items 4-8 from
# queue_resume.sh unchanged. Status rows append to the same
# queue_status.tsv.
set -u
cd /root/repo
R5=benchmarks/r5
STATUS=$R5/queue_status.tsv
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/detectax_tpu_cache
PRETRAIN=benchmarks/runs/pretrain_mbv2/backbone.msgpack

note() { echo "[queue $(date +%H:%M:%S)] $*"; }
record() { echo -e "$1\t$2\t$(date +%H:%M:%S)" >> "$STATUS"; note "item $1 rc=$2"; }

# --- 3 tail: fcos_center pretrain-ft A/B arm on v1 (resume from 1000) -----
FC_FT=benchmarks/runs/fcos_center_ft
timeout 3600 python -u -m detectax.cli.train_fcos_center_voc \
    --dataset detbench --max_steps 4000 --backbone mobilenetv2 \
    --ckpt_dir $FC_FT/ckpt --out_dir $FC_FT/out \
    --display_step 100 --step_save 1000 --resume \
    --canvas 384 --optimizer sgd --init_lr 0.001 --lr_boundary 3000 \
    --warmup_steps 100 --grad_clip 16 --loss_norm pos \
    --freeze_bn --init_backbone $PRETRAIN \
    --batch_size 16 --bf16 >> $FC_FT/log.txt 2>&1
rc=$?
if [ $rc -eq 0 ]; then
  timeout 1800 python -u -m detectax.cli.evaluate --family fcos_center \
      --dataset detbench --backbone mobilenetv2 --ckpt_dir $FC_FT/ckpt \
      --coco_metrics --out_json $FC_FT/eval.json >> $FC_FT/log.txt 2>&1
  rc=$?
fi
record "3_fcos_center_ft_ab" $rc

# --- decide the fcos_center recipe for the v2 row -------------------------
FC_V2_RECIPE=$(python - <<'EOF'
import json
try:
    ft = json.load(open("benchmarks/runs/fcos_center_ft/eval.json"))["mAP@0.5"]
except Exception:
    ft = -1.0
scratch = json.load(open("benchmarks/RESULTS_detbench_v1.json"))["fcos_center"]["mAP@0.5"]
print("ft" if ft > scratch else "scratch")
print(f"A/B: ft={ft:.4f} scratch={scratch:.4f}", file=__import__("sys").stderr)
EOF
)
note "fcos_center winning recipe: $FC_V2_RECIPE"
echo "$FC_V2_RECIPE" > $R5/fcos_center_winner.txt

# --- 4+5: centernet_s8 + stacked_hourglass v2 rows ------------------------
timeout 10800 python -u benchmarks/run_detbench.py --bench detbench_v2 \
    --families centernet_s8 stacked_hourglass > $R5/item4_5_v2_rows.log 2>&1
record "4_5_s8_stackedhg_v2" $?

# --- 6: stacked_hourglass on the dense-crowd split ------------------------
timeout 5400 python -u benchmarks/run_detbench.py --bench detbench_v2_crowd \
    --families stacked_hourglass > $R5/item6_stackedhg_crowd.log 2>&1
record "6_stackedhg_crowd" $?

# --- 7: fcos_center v2 row (winning recipe) -------------------------------
FC_V2=benchmarks/runs_v2/fcos_center
mkdir -p $FC_V2
FT_ARGS=""
if [ "$FC_V2_RECIPE" = "ft" ]; then
  FT_ARGS="--init_lr 0.001 --lr_boundary 3000 --warmup_steps 100 --freeze_bn --init_backbone $PRETRAIN"
else
  FT_ARGS="--init_lr 0.01 --warmup_steps 300"
fi
timeout 3600 python -u -m detectax.cli.train_fcos_center_voc \
    --dataset detbench_v2 --max_steps 4000 --backbone mobilenetv2 \
    --ckpt_dir $FC_V2/ckpt --out_dir $FC_V2/out \
    --display_step 100 --step_save 1000 \
    --canvas 384 --optimizer sgd --grad_clip 16 --loss_norm pos \
    $FT_ARGS --batch_size 16 --bf16 > $FC_V2/log.txt 2>&1
rc=$?
if [ $rc -eq 0 ]; then
  timeout 1800 python -u -m detectax.cli.evaluate --family fcos_center \
      --dataset detbench_v2 --backbone mobilenetv2 --ckpt_dir $FC_V2/ckpt \
      --coco_metrics --out_json $FC_V2/eval.json >> $FC_V2/log.txt 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    python benchmarks/merge_eval_into_results.py \
        benchmarks/RESULTS_detbench_v2.json fcos_center $FC_V2/eval.json \
        --allow_new >> $FC_V2/log.txt 2>&1
    rc=$?
    python - "$FC_V2_RECIPE" <<'EOF'
import json, sys
p = "benchmarks/RESULTS_detbench_v2.json"
d = json.load(open(p))
row = d.get("fcos_center", {})
row.update({"train_steps": 4000, "backbone": "mobilenetv2",
            "recipe": "pretrain-ft" if sys.argv[1] == "ft" else "from-scratch",
            "run_dir": "benchmarks/runs_v2/fcos_center"})
d["fcos_center"] = row
json.dump(d, open(p, "w"), indent=2)
EOF
  fi
fi
record "7_fcos_center_v2" $rc

# --- 8: per-anchor-heads RetinaNet trained to convergence on v1 -----------
PAH=benchmarks/runs/retinanet_pah
mkdir -p $PAH
timeout 4500 python -u -m detectax.cli.train_retinanet_coco \
    --dataset detbench --max_steps 4000 --backbone mobilenetv2 \
    --ckpt_dir $PAH/ckpt --out_dir $PAH/out \
    --display_step 100 --step_save 1000 \
    --canvas 512 --init_lr 0.01 --lr_boundaries 3000 \
    --loss_norm pos --warmup_steps 300 --grad_clip 16 \
    --per_anchor_heads --batch_size 16 --bf16 > $PAH/log.txt 2>&1
rc=$?
if [ $rc -eq 0 ]; then
  timeout 1800 python -u -m detectax.cli.evaluate --family retinanet \
      --dataset detbench --backbone mobilenetv2 --ckpt_dir $PAH/ckpt \
      --per_anchor_heads --coco_metrics --out_json $PAH/eval.json \
      >> $PAH/log.txt 2>&1
  rc=$?
fi
record "8_per_anchor_heads_v1" $rc

note "queue complete"
