"""Merge a regenerated eval.json back into a RESULTS_*.json family row.

Eval-only refresh (r4): the area-binned AP/AR metrics landed after some
v2 rows were produced, so those rows were re-evaluated from their
checkpoints; this keeps the training provenance fields (train_steps,
train_min, backbone, recipe, run_dir) from the existing row and replaces
the metric fields with the regenerated summary.

Usage: python benchmarks/merge_eval_into_results.py RESULTS.json family eval.json
"""
import json
import sys

KEEP = ("train_steps", "train_min", "backbone", "recipe", "run_dir")


def main(results_path, family, eval_path):
    with open(results_path) as f:
        results = json.load(f)
    with open(eval_path) as f:
        summary = json.load(f)
    old = results.get(family, {})
    for k in KEEP:
        if k in old:
            summary[k] = old[k]
    results[family] = summary
    with open(results_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"merged {family}: mAP@0.5={summary.get('mAP@0.5')}, "
          f"AP_small={summary.get('AP_small')}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
