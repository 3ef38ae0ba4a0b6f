"""Merge per-object BOP19 result CSVs into one method-level CSV.

Parity target: the reference's SISO workflow trains/evaluates one model per
object and merges the per-object result files before BOP scoring
(core/gdrn_modeling/tools/merge_bop_single_obj_results.py role). Rows are
concatenated and re-sorted by (scene_id, im_id, obj_id); duplicate
(scene, im, obj) entries keep the higher-score row.

Usage: python tools/merge_bop_results.py out.csv in1.csv in2.csv ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def merge(paths: list[str]) -> list[dict]:
    from self6dpp_tpu.engine.evaluator import load_bop_csv

    best: dict[tuple, dict] = {}
    for p in paths:
        for row in load_bop_csv(p):
            key = (row["scene_id"], row["im_id"], row["obj_id"])
            if key not in best or row["score"] > best[key]["score"]:
                best[key] = row
    return sorted(best.values(),
                  key=lambda r: (r["scene_id"], r["im_id"], r["obj_id"]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("inputs", nargs="+")
    a = ap.parse_args()
    rows = merge(a.inputs)

    from self6dpp_tpu.engine.evaluator import save_bop_csv
    save_bop_csv(a.out, rows)
    print(f"merged {len(a.inputs)} files -> {a.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
