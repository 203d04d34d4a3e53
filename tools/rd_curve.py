"""Assemble the multi-rate RD curve artifact from per-checkpoint RD runs.

VERDICT r3 item 1: the reference's deliverable is a multi-rate RD
trade-off (its released checkpoints span rate points,
`/root/reference/README.md:8-14`). This collects `tools/rd_analysis.py`
outputs (one per trained β point) into one
`rd_results/rd_curve_<name>.json` with per-image columns and an explicit
held-out marker per image (the train==eval circularity caveat is carried
in the data, not a footnote).

Usage:
  python tools/rd_curve.py --name eps_beta_sweep \
      --points b0.001=runs/eps_b0.001/rd.json b0.0032=... \
      --held_out 3.png --note "..."
"""

from __future__ import annotations

import argparse
import json
import pathlib


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", required=True)
    p.add_argument("--points", nargs="+", required=True,
                   help="label=rd_analysis_json pairs, ordered by rate")
    p.add_argument("--held_out", nargs="*", default=[],
                   help="image names never seen in training for this point set")
    p.add_argument("--note", default="")
    p.add_argument("--out_dir", default="rd_results")
    args = p.parse_args()

    curve = {"name": args.name, "note": args.note,
             "held_out_images": args.held_out, "points": []}
    for pair in args.points:
        label, _, path = pair.partition("=")
        d = json.loads(pathlib.Path(path).read_text())
        point = {
            "label": label,
            "ckpt": d.get("ckpt"),
            "use_ema": d.get("use_ema"),
            "steps": d.get("steps"),
            "mean": d["mean"],
            "images": {
                r["image"]: {
                    "bpp": r["real_bpp"],
                    "psnr": r["psnr"],
                    "ms_ssim": r["ms_ssim"],
                    "payload_vs_analytic_pct": r["payload_vs_analytic_pct"],
                    "held_out": r["image"] in args.held_out,
                }
                for r in d["images"]
            },
        }
        # aggregate train-only vs held-out means so the two regimes are
        # never averaged together silently
        for tag, keep in (("train", False), ("held_out", True)):
            rows = [v for v in point["images"].values() if v["held_out"] == keep]
            if rows:
                point[f"mean_{tag}"] = {
                    k: sum(r[k] for r in rows) / len(rows)
                    for k in ("bpp", "psnr", "ms_ssim")
                }
        curve["points"].append(point)

    out = pathlib.Path(args.out_dir) / f"rd_curve_{args.name}.json"
    out.write_text(json.dumps(curve, indent=1) + "\n")
    print("wrote", out)
    for pt in curve["points"]:
        print(pt["label"],
              "train:", {k: round(v, 3) for k, v in pt.get("mean_train", {}).items()},
              "held_out:", {k: round(v, 3) for k, v in pt.get("mean_held_out", {}).items()})


if __name__ == "__main__":
    main()
