"""Cheaply rank flagship snapshot candidates before full promotion validation.

The chunked deconv retrain (scripts/r4f_relaunch.sh) leaves up to six
candidate npz snapshots; full validate_staging.py on each would take hours on
the 1-core box. This ranks them with a reduced-n pass over BOTH OOD corpora
(procedural physics + real photographs) and prints a composite score per
candidate, so only the winner goes through the full promotion gate.

Composite = sum of per-class dB gains (both corpora)
          - 0.5 * clean mean-harm (/255, both corpora)
          - 0.25 * clean worst-image harm (/255, both corpora)

Harm weighting is deliberately strong: the round-4 lesson is that gains on
degradation classes are cheap to buy by regressing clean-input fidelity.

Usage:
    python scripts/rank_candidates.py --dir .staging_deconv [--n 8] \
        [--family restore-unet] [--include-shipped]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _eval_indist(weights_dir: str, n: int) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu", IRP_WEIGHTS_DIR=weights_dir)
    out = subprocess.run(
        [sys.executable, "scripts/eval_flagship_quick.py", "--n", str(n)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"eval_flagship_quick rc={out.returncode}\n{out.stderr[-1500:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _eval(weights_dir: str, corpus: str, n: int, family: str) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu", IRP_WEIGHTS_DIR=weights_dir)
    out = subprocess.run(
        [sys.executable, "scripts/eval_ood.py", "--corpus", corpus,
         "--n", str(n), "--family", family],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"eval_ood {corpus} rc={out.returncode}\n{out.stderr[-1500:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])["ood"]


def _score(ood: dict, real: dict, indist: dict | None = None) -> tuple[float, dict]:
    gains, harm = 0.0, 0.0
    detail = {}
    if indist:
        # in-distribution held-out gains count toward the composite with the
        # same weight as one OOD class each — the validator HOLDs on any
        # regression here, so the ranker must see it
        for k, v in indist.items():
            gains += v
            detail[f"indist/{k}"] = round(v, 2)
    for label, rows in (("ood", ood), ("real", real)):
        for cls, row in rows.items():
            if cls == "clean_no_harm":
                harm += 0.5 * row["mad_255"] + 0.25 * row["worst_mad_255"]
                detail[f"{label}/clean_mad"] = round(row["mad_255"], 2)
                detail[f"{label}/clean_worst"] = round(row["worst_mad_255"], 2)
            else:
                gains += row["gain_db"]
                detail[f"{label}/{cls}"] = round(row["gain_db"], 2)
    return gains - harm, detail


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="directory of candidate npz files")
    ap.add_argument("--family", default="restore-unet")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--include-shipped", action="store_true",
                    help="also score the currently shipped weights as a floor")
    args = ap.parse_args()

    cand_dir = os.path.abspath(os.path.join(REPO, args.dir))
    fam_npz = f"{args.family}.npz"
    candidates = sorted(
        f for f in os.listdir(cand_dir)
        if f.endswith(".npz") and f.startswith(args.family)
    )
    if args.include_shipped:
        candidates.insert(0, "__shipped__")

    results = []
    for cand in candidates:
        with tempfile.TemporaryDirectory() as tmp:
            if cand == "__shipped__":
                src = os.path.join(REPO, "weights", fam_npz)
            else:
                src = os.path.join(cand_dir, cand)
            shutil.copy(src, os.path.join(tmp, fam_npz))
            try:
                ood = _eval(tmp, "ood", args.n, args.family)
                real = _eval(tmp, "real", args.n, args.family)
                indist = (
                    _eval_indist(tmp, args.n) if args.family == "restore-unet" else None
                )
            except RuntimeError as error:
                print(f"{cand}: EVAL FAILED {error}", file=sys.stderr, flush=True)
                continue
            score, detail = _score(ood, real, indist)
            results.append({"candidate": cand, "score": round(score, 3), "detail": detail})
            print(f"{cand}: score={score:.3f} {detail}", file=sys.stderr, flush=True)

    results.sort(key=lambda r: r["score"], reverse=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
