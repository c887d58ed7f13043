"""Promotion gate for staged retrains: run the full quality matrix against a
candidate weights dir and print a per-family PROMOTE / HOLD verdict.

The round-4 lesson this automates: the 40k deconv chip retrain passed every
loosely-calibrated pytest gate while REGRESSING the real-photo corpus
(jpeg -4.35 vs -2.90 dB, clean harm 6.7 vs 4.6/255) — pass/fail alone is not
a promotion criterion. A candidate must (a) pass the pytest gates AND
(b) not regress the currently-shipped weights beyond a tolerance on any
measured axis (procedural OOD, real-photo corpus, held-out gains, SR smooth
no-hallucination).

Usage:
    python scripts/validate_staging.py --stage .staging_weights \
        [--family restore-unet] [--tolerance 0.5]

Runs on CPU by design (must not contend with a training/serving TPU).
Prints one JSON verdict line per family on stdout; human detail on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def attribute_gate_failures(failed_nodes, fam):
    """Failed gate node ids attributed to ``fam``.

    Parametrized ids carry the family name (``[sr-x2]``), and un-parametrized
    test names embed it with underscores (``test_sr_x2_beats_nearest``), so
    matching runs on an underscore-normalized id. Gate tests that name no
    family (test_quality_ood.py / test_quality_real.py / the flagship held-out
    gates) exercise the flagship and attribute to restore-unet.
    """
    known = ("sr-x2", "sr-x4", "diffusion-restore", "restore-unet-small",
             "restore-unet")
    mine = []
    for node in failed_nodes:
        norm = node.replace("_", "-")
        owner = None
        for name in known:  # most-specific names first
            if name in norm:
                owner = name
                break
        if owner is None and ("diffusion" in norm or "small" in norm):
            owner = ("diffusion-restore" if "diffusion" in norm
                     else "restore-unet-small")
        if owner is None:
            owner = "restore-unet"  # flagship-only gate files
        if owner == fam:
            mine.append(node)
    return mine


def compare_metrics(shipped: dict, staged: dict, tolerance: float):
    """(regressions, improvements) between two metric dicts.

    Clean-harm promotion rides the p95 quantile, not the per-image max
    (VERDICT r4 item 7): the max statistic over a small corpus flips by
    ~0.5/255 on one image's rounding between statistically identical
    candidates (2026-08-19: a rebalance improving FIVE axes incl. halving
    the real-corpus worst harm 20.8 -> 16.7 was HOLD'd by a 0.62/255 bump
    of the procedural corpus's single worst image — the "amended
    tolerance" workaround this replaces). worst_mad axes are tracked for
    forensics but excluded from the verdict; p95/mean axes use the strict
    tolerance — the round-4 regression lesson was a MEAN harm regression
    and still blocks.
    """
    regressions, improvements = {}, {}
    for k, old in shipped.items():
        new = staged.get(k)
        if new is None or k.endswith("worst_mad"):
            continue
        delta = new - old
        if delta < -tolerance:
            regressions[k] = {"shipped": round(old, 2), "staged": round(new, 2)}
        elif delta > tolerance:
            improvements[k] = {"shipped": round(old, 2), "staged": round(new, 2)}
    return regressions, improvements


def _run_eval(script_args, weights_dir):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if weights_dir is not None:
        env["IRP_WEIGHTS_DIR"] = weights_dir
    else:
        env.pop("IRP_WEIGHTS_DIR", None)
    out = subprocess.run(
        [sys.executable] + script_args,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"{script_args}: rc={out.returncode}\n{out.stderr[-2000:]}")
    # last stdout line is the JSON payload for both eval scripts
    return json.loads(out.stdout.strip().splitlines()[-1])


def _flatten_flagship(weights_dir):
    """Metric dict for the flagship: procedural OOD + real corpus + held-out."""
    metrics = {}
    ood = _run_eval(["scripts/eval_ood.py", "--corpus", "ood"], weights_dir)["ood"]
    for cls, row in ood.items():
        if cls == "clean_no_harm":
            metrics["ood/clean_mad"] = -row["mad_255"]  # higher(-mad) = better
            metrics["ood/clean_p95_mad"] = -row.get("p95_mad_255", row["worst_mad_255"])
            metrics["ood/clean_worst_mad"] = -row["worst_mad_255"]  # forensics only
        else:
            metrics[f"ood/{cls}"] = row["gain_db"]
    real = _run_eval(["scripts/eval_ood.py", "--corpus", "real"], weights_dir)["ood"]
    for cls, row in real.items():
        if cls == "clean_no_harm":
            metrics["real/clean_mad"] = -row["mad_255"]
            metrics["real/clean_p95_mad"] = -row.get("p95_mad_255", row["worst_mad_255"])
            metrics["real/clean_worst_mad"] = -row["worst_mad_255"]  # forensics only
        else:
            metrics[f"real/{cls}"] = row["gain_db"]
    return metrics


def _flatten_family(report, fam):
    metrics = {}
    entry = report["families"].get(fam, {})
    for dist, row in entry.items():
        if fam.startswith("sr-"):
            for mode, sub in row.items():
                metrics[f"{dist}/{mode}"] = sub["gain_db"]
        else:
            metrics[f"{dist}"] = row["gain_db"]
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=".staging_weights")
    ap.add_argument("--family", action="append", default=None,
                    help="repeatable; default: every family with a staged npz")
    ap.add_argument("--tolerance", type=float, default=0.5,
                    help="max allowed regression vs shipped (dB, or /255 for mad axes)")
    args = ap.parse_args()

    stage = os.path.abspath(os.path.join(REPO, args.stage))
    fams = args.family
    if not fams:
        fams = sorted(
            f[: -len(".npz")]
            for f in os.listdir(stage)
            if f.endswith(".npz") and os.path.exists(os.path.join(REPO, "weights", f))
        )

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    # 1. pytest gates on the staged dir (hard requirement), attributed
    #    per-family so one family's red gate cannot HOLD every other family.
    #    xfail-marked gates stay soft (they are aspirational by construction:
    #    "remove the marker when the retrain promotes"); the numeric
    #    comparison below still tracks those axes with a regression tolerance.
    log(f"[1/3] pytest quality gates against {stage} ...")
    env = dict(os.environ, JAX_PLATFORMS="cpu", IRP_WEIGHTS_DIR=stage)
    gates = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_quality.py",
         "tests/test_quality_ood.py", "tests/test_quality_real.py",
         "-q", "--no-header", "-rf", "--tb=no"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=7200,
    )
    failed_nodes = [
        line.split()[1]
        for line in gates.stdout.splitlines()
        if line.startswith("FAILED ") or line.startswith("ERROR ")
    ]
    log(gates.stdout.strip().splitlines()[-1] if gates.stdout.strip() else gates.stderr[-400:])

    # A red run with nothing attributable (collection error, import crash)
    # means the gates never executed: block every family.
    gates_ran = gates.returncode == 0 or bool(failed_nodes)

    # 2. numeric comparison vs shipped, family by family. Restrict the
    #    eval to the families under test: a full 5-family 4-seed pass takes
    #    tens of minutes on the 1-core eval box and the validator reads only
    #    the target families' rows.
    log("[2/3] held-out table (eval_quality) for shipped and staged ...")
    fam_args = [a for f in fams for a in ("--family", f)]
    shipped_q = _run_eval(["scripts/eval_quality.py", *fam_args], None)
    staged_q = _run_eval(["scripts/eval_quality.py", *fam_args], stage)

    need_flagship = "restore-unet" in fams
    shipped_f = staged_f = {}
    if need_flagship:
        log("[3/3] flagship OOD + real corpus for shipped and staged ...")
        shipped_f = _flatten_flagship(None)
        staged_f = _flatten_flagship(stage)

    for fam in fams:
        shipped = _flatten_family(shipped_q, fam)
        staged = _flatten_family(staged_q, fam)
        if fam == "restore-unet":
            shipped.update(shipped_f)
            staged.update(staged_f)
        regressions, improvements = compare_metrics(shipped, staged, args.tolerance)
        fam_failures = attribute_gate_failures(failed_nodes, fam)
        gates_green = gates_ran and not fam_failures
        verdict = "PROMOTE" if gates_green and not regressions else "HOLD"
        row = {
            "family": fam,
            "verdict": verdict,
            "gates_green": gates_green,
            "gate_failures": fam_failures,
            "regressions": regressions,
            "improvements": improvements,
        }
        log(f"{fam}: {verdict}  (+{len(improvements)} improved, "
            f"-{len(regressions)} regressed beyond {args.tolerance})")
        for k, v in regressions.items():
            log(f"    REGRESSED {k}: {v['shipped']} -> {v['staged']}")
        for k, v in improvements.items():
            log(f"    improved  {k}: {v['shipped']} -> {v['staged']}")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
