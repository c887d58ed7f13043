"""Unit tests for the promotion-chain plumbing (scripts/validate_staging.py,
scripts/rank_candidates.py) that runs unattended between retrain phases.

These are pure-Python tests (no JAX, no weights): the unattended promotion
loop is exactly the code path nobody watches, so its routing logic gets the
fast-tier coverage the quality gates themselves cannot give it.
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load(script_name):
    path = os.path.join(REPO, "scripts", script_name)
    spec = importlib.util.spec_from_file_location(
        script_name.replace(".py", ""), path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def vs():
    return _load("validate_staging.py")


class TestGateAttribution:
    def test_parametrized_id_routes_to_named_family(self, vs):
        nodes = ["tests/test_quality.py::test_family_beats_baseline[sr-x2]"]
        assert vs.attribute_gate_failures(nodes, "sr-x2") == nodes
        assert vs.attribute_gate_failures(nodes, "sr-x4") == []
        assert vs.attribute_gate_failures(nodes, "restore-unet") == []

    def test_underscored_test_name_routes_to_named_family(self, vs):
        # un-parametrized names embed the family with underscores
        nodes = ["tests/test_quality.py::test_sr_x2_smooth_no_hallucination"]
        assert vs.attribute_gate_failures(nodes, "sr-x2") == nodes
        assert vs.attribute_gate_failures(nodes, "restore-unet") == []

    def test_small_beats_prefix_of_flagship_name(self, vs):
        # restore-unet-small must win over the restore-unet substring match
        nodes = ["tests/test_quality.py::test_gain[restore-unet-small]"]
        assert vs.attribute_gate_failures(nodes, "restore-unet-small") == nodes
        assert vs.attribute_gate_failures(nodes, "restore-unet") == []

    def test_unnamed_gates_default_to_flagship(self, vs):
        # OOD / real-corpus gates exercise the flagship without naming it
        nodes = [
            "tests/test_quality_ood.py::test_defocus_gain",
            "tests/test_quality_real.py::test_clean_no_harm",
        ]
        assert vs.attribute_gate_failures(nodes, "restore-unet") == nodes
        for fam in ("sr-x2", "sr-x4", "diffusion-restore", "restore-unet-small"):
            assert vs.attribute_gate_failures(nodes, fam) == []

    def test_diffusion_and_small_shorthand(self, vs):
        nodes = [
            "tests/test_diffusion_serving.py::test_diffusion_quality_gate",
            "tests/test_quality.py::test_small_family_held_out",
        ]
        assert vs.attribute_gate_failures(nodes, "diffusion-restore") == [nodes[0]]
        assert vs.attribute_gate_failures(nodes, "restore-unet-small") == [nodes[1]]
        assert vs.attribute_gate_failures(nodes, "restore-unet") == []

    def test_one_red_family_does_not_hold_the_others(self, vs):
        nodes = [
            "tests/test_quality.py::test_family[sr-x4]",
            "tests/test_quality.py::test_sr_x4_smooth",
        ]
        assert vs.attribute_gate_failures(nodes, "sr-x4") == nodes
        assert vs.attribute_gate_failures(nodes, "sr-x2") == []
        assert vs.attribute_gate_failures(nodes, "restore-unet") == []


class TestCompareMetrics:
    def test_mean_axes_strict_tolerance(self):
        vs = _load("validate_staging.py")
        regs, imps = vs.compare_metrics(
            {"photo": 5.0, "rich": 7.0}, {"photo": 4.4, "rich": 7.6}, 0.5
        )
        assert list(regs) == ["photo"] and list(imps) == ["rich"]

    def test_worst_mad_axes_forensics_only(self):
        """VERDICT r4 item 7: promotion verdicts are quantile-based — the
        per-image max axes are recorded for forensics but EXCLUDED from the
        verdict entirely (they rode a ~6-photo corpus max-statistic and
        forced amended-tolerance calls like the 2026-08-19 flagship rebal).
        The p95 axes carry the clean-harm regression duty at the strict
        tolerance (test below)."""
        vs = _load("validate_staging.py")
        for staged in (-10.26, -10.9, -30.0):
            regs, imps = vs.compare_metrics(
                {"ood/clean_worst_mad": -9.64}, {"ood/clean_worst_mad": staged}, 0.5
            )
            assert regs == {} and imps == {}

    def test_p95_mad_axis_strict_tolerance(self):
        vs = _load("validate_staging.py")
        regs, _ = vs.compare_metrics(
            {"ood/clean_p95_mad": -9.64}, {"ood/clean_p95_mad": -10.9}, 0.5
        )
        assert list(regs) == ["ood/clean_p95_mad"]

    def test_mean_harm_axis_still_strict(self):
        vs = _load("validate_staging.py")
        regs, _ = vs.compare_metrics(
            {"real/clean_mad": -4.6}, {"real/clean_mad": -5.3}, 0.5
        )
        assert list(regs) == ["real/clean_mad"]

    def test_missing_axes_ignored(self):
        vs = _load("validate_staging.py")
        regs, imps = vs.compare_metrics({"a": 1.0}, {}, 0.5)
        assert regs == {} and imps == {}
