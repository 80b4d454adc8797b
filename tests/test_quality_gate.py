"""Unit tests for the quality-gate logic in benchmarks/quality_check.py
(round-5 verdict #8: the trained-weights harness must FAIL on quality
regressions, not just print a table).

Pure-logic tests — no jax, no training; the end-to-end harness smoke
(including the off-signature disarm) is tests/test_cli_pipeline.py.
"""
import copy
import importlib.util
import json
import os
import sys

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def qc():
    argv = sys.argv
    sys.argv = ["quality_check.py"]
    try:
        spec = importlib.util.spec_from_file_location(
            "quality_check_for_gate_tests",
            os.path.join(_ROOT, "benchmarks", "quality_check.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    return mod


@pytest.fixture()
def good_metrics():
    return {
        "latent": {
            "xla-f32": {"acc": 0.8335, "agree": None},
            "pallas-bf16": {"acc": 0.8336, "agree": 0.974},
            "pallas-int8": {"acc": 0.8335, "agree": 0.973},
        },
        "arnn-reg": {
            "xla-f32": {"acc": 0.8288, "agree": None},
            "pallas-bf16": {"acc": 0.8288, "agree": 1.0},
        },
        "arnn-baseline": {
            "xla-f32": {"acc": 0.8288, "agree": None},
            "pallas-bf16": {"acc": 0.8288, "agree": 1.0},
        },
    }


def test_expected_file_signature_matches_defaults(qc):
    """The stored bounds arm on the harness' DEFAULT knobs — otherwise
    the gate would never run in the documented invocation."""
    with open(os.path.join(_ROOT, "benchmarks", "quality_expected.json")) as f:
        expected = json.load(f)
    assert expected["signature"] == qc.harness_signature()


def test_documented_numbers_pass(qc, good_metrics, monkeypatch):
    monkeypatch.delenv("QC_GATE", raising=False)
    armed, violations = qc.run_gate(good_metrics)
    assert armed
    assert violations == []


def test_agreement_collapse_fails(qc, good_metrics, monkeypatch):
    monkeypatch.delenv("QC_GATE", raising=False)
    bad = copy.deepcopy(good_metrics)
    bad["latent"]["pallas-int8"]["agree"] = 0.80
    armed, violations = qc.run_gate(bad)
    assert armed
    assert len(violations) == 1 and "agreement" in violations[0]


def test_accuracy_cliff_fails(qc, good_metrics, monkeypatch):
    monkeypatch.delenv("QC_GATE", raising=False)
    bad = copy.deepcopy(good_metrics)
    bad["latent"]["pallas-bf16"]["acc"] = 0.70  # delta vs f32 > 0.01
    bad["arnn-reg"]["xla-f32"]["acc"] = 0.50  # absolute floor
    armed, violations = qc.run_gate(bad)
    assert armed
    assert any("|acc - f32|" in v for v in violations)
    assert any("floor" in v and "arnn-reg/xla-f32" in v for v in violations)


def test_missing_row_fails(qc, good_metrics, monkeypatch):
    monkeypatch.delenv("QC_GATE", raising=False)
    bad = copy.deepcopy(good_metrics)
    del bad["arnn-baseline"]["pallas-bf16"]
    armed, violations = qc.run_gate(bad)
    assert armed
    assert any("missing" in v for v in violations)


def test_qc_gate_0_disarms(qc, good_metrics, monkeypatch):
    monkeypatch.setenv("QC_GATE", "0")
    bad = copy.deepcopy(good_metrics)
    bad["latent"]["pallas-int8"]["agree"] = 0.0
    armed, violations = qc.run_gate(bad)
    assert not armed and violations == []
