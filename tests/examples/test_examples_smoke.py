"""Example-CLI smoke tests (tiny settings, CPU) — keeps the samples healthy.

Parity: the reference treats its Samples as the real end-to-end tests; these
drive each CLI's main() in-process.
"""

import runpy
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).parent.parent.parent / "examples"


def _run(script: str, argv: list[str], monkeypatch) -> int:
    monkeypatch.setattr(sys, "argv", [script, *argv])
    try:
        runpy.run_path(str(EXAMPLES / script), run_name="__main__")
    except SystemExit as e:
        return int(e.code or 0)
    return 0


def test_mnist_example(monkeypatch):
    code = _run(
        "mnist_train.py",
        ["--epochs", "3", "--synthetic-n", "512", "--batch-size", "64"],
        monkeypatch,
    )
    assert code == 0  # accuracy gate inside the script


def test_charlm_example(monkeypatch, capsys):
    code = _run(
        "charlm_train.py",
        ["--steps", "12", "--batch-size", "8", "--seq-len", "32", "--sample", "16"],
        monkeypatch,
    )
    assert code == 0
    out = capsys.readouterr().out
    assert "perplexity" in out and "sample" in out


def test_gpt2_train_example(monkeypatch, capsys):
    code = _run(
        "gpt2_train.py",
        ["--steps", "6", "--batch-size", "4", "--seq-len", "32",
         "--layers", "1", "--dim", "32", "--heads", "2", "--val-every", "3"],
        monkeypatch,
    )
    assert code == 0
    assert "final train loss" in capsys.readouterr().out


def test_gpt2_generate_example(monkeypatch, capsys):
    code = _run(
        "gpt2_generate.py",
        ["--random-init", "--tokens", "4", "--quantize", "int8"],
        monkeypatch,
    )
    assert code == 0
    assert "token ids" in capsys.readouterr().out


def test_viz_example(monkeypatch, tmp_path, capsys):
    code = _run(
        "viz_demo.py",
        ["--epochs", "1", "--ppm-out", str(tmp_path / "w.ppm")],
        monkeypatch,
    )
    assert code == 0
    assert (tmp_path / "w.ppm").exists()
