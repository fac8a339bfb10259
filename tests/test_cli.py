"""CLI smoke tests via click's test runner."""

import json

import numpy as np
import pytest
from click.testing import CliRunner

from aura_snn_rag_tpu.cli import main


class TestCLI:
    def test_help_lists_commands(self):
        result = CliRunner().invoke(main, ["--help"])
        assert result.exit_code == 0
        for cmd in ("train", "generate", "ingest", "bench", "brain-demo"):
            assert cmd in result.output

    def test_ingest_command(self, tmp_path):
        p = tmp_path / "rows.jsonl"
        p.write_text('{"text": "alpha"}\n{"text": "beta"}\n')
        result = CliRunner().invoke(
            main, ["ingest", str(p), "--feature-dim", "64"])
        assert result.exit_code == 0, result.output
        assert "stored 2 memories" in result.output

    @pytest.mark.slow
    def test_train_few_steps(self, tmp_path):
        tokens = np.random.RandomState(0).randint(
            1, 500, (32, 32)).astype(np.int32)
        data = tmp_path / "tokens.npy"
        np.save(data, tokens)
        result = CliRunner().invoke(main, [
            "train", "--preset", "debug", "--steps", "3",
            "--data", str(data),
            "--checkpoint-dir", str(tmp_path / "ckpt")])
        assert result.exit_code == 0, result.output
        assert "done" in result.output
