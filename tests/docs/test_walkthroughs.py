"""Execute every python snippet in docs/WALKTHROUGHS.md (VERDICT r3 #9).

The walkthroughs are the runnable-markdown equivalents of the reference's
six notebooks (/root/reference/notebooks/). This runner makes them
load-bearing: each ```python block executes in ONE shared namespace (the
phases build on each other, like notebook cells), in a temp cwd, with two
substitutions a CI run needs:

- `get_test_config` is aliased to `get_debug_config` after every block, so
  phase 1's 200-step loop runs in seconds instead of minutes;
- `my_tokenizer` (the doc's stand-in for "any tokenizer") is provided;
- generation lengths shrink to fit debug's max_seq_len=32 (the doc sizes
  them for the 'test' preset's longer context).

Bash blocks are skipped (they shell out to multi-minute corpus builds).
"""

import hashlib
import json
import re
from pathlib import Path

import numpy as np
import pytest

DOC = Path(__file__).resolve().parents[2] / "docs" / "WALKTHROUGHS.md"


def _python_blocks():
    return re.findall(r"```python\n(.*?)```", DOC.read_text(), re.S)


@pytest.mark.slow
def test_walkthrough_snippets_execute(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # fixtures the snippets reference
    (tmp_path / "corpus").mkdir()
    with open(tmp_path / "corpus" / "facts.jsonl", "w") as f:
        for i in range(8):
            f.write(json.dumps({"text": f"fact number {i}: the sky is "
                                        f"shade {i} of blue"}) + "\n")
    (tmp_path / "vocab_src").mkdir()
    (tmp_path / "vocab_src" / "seed.txt").write_text(
        "episodic memory stores one-shot facts")

    from aura_snn_rag_tpu.config import get_debug_config

    def my_tokenizer(texts):
        vocab = get_debug_config().model.vocab_size
        return np.stack([
            np.frombuffer(hashlib.sha256(t.encode()).digest(),
                          np.uint8)[:16].astype(np.int32) % vocab
            for t in texts])

    ns = {"my_tokenizer": my_tokenizer}
    blocks = _python_blocks()
    assert len(blocks) >= 5, "walkthroughs lost their snippets?"
    for i, block in enumerate(blocks):
        block = block.replace("max_new_tokens=32", "max_new_tokens=8")
        exec(compile(block, f"WALKTHROUGHS.md[python block {i}]", "exec"),
             ns)
        # CI-size preset: the docs use 'test' (512D/6L); debug is the same
        # API at toy dims
        ns["get_test_config"] = get_debug_config

    # the phases left real state behind: a trained trainer, a seeded bank,
    # specialists, and orchestrator stats
    assert ns["trainer"].hippocampus.memory_count > 0
    assert np.isfinite(ns["metrics"]["loss"])
    assert ns["reg"].get("physics").rmse is not None
    assert ns["orch"].stats["items_processed"] >= 1
