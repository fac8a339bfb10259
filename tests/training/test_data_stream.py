"""TokenStream loader tests (offline-corpus consumption path)."""

import numpy as np
import pytest

from aura_snn_rag_tpu.training.data import TokenStream


@pytest.fixture()
def stream(tmp_path):
    toks = np.arange(10_000, dtype=np.uint16) % 31_000
    path = tmp_path / "train.npy"
    np.save(path, toks)
    return TokenStream(str(path), seq_len=64, seed=0)


class TestTokenStream:
    def test_sample_batch_shapes_and_bounds(self, stream):
        b = stream.sample_batch(8)
        assert b.shape == (8, 64) and b.dtype == np.int32
        assert b.min() >= 0 and b.max() < 31_000

    def test_sample_batch_windows_are_contiguous(self, stream):
        b = stream.sample_batch(4)
        # the synthetic stream is arange-mod, so windows are contiguous
        # modulo the wrap value
        diffs = np.diff(b.astype(np.int64), axis=1) % 31_000
        assert (diffs == 1).all()

    def test_sample_chunk_shape(self, stream):
        c = stream.sample_chunk(5, 4)
        assert c.shape == (5, 4, 64)

    def test_eval_batches_deterministic(self, stream):
        a = list(stream.eval_batches(2, max_batches=3))
        b = list(stream.eval_batches(2, max_batches=3))
        assert len(a) == 3
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_short_stream_rejected(self, tmp_path):
        np.save(tmp_path / "s.npy", np.arange(10, dtype=np.uint16))
        with pytest.raises(AssertionError):
            TokenStream(str(tmp_path / "s.npy"), seq_len=64)
