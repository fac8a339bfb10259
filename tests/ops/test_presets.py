"""Izhikevich preset loader tests (CSV/JSON loaders — neuron.py:270-321 and
brain_zone_factory.py:41-60 parity)."""

import json

import numpy as np

from aura_snn_rag_tpu.ops.izhikevich_presets import (
    IZHIKEVICH_PRESETS, get_preset, load_presets_csv, load_presets_json)


class TestPresetLoaders:
    def test_csv_loader(self, tmp_path):
        p = tmp_path / "patterns.csv"
        p.write_text("name,a,b,c,d\ncustom_one,0.03,0.25,-60,4\n"
                     "custom_two,0.1,0.2,-65,2\n")
        out = load_presets_csv(str(p))
        assert out["custom_one"] == {"a": 0.03, "b": 0.25, "c": -60.0,
                                     "d": 4.0}
        assert len(out) == 2

    def test_json_loader_comprehensive_layout(self, tmp_path):
        p = tmp_path / "patterns.json"
        p.write_text(json.dumps({
            "models": {"1_izhikevich": {
                "my_pattern": {"a": 0.02, "b": 0.2, "c": -65, "d": 8,
                               "note": "extra keys ignored"}}}}))
        out = load_presets_json(str(p))
        assert out["my_pattern"]["d"] == 8.0

    def test_builtin_presets_valid(self):
        for name in IZHIKEVICH_PRESETS:
            params = get_preset(name)
            assert np.isfinite(float(params.a))
            assert np.isfinite(float(params.d))
