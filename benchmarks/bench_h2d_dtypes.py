"""Host->device transfer rate by dtype on the axon tunnel.

The round-5 headline shipped ingest as f16 (half the f32 bytes) and
measured 690 s where f32 took 344 s — 4x WORSE per byte. This probe times
a fixed 256 MB payload as f32 / f16 / bf16 / uint16 / int8 to identify
which host buffer dtypes ride the fast PJRT path, so ingest can ship the
fastest-per-information-bit encoding (e.g. raw uint16 + device-side
bitcast if f16 itself is the slow path).

    python benchmarks/bench_h2d_dtypes.py [--mb=256]

Prints one JSON line: {dtype: MB/s}.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

MB = next((int(a.split("=", 1)[1]) for a in sys.argv
           if a.startswith("--mb=")), 256)


def main():
    import jax
    import jax.numpy as jnp

    jax.devices()
    rates = {}
    n_f32 = MB * (1 << 20) // 4
    base = np.random.RandomState(0).randn(n_f32).astype(np.float32)
    payloads = {
        "f32": base,
        "f16": base.astype(np.float16),
        "bf16": None,                      # jnp cast below (numpy lacks it)
        "u16": base.astype(np.float16).view(np.uint16),
        "i8": np.clip(np.round(base * 64), -127, 127).astype(np.int8),
        "u8_raw": base.view(np.uint8),     # same BYTES as f32, u8 dtype
    }
    for name, arr in payloads.items():
        if name == "bf16":
            import ml_dtypes
            arr = base.astype(ml_dtypes.bfloat16)
        # warm the dispatch path once with a tiny slice
        np.asarray(jnp.asarray(arr[:1024]))
        t0 = time.perf_counter()
        dev = jnp.asarray(arr)
        np.asarray(dev[:8])                # fence (block_until_ready lies
        dt = time.perf_counter() - t0      # on axon)
        rates[name] = round(arr.nbytes / dt / (1 << 20), 2)
        del dev
    print(json.dumps({"metric": "h2d MB/s by dtype", "payload_mb": MB,
                      **rates}))


if __name__ == "__main__":
    main()
