"""Flat-scan kernel microbench: blockmax Pallas kernel vs XLA coarse scan.

Isolates the coarse-scoring stage of the flat retrieval path (the
bandwidth-bound 99% of the work) to attribute the end-to-end QPS number:

  - `xla`:    [M,D] @ [D,B] coarse matmul + [B,M] materialization
              (the engine's flat_strategy="scan" inner stage)
  - `kernel`: ops/pallas/flat_scan.flat_blockmax at several tile_m sizes
              (per-tile grid overhead amortizes with larger tiles)

Prints per-variant ms/batch and effective bank-read bandwidth. Run on the
chip:  python benchmarks/bench_flat_kernel.py [--small] [--bf16]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

SMALL = "--small" in sys.argv
DTYPE = "bf16" if "--bf16" in sys.argv else "int8"
M = 100_000 if SMALL else 1_000_000
D = 768
B = 128
REPS = 4 if SMALL else 8


def main():
    import jax
    import jax.numpy as jnp
    from aura_snn_rag_tpu.ops.pallas.flat_scan import (
        BLOCK_R, default_interpret, flat_blockmax, pack_row_terms)

    rng = np.random.RandomState(0)
    feats = rng.randn(M, D).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12
    if DTYPE == "int8":
        bank = jnp.asarray(np.clip(np.round(feats * 127.0), -127, 127)
                           .astype(np.int8))
        q = jnp.asarray(np.clip(np.round(feats[:B] * 127.0), -127, 127)
                        .astype(np.int8))
        inv = 1.0 / (127.0 * 127.0)
    else:
        bank = jnp.asarray(feats, jnp.bfloat16)
        q = jnp.asarray(feats[:B], jnp.bfloat16)
        inv = None
    mul1 = jnp.ones((M,), jnp.float32)         # cosine units (dequant is
    add1 = jnp.zeros((M,), jnp.float32)        # in-kernel for int8)
    packed = {t: pack_row_terms(mul1, add1, M, t) for t in (1024, 2048)}
    bank_bytes = M * D * (1 if DTYPE == "int8" else 2)

    def fence(x):
        np.asarray(jax.device_get(x if x.ndim == 0 else x.ravel()[:1]))

    def timed(name, fn):
        out = fn()
        fence(out)                      # warm/compile
        t0 = time.perf_counter()
        outs = [fn() for _ in range(REPS)]
        fence(outs[-1])
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:28s} {dt * 1e3:8.2f} ms/batch   "
              f"{bank_bytes / dt / 1e9:7.1f} GB/s eff   "
              f"{B / dt:9.0f} QPS(coarse)", flush=True)
        return dt

    # XLA scan stage: coarse matmul + combined + blockmax reduce in XLA.
    # Operands ride as ARGUMENTS (closing over the 768 MB bank would embed
    # it as a compile-time constant in the remote-compile request → HTTP 413).
    @jax.jit
    def xla_scan(bank, q, mul, add):
        acc = jax.lax.dot_general(
            q, bank, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if inv else jnp.float32)
        cos = acc.astype(jnp.float32) * (inv or 1.0)                # [B, M]
        combined = cos * mul[None, :] + add[None, :]
        return combined.reshape(B, -1, BLOCK_R).max(axis=-1)

    timed("xla coarse+blockmax", lambda: xla_scan(bank, q, mul1, add1))

    for tile_m in (1024, 2048):
        timed(f"pallas s8-native tile={tile_m}",
              lambda t=tile_m: flat_blockmax(
                  bank, q, *packed[t],
                  interpret=default_interpret(), tile_m=t,
                  int8_via_bf16=False))
    # int8 storage, bf16 MXU compute (exact: products <= 127^2 and 768-term
    # f32 accumulation stay below 2^24). tile=4096 exceeds the 16 MB scoped
    # VMEM with the in-kernel bf16 copy (measured 18.4 MB).
    for tile_m in (1024, 2048):
        timed(f"pallas s8->bf16 tile={tile_m}",
              lambda t=tile_m: flat_blockmax(
                  bank, q, *packed[t],
                  interpret=default_interpret(), tile_m=t,
                  int8_via_bf16=True))


if __name__ == "__main__":
    main()
