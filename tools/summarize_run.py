"""Summarize a training-run JSONL (examples/train_flagship.py output):
loss/PPL at the reference checkpoints + throughput/MFU aggregates.

    python tools/summarize_run.py runs/flagship_r2.jsonl
"""

import json
import sys


def main(path):
    recs = [json.loads(l) for l in open(path) if l.strip()]
    steps = [r for r in recs if "step" in r]
    final = next((r for r in recs if r.get("final")), None)

    def at(step):
        cands = [r for r in steps if r["step"] >= step]
        return cands[0] if cands else None

    print(f"{'step':>6} {'loss':>7} {'ce':>7} {'ppl':>9} "
          f"{'val_loss':>9} {'val_ppl':>9} {'mem':>7}")
    for mark in (100, 500, 1000, 2500, 5000, 7500, 10000, 12500, 15000,
                 20000, 25000, 30000, 35000, 40000, 45000, 50000):
        r = at(mark)
        if r is None:
            continue
        print(f"{r['step']:>6} {r['loss']:>7.3f} {r['ce']:>7.3f} "
              f"{r['ppl']:>9.1f} "
              f"{r.get('val_loss', float('nan')):>9.3f} "
              f"{r.get('val_ppl', float('nan')):>9.1f} "
              f"{r.get('mem_count', 0):>7}")
    toks = [r["tok_s"] for r in steps if r.get("tok_s", 0) > 1000]
    mfus = [r["mfu"] for r in steps if r.get("mfu", 0) > 0.01]
    if toks:
        print(f"\nsteady tok/s: median {sorted(toks)[len(toks)//2]:,} "
              f"mfu {sorted(mfus)[len(mfus)//2]:.3f}")
    if final:
        print("final:", json.dumps(final))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/flagship_r2.jsonl")
