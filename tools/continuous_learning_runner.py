"""Attach a continuous-learning orchestrator to a brain system and run it.

Parity with `/root/reference/src/tools/continuous_learning_runner.py:1-30`.

    python tools/continuous_learning_runner.py --vocab-dir ./vocab_src \
        [--rss] [--duration 60]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import asyncio
import json
import sys


async def run(args):
    from aura_snn_rag_tpu.services.brain_system import NeuromorphicBrainSystem
    from aura_snn_rag_tpu.services.continuous_learning import (
        create_default_feeds)

    system = NeuromorphicBrainSystem(
        d_model=args.d_model, enable_rss=args.rss)
    orch = system.orchestrator
    if args.vocab_dir:
        orch.vocab_dir = args.vocab_dir
    await orch.start()
    print(f"orchestrator running for {args.duration}s "
          f"(feeds={len(orch.feeds)}, vocab_dir={orch.vocab_dir})")
    try:
        await asyncio.sleep(args.duration)
    finally:
        await orch.stop()
    print(json.dumps({"stats": orch.stats,
                      "health": system.get_health()["processor_stats"]}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab-dir", default=None)
    ap.add_argument("--rss", action="store_true")
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--d-model", type=int, default=64)
    asyncio.run(run(ap.parse_args()))


if __name__ == "__main__":
    main()
