"""Build a pre-tokenized dataset file from raw text corpora.

Parity with `/root/reference/prepare_full_dataset.py` /
`prepare_vocab_dataset.py` (714 LoC): mixed sources (.txt/.jsonl dirs +
optional HF streaming) → packed [n, seq_len] token matrix saved as .npz
with per-sequence source metadata, consumable by `cli train --data`.

    python scripts/prepare_dataset.py --out data.npz --corpus-dir ./vocab_src \
        [--hf wikitext] [--seq-len 256] [--tokenizer google/flan-t5-base]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--corpus-dir", default=None)
    ap.add_argument("--hf", default=None,
                    help="HF dataset name (e.g. wikitext)")
    ap.add_argument("--hf-config", default="wikitext-2-raw-v1")
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--tokenizer", default=None,
                    help="HF tokenizer name; default byte-level")
    ap.add_argument("--max-sequences", type=int, default=100_000)
    args = ap.parse_args()

    from aura_snn_rag_tpu.encoders.pretrain_pipeline import iter_corpus_dir
    from aura_snn_rag_tpu.training.tokenizer import (
        ByteTokenizer, load_tokenizer)

    tok = load_tokenizer(args.tokenizer) if args.tokenizer \
        else ByteTokenizer()

    sequences = []
    sources = []
    buf = []

    def pack(ids, src):
        nonlocal buf
        buf.extend(ids)
        while len(buf) >= args.seq_len and \
                len(sequences) < args.max_sequences:
            sequences.append(buf[:args.seq_len])
            sources.append(src)
            buf = buf[args.seq_len:]

    if args.corpus_dir:
        for src, text in iter_corpus_dir(args.corpus_dir):
            pack(tok.encode(text), src)
            if len(sequences) >= args.max_sequences:
                break

    if args.hf and len(sequences) < args.max_sequences:
        from aura_snn_rag_tpu.training.data import load_hf_streaming
        hf_seqs = load_hf_streaming(
            args.hf, args.hf_config,
            args.tokenizer or "gpt2", args.seq_len,
            args.max_sequences - len(sequences))
        for row in hf_seqs:
            sequences.append(row.tolist())
            sources.append(f"hf:{args.hf}")

    arr = np.asarray(sequences, np.int32)
    np.savez(args.out, sequences=arr, sources=np.asarray(sources))
    vocab = int(arr.max()) + 1 if arr.size else 0
    print(f"wrote {args.out}: {arr.shape} (max token id {vocab - 1})")


if __name__ == "__main__":
    main()
