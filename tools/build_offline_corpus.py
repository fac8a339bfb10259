"""Build an offline training corpus from text available on this machine.

This environment has zero network egress: the reference's corpora
(WikiText-2/103, Nemotron-CC — aura_nemotron_cc2_pretraining.py:140-152)
cannot be downloaded. The closest available REAL (non-synthetic) corpus is
the machine itself: ~500 MB of Python source plus ~20 MB of English prose
(markdown/rst/licenses) under site-packages. Code is a legitimate LM corpus
with natural long-range structure; the training-curve comparison against
the reference trajectory (docs/TRAINING_OPTIMIZATION.md:198-204) is about
curve SHAPE and optimization health, and is documented as such.

Pipeline:
  1. harvest + content-dedupe source documents,
  2. train a 32k byte-level BPE (`tokenizers`, offline),
  3. tokenize everything into one uint16 token stream with EOS separators,
  4. split train/val by document, save .npy + tokenizer.json + meta.

Usage: python tools/build_offline_corpus.py [--out DIR] [--vocab 32000]
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import random
import sys
import time

SKIP_SUBSTRINGS = (
    "_pb2.py", "_pb2_grpc.py", "/node_modules/", "/.git/",
)
PROSE_EXT = (".md", ".rst", ".txt")

ROOTS = (
    "/opt/venv/lib/python3.12/site-packages",
    "/usr/lib/python3.12",
    "/usr/share/doc",
)


def harvest(max_doc_bytes: int = 2_000_000):
    """Yield (path, text) for every unique usable document."""
    seen = set()
    for root in ROOTS:
        patterns = ["**/*.py"] + [f"**/*{e}" for e in PROSE_EXT]
        for pat in patterns:
            for path in glob.iglob(os.path.join(root, pat), recursive=True):
                if any(s in path for s in SKIP_SUBSTRINGS):
                    continue
                try:
                    size = os.path.getsize(path)
                    if size < 64 or size > max_doc_bytes:
                        continue
                    with open(path, "rb") as f:
                        raw = f.read()
                except OSError:
                    continue
                digest = hashlib.sha1(raw).digest()
                if digest in seen:
                    continue
                seen.add(digest)
                try:
                    text = raw.decode("utf-8")
                except UnicodeDecodeError:
                    continue
                # skip machine-generated unicode tables etc: require a
                # reasonable ASCII ratio and line lengths
                if sum(c < "\x80" for c in text[:4096]) < 3500:
                    continue
                yield path, text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/data/corpus")
    ap.add_argument("--vocab", type=int, default=32_000)
    ap.add_argument("--val-frac", type=float, default=0.005)
    ap.add_argument("--tokenizer-sample-docs", type=int, default=20_000)
    args = ap.parse_args()

    import numpy as np
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()

    print("harvesting ...", flush=True)
    docs = []
    total = 0
    for path, text in harvest():
        docs.append(text)
        total += len(text)
    print(f"  {len(docs)} docs, {total/1e6:.0f} MB in {time.time()-t0:.0f}s",
          flush=True)

    rnd = random.Random(0)
    rnd.shuffle(docs)

    # ---- train byte-level BPE ----
    tok_path = os.path.join(args.out, "tokenizer.json")
    if os.path.exists(tok_path):
        print("tokenizer exists, reusing", flush=True)
        tokenizer = Tokenizer.from_file(tok_path)
    else:
        print("training BPE ...", flush=True)
        tokenizer = Tokenizer(models.BPE())
        tokenizer.pre_tokenizer = pre_tokenizers.ByteLevel(
            add_prefix_space=False)
        tokenizer.decoder = decoders.ByteLevel()
        trainer = trainers.BpeTrainer(
            vocab_size=args.vocab, special_tokens=["<eos>", "<pad>"],
            show_progress=False)
        sample = docs[:args.tokenizer_sample_docs]
        tokenizer.train_from_iterator(sample, trainer)
        tokenizer.save(tok_path)
        print(f"  vocab {tokenizer.get_vocab_size()} "
              f"in {time.time()-t0:.0f}s", flush=True)

    eos_id = tokenizer.token_to_id("<eos>")
    assert tokenizer.get_vocab_size() <= 65_535, "uint16 stream"

    # ---- tokenize everything ----
    print("tokenizing ...", flush=True)
    n_val_docs = max(1, int(len(docs) * args.val_frac))
    streams = {"val": [], "train": []}
    batch = 512
    for split, split_docs in (("val", docs[:n_val_docs]),
                              ("train", docs[n_val_docs:])):
        out = streams[split]
        for i in range(0, len(split_docs), batch):
            encs = tokenizer.encode_batch(split_docs[i:i + batch])
            for e in encs:
                out.extend(e.ids)
                out.append(eos_id)
            if split == "train" and (i // batch) % 50 == 0:
                print(f"  train {i}/{len(split_docs)} docs, "
                      f"{len(out)/1e6:.0f}M tokens, {time.time()-t0:.0f}s",
                      flush=True)

    meta = {"vocab_size": tokenizer.get_vocab_size(), "eos_id": eos_id,
            "n_docs": len(docs), "bytes": total}
    for split, ids in streams.items():
        arr = np.asarray(ids, np.uint16)
        np.save(os.path.join(args.out, f"{split}.npy"), arr)
        meta[f"{split}_tokens"] = int(arr.size)
        print(f"  {split}: {arr.size/1e6:.1f}M tokens", flush=True)
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"done in {time.time()-t0:.0f}s -> {args.out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
