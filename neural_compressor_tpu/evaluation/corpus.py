"""Offline byte-level text corpus for accuracy-parity evaluation.

The driver environment has no network, and the reference's accuracy tables
(docs/source/llm_recipes.md) are measured on public datasets we cannot
fetch. The parity harness therefore trains a small in-repo model on a
deterministic local corpus (this repository's own markdown + Python text,
~0.5 MB of natural language and code) and measures the **quantization ppl
delta** fp-vs-quantized on a held-out split — the quantity the north-star
budget (Δppl ≤ 0.1 at equal bit-width) constrains.

Byte-level tokenization (vocab 256): dependency-free and deterministic.
"""

from __future__ import annotations

import os

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_EXCLUDE_DIRS = {".git", "nc_tpu_workspace", "artifacts", "__pycache__",
                 ".claude", "experiments"}
_EXTS = (".md", ".py")


def corpus_text(root: str = REPO_ROOT) -> bytes:
    """Deterministic concatenation of the repo's text files."""
    paths = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d not in _EXCLUDE_DIRS)
        for f in sorted(filenames):
            if f.endswith(_EXTS):
                paths.append(os.path.join(dirpath, f))
    chunks = []
    for p in sorted(paths):
        try:
            with open(p, "rb") as fh:
                chunks.append(fh.read())
        except OSError:  # pragma: no cover
            continue
        chunks.append(b"\n\n")
    return b"".join(chunks)


def corpus_tokens(seq_len: int = 256, root: str = REPO_ROOT,
                  val_every: int = 10):
    """Byte tokens chunked to [n, seq_len]; every ``val_every``-th row is
    held out. Returns (train [nt, L] int32, val [nv, L] int32)."""
    data = np.frombuffer(corpus_text(root), dtype=np.uint8).astype(np.int32)
    n = len(data) // seq_len
    rows = data[: n * seq_len].reshape(n, seq_len)
    idx = np.arange(n)
    val = rows[idx % val_every == 0]
    train = rows[idx % val_every != 0]
    return train, val
