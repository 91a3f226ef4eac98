"""Automatic prefix caching for the paged serving engine.

The reference delegates serving to vLLM/Gaudi; vLLM's flagship KV-reuse
feature is automatic prefix caching — requests sharing a prompt prefix
(system prompts, few-shot headers, chat history) reuse the pool pages
that already hold that prefix's KV instead of recomputing the prefill.
This module owns the page-granular bookkeeping; the engine consumes it:

- Pages are keyed by a HASH CHAIN over full page-sized token chunks
  (``key_p = H(key_{p-1} || tokens_p)``), so a page key commits to the
  entire prefix through that page — content-addressed, deterministic
  across engines of the same page size.
- Registered pages are IMMUTABLE by construction: only pages fully
  covered by a committed prompt are registered, and page-aligned decode
  / speculative-window writes land strictly after the prompt, i.e. in
  later pages (positions >= len(prompt) live in page indices
  >= n_full_pages).
- Lifetime is refcounted: a page mapped into a slot's block table holds
  a reference per slot. At zero references a REGISTERED page parks in
  an LRU "reusable" pool — still matchable — and is evicted (and only
  then returned to the allocator) under pool pressure, before any
  preemption. Unregistered pages free normally.

TPU note: a prefix hit replaces prefill FLOPs with one page->staging
dequant copy per hit page (the remainder chunks attend the staged
prefix exactly like any later chunk attends earlier ones), so the win
scales with prefix length x prefill cost — the MXU work skipped — while
costing one HBM page read.
"""
from __future__ import annotations

import hashlib
from collections import OrderedDict

import numpy as np

__all__ = ["PagePrefixCache"]


class PagePrefixCache:
    """Host-side page index: content hash -> pool page id, refcounts,
    and the LRU reusable pool. Knows nothing about devices."""

    def __init__(self, page_size: int):
        self.page = int(page_size)
        self.table: dict[bytes, int] = {}        # chunk key -> pid
        self.key_of: dict[int, bytes] = {}       # pid -> chunk key
        self.ref: dict[int, int] = {}            # pid -> live references
        self.reusable: OrderedDict[int, bytes] = OrderedDict()  # LRU
        self.lookups = 0
        self.hit_tokens = 0
        self.evictions = 0

    # ---------------------------------------------------------------- keys
    def chunk_keys(self, src: np.ndarray) -> list[bytes]:
        """Hash-chain keys of every FULL page chunk of ``src``."""
        keys = []
        parent = b"root"
        for p in range(len(src) // self.page):
            chunk = np.ascontiguousarray(
                src[p * self.page:(p + 1) * self.page], dtype=np.int32)
            h = hashlib.blake2b(parent, digest_size=16)
            h.update(chunk.tobytes())
            parent = h.digest()
            keys.append(parent)
        return keys

    def probe(self, src: np.ndarray) -> tuple[list[bytes], list[int]]:
        """(all full-page chunk keys, pids of the longest cached prefix).
        At least one token is always left to prefill (the final chunk
        must run to produce next-token logits), so hits are capped at
        ``(len(src) - 1) // page`` pages. No side effects."""
        keys = self.chunk_keys(src)
        cap = max(0, (len(src) - 1) // self.page)
        hits: list[int] = []
        for key in keys[:cap]:
            pid = self.table.get(key)
            if pid is None:
                break
            hits.append(pid)
        return keys, hits

    # ------------------------------------------------------------ lifetime
    def acquire(self, pid: int) -> None:
        """A slot mapped ``pid`` into its block table."""
        self.ref[pid] = self.ref.get(pid, 0) + 1
        self.reusable.pop(pid, None)

    def release(self, pid: int) -> bool:
        """Drop one reference; True if the page is now FREE for the
        allocator (unregistered and unreferenced). Registered pages park
        in the reusable LRU instead and return False."""
        n = self.ref.get(pid, 1) - 1
        if n > 0:
            self.ref[pid] = n
            return False
        self.ref.pop(pid, None)
        key = self.key_of.get(pid)
        if key is not None:
            self.reusable[pid] = key
            self.reusable.move_to_end(pid)
            return False
        return True

    def register(self, pid: int, key: bytes) -> None:
        """Publish a committed immutable page. First writer wins — a
        concurrent duplicate prefill keeps its copy unregistered (it
        frees normally when its slot retires)."""
        if key not in self.table and pid not in self.key_of:
            self.table[key] = pid
            self.key_of[pid] = key

    def evict_one(self) -> int | None:
        """Reclaim the least-recently-used unreferenced registered page;
        returns its pid (now allocator-free) or None."""
        if not self.reusable:
            return None
        pid, key = self.reusable.popitem(last=False)
        del self.table[key]
        del self.key_of[pid]
        self.evictions += 1
        return pid

    def drop(self) -> None:
        """Clear the index entirely (``reset_prefix_cache``): all
        registered pages forget their keys; reusable pages must be
        handed back to the allocator by the caller beforehand."""
        self.table.clear()
        self.key_of.clear()
        self.reusable.clear()

    def stats(self) -> dict:
        return {"prefix_lookups": self.lookups,
                "prefix_hit_tokens": self.hit_tokens,
                "prefix_evictions": self.evictions,
                "prefix_cached_pages": len(self.table),
                "prefix_reusable_pages": len(self.reusable)}
