"""Block-wise calibration capture.

Parity target: the reference's GPTQ calibration trick — monkey-patch
block 0's forward to record inputs then raise, catch in model.forward
(gptq.py:399-458), plus block discovery ``trace_gptq_target_blocks``
(gptq.py:68-130). TPU redesign: blocks are discovered structurally (the
longest ``nnx.List`` of same-typed submodules containing Linears); capture
still uses the record-and-abort wrapper, but it runs **eagerly only during
calibration** — the replay/quantize path is fully jitted.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import nnx

from ..common import logger
from ..layers.module_utils import named_modules, module_type_name


class CaptureAbort(Exception):
    """Raised by the capture wrapper to stop the forward after block 0."""


class BlockInputCapture(nnx.Module):
    """Wraps the first transformer block: records (args, kwargs), aborts."""

    def __init__(self, inner: nnx.Module):
        self.inner = inner
        self._captured: list[tuple[tuple, dict]] = []

    def __call__(self, *args, **kwargs):
        self._captured.append((jax.tree.map(lambda x: x, args),
                               jax.tree.map(lambda x: x, kwargs)))
        raise CaptureAbort

    @property
    def captured(self):
        return self._captured


def find_target_blocks(model: nnx.Module) -> tuple[str, list[str]] | None:
    """Locate the transformer block list.

    Returns ``(list_path, [block_paths...])`` for the longest nnx.List whose
    entries share a type and contain at least one Linear-like module, or
    None if the model has no block structure.

    Multimodal models: the TEXT decoder stack is the target, not the
    vision tower (reference MLLM handling quantizes the language model,
    torch/quantization/config.py:887-1008) — a ``language_model``
    submodule is searched first and its block paths returned prefixed.
    """
    lm = getattr(model, "language_model", None)
    if lm is not None:
        res = find_target_blocks(lm)
        if res is not None:
            lpath, bpaths = res
            return (f"language_model.{lpath}",
                    [f"language_model.{p}" for p in bpaths])
    candidates = []
    for path, mod in named_modules(model):
        if not isinstance(mod, nnx.List) or len(mod) < 2:
            continue
        types = {module_type_name(m) for m in mod}
        if len(types) != 1:
            continue
        has_linear = any(
            hasattr(sub, "kernel")
            for _, sub in named_modules(mod[0])
        )
        if not has_linear:
            continue
        candidates.append(path)
    if not candidates:
        return None
    # the decoder-block list is the OUTERMOST one (an MoE expert list lives
    # inside a block); prefer shallow paths, tie-break on length
    def depth(p):
        return p.count(".")

    path = min(candidates, key=lambda p: (depth(p), p))
    from ..layers.module_utils import get_module

    mod = get_module(model, path)
    return (path, [f"{path}.{i}" for i in range(len(mod))])


class CalibCaptureState:
    """Holds the capture wrapper + cached per-block inputs between
    prepare() and convert()."""

    def __init__(self, model, block_list_path: str, block_paths: list[str]):
        self.model = model
        self.block_list_path = block_list_path
        self.block_paths = block_paths
        self.wrapper: BlockInputCapture | None = None

    def attach(self):
        from ..layers.module_utils import get_module, replace_module

        first = get_module(self.model, self.block_paths[0])
        self.wrapper = BlockInputCapture(first)
        replace_module(self.model, self.block_paths[0], self.wrapper)

    def detach(self) -> list[tuple[tuple, dict]]:
        from ..layers.module_utils import replace_module

        assert self.wrapper is not None
        replace_module(self.model, self.block_paths[0], self.wrapper.inner)
        captured = self.wrapper.captured
        self.wrapper = None
        logger.info("Captured %d calibration batches for block 0",
                    len(captured))
        return captured


def run_capture(model, state: CalibCaptureState, run_fn, run_args=None):
    """Attach the wrapper, run the user's calibration fn (aborts after
    block 0 each call), detach, return cached inputs."""
    state.attach()
    try:
        _safe_run(model, run_fn, run_args)
    finally:
        captured = state.detach()
    return captured


def _safe_run(model, run_fn, run_args):
    """Run user's calibration; swallow CaptureAbort per batch.

    The user fn typically loops over batches calling ``model(batch)``; each
    call aborts after block 0. If the user fn does its own exception
    handling per batch that is fine too.
    """
    if run_fn is None:
        return
    try:
        if run_args is None:
            run_fn(model)
        elif isinstance(run_args, dict):
            run_fn(model, **run_args)
        elif isinstance(run_args, (list, tuple)):
            run_fn(model, *run_args)
        else:
            run_fn(model, run_args)
    except CaptureAbort:
        pass


def calibration_forward(model, batches):
    """Convenience run_fn: calls model on each batch, tolerating the
    capture abort (use as ``run_fn=lambda m: calibration_forward(m, data)``)."""
    for b in batches:
        try:
            model(b)
        except CaptureAbort:
            continue
    return None
