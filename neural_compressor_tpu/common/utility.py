"""Framework-agnostic utilities: options singleton, timing, statistics tables.

Parity target: neural_compressor/common/utils/utility.py and the ``options``
global from common/base_config.py:900-986 (reference). Re-implemented from
scratch; table rendering is dependency-free (no prettytable).
"""

from __future__ import annotations

import functools
import os
import random
import time
from typing import Any, Callable, Iterable, Sequence

import numpy as np

from .logger import logger

DEFAULT_WORKSPACE = "./nc_tpu_workspace"


def singleton(cls):
    """Class decorator returning a single shared instance."""

    instances: dict[type, Any] = {}

    @functools.wraps(cls)
    def _get(*args, **kwargs):
        if cls not in instances:
            instances[cls] = cls(*args, **kwargs)
        return instances[cls]

    return _get


class LazyImport:
    """Defer a module import until first attribute access."""

    def __init__(self, module_name: str):
        self.module_name = module_name
        self._module = None

    def _load(self):
        if self._module is None:
            import importlib

            self._module = importlib.import_module(self.module_name)
        return self._module

    def __getattr__(self, name: str):
        return getattr(self._load(), name)


@singleton
class Options:
    """Global options: seed / workspace / resume_from / tensorboard.

    Mirrors the reference ``options`` semantics
    (common/base_config.py:900-986).
    """

    def __init__(self, random_seed: int = 1978, workspace: str = DEFAULT_WORKSPACE,
                 resume_from: str | None = None, tensorboard: bool = False):
        self._random_seed = random_seed
        self._workspace = workspace
        self._resume_from = resume_from
        self._tensorboard = tensorboard

    @property
    def random_seed(self) -> int:
        return self._random_seed

    @random_seed.setter
    def random_seed(self, seed: int) -> None:
        assert isinstance(seed, int), "random_seed must be an int"
        self._random_seed = seed
        random.seed(seed)
        np.random.seed(seed % (2**32))

    @property
    def workspace(self) -> str:
        return self._workspace

    @workspace.setter
    def workspace(self, path: str) -> None:
        self._workspace = path
        os.makedirs(path, exist_ok=True)

    @property
    def resume_from(self) -> str | None:
        return self._resume_from

    @resume_from.setter
    def resume_from(self, path: str | None) -> None:
        self._resume_from = path

    @property
    def tensorboard(self) -> bool:
        return self._tensorboard

    @tensorboard.setter
    def tensorboard(self, value: bool) -> None:
        self._tensorboard = bool(value)


options = Options()


def dump_elapsed_time(customized_msg: str = ""):
    """Decorator logging wall-clock time of the wrapped call."""

    def decorator(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            start = time.time()
            result = fn(*args, **kwargs)
            elapsed_ms = (time.time() - start) * 1000.0
            logger.info(
                "%s elapsed time: %.2f ms",
                customized_msg or f"Function [{fn.__qualname__}]",
                elapsed_ms,
            )
            return result

        return wrapper

    return decorator


def log_process(mode: str = ""):
    """Decorator logging start/end of a quantization stage."""

    def decorator(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            logger.info("Start to %s the model.", mode or fn.__name__)
            result = fn(*args, **kwargs)
            logger.info("End to %s the model.", mode or fn.__name__)
            return result

        return wrapper

    return decorator


_CALL_COUNTS: dict[str, int] = {}


def call_counter(fn: Callable) -> Callable:
    """Count invocations of ``fn`` (inspect via ``get_call_count``)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        _CALL_COUNTS[fn.__qualname__] = _CALL_COUNTS.get(fn.__qualname__, 0) + 1
        return fn(*args, **kwargs)

    return wrapper


def get_call_count(fn: Callable) -> int:
    return _CALL_COUNTS.get(fn.__qualname__, 0)


def _render_table(header: str, field_names: Sequence[str],
                  rows: Iterable[Sequence[Any]]) -> str:
    rows = [[str(c) for c in row] for row in rows]
    widths = [len(f) for f in field_names]
    for row in rows:
        for i, cell in enumerate(row):
            widths[i] = max(widths[i], len(cell))
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    lines = [header, sep,
             "|" + "|".join(f" {f:<{w}} " for f, w in zip(field_names, widths)) + "|",
             sep]
    for row in rows:
        lines.append("|" + "|".join(f" {c:<{w}} " for c, w in zip(row, widths)) + "|")
    lines.append(sep)
    return "\n".join(lines)


class Statistics:
    """Tabular statistics printer (op-dtype summaries, tuning results).

    Parity: common/utils/utility.py:393-433 (reference), without the
    prettytable dependency.
    """

    def __init__(self, data: Iterable[Sequence[Any]], header: str,
                 field_names: Sequence[str]):
        self.data = list(data)
        self.header = header
        self.field_names = list(field_names)

    def print_stat(self) -> None:
        for line in _render_table(self.header, self.field_names, self.data).splitlines():
            logger.info(line)

    def __str__(self) -> str:
        return _render_table(self.header, self.field_names, self.data)


class Timer:
    """Context manager timing a block; exposes ``.elapsed`` in seconds."""

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        return False


class profile_trace:
    """Context manager around ``jax.profiler`` traces (the reference only
    has wall-time stage logs; SURVEY §5 asks for real traces).

    >>> with profile_trace("/tmp/trace"):
    ...     run_model()
    View with tensorboard or parse the trace.json.gz files under plugins/profile/.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", self.log_dir)
        return False
