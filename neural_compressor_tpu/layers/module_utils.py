"""Generic NNX module graph walking and in-place replacement.

The functional analog of the reference's ``model.named_modules()`` walks and
``set_module`` (neural_compressor/torch/utils/utility.py), over ``nnx.Module``
object graphs including ``nnx.List`` / ``nnx.Dict`` containers.
"""

from __future__ import annotations

from typing import Iterator

from flax import nnx


def module_type_name(module) -> str:
    return type(module).__name__


def _children(module: nnx.Module) -> Iterator[tuple[str, nnx.Module]]:
    if isinstance(module, nnx.List):
        for i, item in enumerate(module):
            if isinstance(item, nnx.Module):
                yield str(i), item
        return
    if isinstance(module, nnx.Dict):
        for k in module:
            item = module[k]
            if isinstance(item, nnx.Module):
                yield str(k), item
        return
    for attr, value in vars(module).items():
        if str(attr).startswith("_"):
            continue
        if isinstance(value, nnx.Module):
            yield str(attr), value
        elif isinstance(value, (list, tuple)):
            for i, item in enumerate(value):
                if isinstance(item, nnx.Module):
                    yield f"{attr}.{i}", item
        elif isinstance(value, dict):
            for k, item in value.items():
                if isinstance(item, nnx.Module):
                    yield f"{attr}.{k}", item


def named_modules(model: nnx.Module, prefix: str = "") -> Iterator[tuple[str, nnx.Module]]:
    """Yield ``(dotted_path, module)`` for every submodule, depth-first,
    including the root (path '')."""
    yield prefix, model
    for name, child in _children(model):
        path = f"{prefix}.{name}" if prefix else name
        yield from named_modules(child, path)


def get_model_info(model: nnx.Module,
                   op_types: tuple[str, ...] | None = None) -> list[tuple[str, str]]:
    """``[(op_name, op_type), ...]`` for quantizable ops.

    Parity: reference ``get_model_info`` (torch/quantization/config.py:249) —
    walk modules, filter by type name.
    """
    info = []
    for name, mod in named_modules(model):
        if not name:
            continue
        t = module_type_name(mod)
        if op_types is None or t in op_types:
            info.append((name, t))
    return info


def _step(container, part: str):
    if isinstance(container, (nnx.List,)) or (
        not isinstance(container, nnx.Module)
        and isinstance(container, (list, tuple))
    ):
        return container[int(part)]
    if isinstance(container, nnx.Dict) or (
        not isinstance(container, nnx.Module) and isinstance(container, dict)
    ):
        return container[part]
    return getattr(container, part)


def get_module(model: nnx.Module, path: str) -> nnx.Module:
    mod = model
    if not path:
        return mod
    for part in path.split("."):
        mod = _step(mod, part)
    return mod


def replace_module(model: nnx.Module, path: str, new_module: nnx.Module) -> None:
    """Replace the submodule at ``path`` (dotted; container indices as
    numbers/keys)."""
    parts = path.split(".")
    container = model
    for part in parts[:-1]:
        container = _step(container, part)
    last = parts[-1]
    if isinstance(container, nnx.List) or (
        not isinstance(container, nnx.Module) and isinstance(container, list)
    ):
        container[int(last)] = new_module
    elif isinstance(container, nnx.Dict) or (
        not isinstance(container, nnx.Module) and isinstance(container, dict)
    ):
        container[last] = new_module
    else:
        setattr(container, last, new_module)
