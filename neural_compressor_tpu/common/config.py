"""Config core: algorithm configs with per-op overrides and tuning expansion.

Semantics matched to the reference's ``BaseConfig``/``ConfigRegistry``
(neural_compressor/common/base_config.py:57-698):

* every config has a *global* parameter set plus *local* per-op overrides
  keyed by op-name regex or op-type name;
* any tunable parameter given as a **list** becomes a tuning dimension —
  ``expand()`` takes the Cartesian product to generate trial configs;
* ``to_config_mapping(model_info)`` resolves ``{(op_name, op_type): config}``;
* configs compose with ``+`` into a ``ComposableConfig``;
* a priority-ordered registry (``register_config``) drives default autotune
  config sets.

Implementation is from scratch (plain Python, no pydantic), designed for a
functional JAX stack: configs are immutable-ish plain objects that are cheap
to copy and hash-serialize.
"""

from __future__ import annotations

import copy
import inspect
import itertools
import json
import re
from typing import Any, Callable, Iterable, Mapping, Sequence

from .logger import logger

# A single shared "framework" namespace — this library only targets JAX/TPU.
FRAMEWORK_NAME = "jax_tpu"

DEFAULT_WHITE_LIST = "*"


class ConfigRegistry:
    """Priority-ordered registry of config classes per algorithm name."""

    def __init__(self):
        self._configs: dict[str, dict[str, Any]] = {}

    def register(self, algo_name: str, priority: float = 0) -> Callable:
        def decorator(config_cls):
            self._configs[algo_name] = {"cls": config_cls, "priority": priority}
            config_cls.name = algo_name
            return config_cls

        return decorator

    def get_all_configs(self) -> dict[str, Any]:
        return dict(self._configs)

    def get_cls_configs(self) -> dict[str, type]:
        return {name: v["cls"] for name, v in self._configs.items()}

    def get_sorted_configs(self) -> list[tuple[str, type]]:
        """Algorithm (name, cls) pairs sorted by priority, highest first."""
        return [
            (name, v["cls"])
            for name, v in sorted(
                self._configs.items(), key=lambda kv: -kv[1]["priority"]
            )
        ]

    def get_config_cls_by_name(self, algo_name: str) -> type | None:
        entry = self._configs.get(algo_name)
        return entry["cls"] if entry else None


config_registry = ConfigRegistry()


def register_config(algo_name: str, priority: float = 0) -> Callable:
    """Class decorator: register a config class for ``algo_name``."""
    return config_registry.register(algo_name, priority=priority)


class BaseConfig:
    """Base class for all algorithm configs.

    Subclasses declare:
      * ``name``: algorithm name (set by ``register_config``),
      * ``params_list``: names of tunable parameters (list-valued values of
        these become tuning dimensions),
      * ``supported_op_types()``: op types this algorithm applies to.
    """

    name: str = "base"
    params_list: tuple[str, ...] = ()

    def __init__(self, white_list: Sequence[str] | str | None = DEFAULT_WHITE_LIST):
        self._local_configs: dict[str, BaseConfig] = {}
        if isinstance(white_list, str) and white_list != DEFAULT_WHITE_LIST:
            # a bare string would be iterated character-by-character below
            white_list = [white_list]
        self.white_list = white_list

    # -------------------------------------------------- local overrides
    def set_local(self, operator_pattern: str | type, config: "BaseConfig") -> "BaseConfig":
        """Attach a per-op override. ``operator_pattern`` is an op-name regex
        (fullmatch or prefix) or an op-type name."""
        key = operator_pattern if isinstance(operator_pattern, str) else operator_pattern.__name__
        if key in self._local_configs:
            logger.warning("Overwriting local config for %s", key)
        self._local_configs[key] = config
        return self

    @property
    def local_config(self) -> dict[str, "BaseConfig"]:
        return self._local_configs

    # -------------------------------------------------- (de)serialization
    def _param_names(self) -> list[str]:
        return [
            k for k in self.__dict__
            if not k.startswith("_") and k not in ("white_list",)
        ]

    def to_dict(self) -> dict[str, Any]:
        result: dict[str, Any] = {}
        global_cfg = {k: getattr(self, k) for k in self._param_names()}
        if self._local_configs:
            result["global"] = global_cfg
            result["local"] = {
                name: cfg.to_dict() for name, cfg in self._local_configs.items()
            }
        else:
            result = global_cfg
        return result

    @classmethod
    def from_dict(cls, config_dict: Mapping[str, Any]) -> "BaseConfig":
        if "global" not in config_dict:
            return cls(**config_dict)
        cfg = cls(**config_dict["global"])
        for name, local in config_dict.get("local", {}).items():
            cfg.set_local(name, cls.from_dict(local))
        return cfg

    def to_json_string(self, use_diff: bool = False) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    def identity(self) -> dict:
        """Full identity of this config — class, white_list AND params —
        for equality and tuning-resume keys (``to_dict`` alone omits the
        class and white_list, so distinct configs would collide)."""
        return {"class": type(self).__name__,
                "white_list": self.white_list,
                "params": self.to_dict()}

    def identity_json(self) -> str:
        return json.dumps(self.identity(), sort_keys=True, default=str)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.to_dict()})"

    def __eq__(self, other) -> bool:
        return (isinstance(other, BaseConfig)
                and self.identity() == other.identity())

    # -------------------------------------------------- composition
    def __add__(self, other: "BaseConfig") -> "ComposableConfig":
        if isinstance(other, ComposableConfig):
            return ComposableConfig([self, *other.config_list])
        return ComposableConfig([self, other])

    # -------------------------------------------------- tuning expansion
    @classmethod
    def _expected_param_type(cls, name: str) -> type | None:
        """Scalar type a tuning dimension's candidates must have, inferred
        from the class default in ``__init__`` (the reference declares these
        as pydantic TuningParam types — common/tuning_param.py:108-128)."""
        try:
            default = inspect.signature(cls.__init__).parameters[name].default
        except (KeyError, ValueError):  # pragma: no cover - dynamic configs
            return None
        if default is None or default is inspect.Parameter.empty:
            return None
        return type(default)

    def _check_tuning_value(self, name: str, value, expected: type | None,
                            candidate: bool) -> None:
        """Loudly reject a malformed tuning value instead of silently
        tuning over garbage (e.g. the characters of a string where a list
        of ints was expected, or a str "128" for an int group_size)."""
        if expected is None:
            return
        ok = isinstance(value, expected)
        if expected is not bool and isinstance(value, bool):
            ok = False  # bool is an int subclass; True for group_size is a bug
        elif expected is float and isinstance(value, int):
            ok = True   # ints are fine where floats are expected (alpha=1)
        if not ok:
            kind = "tuning candidate" if candidate else "value"
            raise ValueError(
                f"{type(self).__name__}.{name}: {kind} {value!r} has type "
                f"{type(value).__name__}, expected {expected.__name__} "
                f"(give a list of {expected.__name__} to tune this param)")

    def validate_params(self) -> None:
        """Type-check every tunable param (scalar or list of candidates)
        against the class default's type. Called by ``expand()`` so a
        malformed tuning space fails before any trial runs."""
        for p in self.params_list:
            v = getattr(self, p, None)
            if v is None:
                continue
            expected = self._expected_param_type(p)
            if isinstance(v, (list, tuple)):
                if len(v) == 0:
                    raise ValueError(
                        f"{type(self).__name__}.{p}: empty tuning list")
                for cand in v:
                    self._check_tuning_value(p, cand, expected, True)
            else:
                self._check_tuning_value(p, v, expected, False)

    def expand(self) -> list["BaseConfig"]:
        """Cartesian product over tunable params given as lists.

        Matches reference semantics (common/base_config.py:491-567): only
        parameters named in ``params_list`` are treated as tuning dimensions,
        and candidates are type-validated like the reference's pydantic
        TuningParam check (common/tuning_param.py:108-128).
        """
        self.validate_params()
        tunable: dict[str, list] = {}
        for p in self.params_list:
            v = getattr(self, p, None)
            if isinstance(v, (list, tuple)) and not isinstance(v, str):
                tunable[p] = list(v)
        if not tunable:
            return [self]
        keys = list(tunable)
        configs = []
        for combo in itertools.product(*(tunable[k] for k in keys)):
            new = copy.deepcopy(self)
            for k, val in zip(keys, combo):
                setattr(new, k, val)
            configs.append(new)
        logger.info("Expanded %s into %d trial configs over %s",
                    type(self).__name__, len(configs), keys)
        return configs

    # -------------------------------------------------- op mapping
    @classmethod
    def supported_op_types(cls) -> tuple[str, ...]:
        return ("Linear",)

    def _match(self, pattern: str, op_name: str, op_type: str) -> bool:
        """Pattern semantics: exact op-type name, exact op name, regex
        fullmatch, or a regex match spanning whole dotted segments —
        ``"layers.1"`` matches ``model.layers.1.mlp.up_proj`` but NOT
        ``model.layers.10...`` (plain ``re.search`` would)."""
        if pattern == op_type or pattern == op_name:
            return True
        try:
            if re.fullmatch(pattern, op_name):
                return True
            for m in re.finditer(pattern, op_name):
                at_start = m.start() == 0 or op_name[m.start() - 1] == "."
                at_end = m.end() == len(op_name) or op_name[m.end()] == "."
                if at_start and at_end and m.end() > m.start():
                    return True
        except re.error:
            pass
        return False

    def to_config_mapping(
        self, model_info: Sequence[tuple[str, str]]
    ) -> dict[tuple[str, str], "BaseConfig"]:
        """Resolve per-op configs.

        ``model_info`` is ``[(op_name, op_type), ...]`` as produced by
        ``get_model_info`` on an nnx model. Local overrides win over the
        global config; a white_list other than "*" restricts coverage.
        """
        mapping: dict[tuple[str, str], BaseConfig] = {}
        for op_name, op_type in model_info:
            if op_type not in self.supported_op_types():
                continue
            wl = self.white_list
            if (wl is not None and wl != DEFAULT_WHITE_LIST
                    and DEFAULT_WHITE_LIST not in wl):  # ["*"] = no filter
                if not any(self._match(p, op_name, op_type) for p in wl):
                    continue
            cfg: BaseConfig = self
            for pattern, local in self._local_configs.items():
                if self._match(pattern, op_name, op_type):
                    cfg = local
                    break
            mapping[(op_name, op_type)] = cfg
        return mapping

    # -------------------------------------------------- default tuning set
    @classmethod
    def get_config_set_for_tuning(cls) -> "BaseConfig | list[BaseConfig]":
        return cls()


class ComposableConfig(BaseConfig):
    """Several algorithm configs applied together (e.g. WOQ + KV-cache)."""

    name = "composable"

    def __init__(self, config_list: list[BaseConfig]):
        super().__init__()
        self.config_list = list(config_list)

    def __add__(self, other: BaseConfig) -> "ComposableConfig":
        if isinstance(other, ComposableConfig):
            return ComposableConfig([*self.config_list, *other.config_list])
        return ComposableConfig([*self.config_list, other])

    def to_dict(self) -> dict[str, Any]:
        return {cfg.name: cfg.to_dict() for cfg in self.config_list}

    def identity(self) -> dict:
        # a dict keyed by cfg.name would silently drop same-algorithm
        # members (e.g. two RTN configs over disjoint white_lists)
        return {"class": "ComposableConfig",
                "members": [cfg.identity() for cfg in self.config_list]}

    def expand(self) -> list[BaseConfig]:
        expanded = [cfg.expand() for cfg in self.config_list]
        return [ComposableConfig(list(combo)) for combo in itertools.product(*expanded)]

    def to_config_mapping(self, model_info):
        mapping: dict[tuple[str, str], BaseConfig] = {}
        for cfg in self.config_list:
            mapping.update(cfg.to_config_mapping(model_info))
        return mapping


def get_all_config_set_from_config_registry() -> list[BaseConfig]:
    """Default autotune set: each registered algo's tuning config set,
    priority order (highest first)."""
    result: list[BaseConfig] = []
    for _, cls in config_registry.get_sorted_configs():
        cfg_set = cls.get_config_set_for_tuning()
        if cfg_set is None:
            continue
        if isinstance(cfg_set, list):
            result.extend(cfg_set)
        else:
            result.append(cfg_set)
    return result
