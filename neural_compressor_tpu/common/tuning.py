"""Accuracy-driven tuning loop state machine.

Parity target: neural_compressor/common/base_tuning.py (reference, 587 LoC):
``ConfigSet`` / ``Sampler`` / ``ConfigLoader`` / ``TuningConfig`` /
``TuningMonitor`` / ``init_tuning`` and the stop rule
``eval >= baseline * (1 - tolerable_loss)`` (base_tuning.py:550-565).
Framework-agnostic; re-implemented from scratch.
"""

from __future__ import annotations

import copy
import math
import uuid
from typing import Any, Callable, Iterator, Sequence

from .config import BaseConfig
from .logger import TuningLogger, logger
from .utility import Statistics


class Evaluator:
    """Wraps one or several user eval functions into a single weighted score."""

    EVAL_FN = "eval_fn"
    WEIGHT = "weight"
    FN_NAME = "name"

    def __init__(self):
        self.eval_fn_registry: list[dict[str, Any]] = []

    def set_eval_fn_registry(self, user_eval_fns) -> None:
        if callable(user_eval_fns):
            entries = [{self.EVAL_FN: user_eval_fns, self.WEIGHT: 1.0,
                        self.FN_NAME: getattr(user_eval_fns, "__name__", "eval_fn")}]
        elif isinstance(user_eval_fns, dict):
            entries = [self._format(user_eval_fns)]
        else:
            entries = [self._format(fn) for fn in user_eval_fns]
        self.eval_fn_registry = entries

    def _format(self, fn_or_dict) -> dict[str, Any]:
        if callable(fn_or_dict):
            return {self.EVAL_FN: fn_or_dict, self.WEIGHT: 1.0,
                    self.FN_NAME: getattr(fn_or_dict, "__name__", "eval_fn")}
        assert self.EVAL_FN in fn_or_dict, "eval fn dict needs an 'eval_fn' key"
        return {
            self.EVAL_FN: fn_or_dict[self.EVAL_FN],
            self.WEIGHT: fn_or_dict.get(self.WEIGHT, 1.0),
            self.FN_NAME: fn_or_dict.get(
                self.FN_NAME, getattr(fn_or_dict[self.EVAL_FN], "__name__", "eval_fn")
            ),
        }

    def evaluate(self, model) -> float:
        return sum(
            entry[self.WEIGHT] * entry[self.EVAL_FN](model)
            for entry in self.eval_fn_registry
        )

    def self_check(self) -> None:
        assert self.eval_fn_registry, "no eval functions registered"


evaluator = Evaluator()


class ConfigSet:
    """An indexed set of candidate configs (each may still expand further)."""

    def __init__(self, config_list: list[BaseConfig]):
        self.config_list = config_list

    def __len__(self) -> int:
        return len(self.config_list)

    def __getitem__(self, idx: int) -> BaseConfig:
        return self.config_list[idx]

    @classmethod
    def _expand_all(cls, fwk_configs) -> list[BaseConfig]:
        if isinstance(fwk_configs, BaseConfig):
            return fwk_configs.expand()
        expanded: list[BaseConfig] = []
        for cfg in fwk_configs:
            expanded.extend(cfg.expand())
        return expanded

    @classmethod
    def from_fwk_configs(cls, fwk_configs) -> "ConfigSet":
        return cls(cls._expand_all(fwk_configs))


class Sampler:
    def __init__(self, config_source: ConfigSet | None):
        pass

    def __iter__(self) -> Iterator[int]:
        raise NotImplementedError


class SequentialSampler(Sampler):
    """Yields config indices in order."""

    def __init__(self, config_source: Sequence):
        self.config_source = config_source

    def __iter__(self) -> Iterator[int]:
        return iter(range(len(self.config_source)))

    def __len__(self) -> int:
        return len(self.config_source)


default_sampler = SequentialSampler


class ConfigLoader:
    def __init__(self, config_set, sampler: type | Sampler = default_sampler):
        self.config_set = (
            config_set if isinstance(config_set, ConfigSet)
            else ConfigSet.from_fwk_configs(config_set)
        )
        if isinstance(sampler, type):
            sampler = sampler(self.config_set)
        self.sampler = sampler

    def __iter__(self) -> Iterator[BaseConfig]:
        for index in self.sampler:
            yield self.config_set[index]

    def __len__(self) -> int:
        return len(self.config_set)


class TuningConfig:
    """User-facing tuning controls.

    Args:
        config_set: one or more ``BaseConfig`` (list-valued params expand).
        max_trials: stop after this many trials.
        tolerable_loss: relative accuracy loss accepted vs. the fp baseline.
        sampler: iteration order over the expanded config set.
    """

    def __init__(self, config_set=None, sampler=default_sampler,
                 tolerable_loss: float = 0.01, max_trials: int = 100):
        self.config_set = config_set
        self.sampler = sampler
        self.tolerable_loss = tolerable_loss
        self.max_trials = max_trials


class _TrialRecord:
    def __init__(self, trial_index: int, trial_result: float, quant_config: BaseConfig):
        self.trial_index = trial_index
        self.trial_result = trial_result
        self.quant_config = quant_config
        self.id = str(uuid.uuid4())


class TuningMonitor:
    def __init__(self, tuning_config: TuningConfig):
        self.tuning_config = tuning_config
        self.trial_records: list[_TrialRecord] = []
        self.baseline: float | None = None
        self._history_path: str | None = None
        self._resumed: dict[str, float] = {}

    # ------------------------------------------------ workspace persistence
    def attach_workspace(self, workspace: str, resume: bool = False) -> None:
        """Persist per-trial history to ``workspace/tuning_history.json``;
        with ``resume`` pre-load previous results so already-evaluated
        configs are skipped (reference options.resume_from semantics,
        common/base_config.py:916-972)."""
        import json as _json
        import os as _os

        _os.makedirs(workspace, exist_ok=True)
        self._history_path = _os.path.join(workspace, "tuning_history.json")
        if resume and _os.path.exists(self._history_path):
            with open(self._history_path) as f:
                data = _json.load(f)
            self.baseline = data.get("baseline")
            self._resumed = {e["config"]: e["result"]
                             for e in data.get("trials", [])}
            logger.info("Resumed %d prior trial results from %s",
                        len(self._resumed), self._history_path)

    def lookup_resumed(self, quant_config) -> float | None:
        """Prior result for this exact config (class+white_list+params), or
        None. A recorded failure (non-finite score) also returns None so an
        environmental failure in one session doesn't permanently exclude
        the config from the search."""
        prior = self._resumed.get(quant_config.identity_json())
        if prior is None or not math.isfinite(prior):
            return None
        return prior

    def _persist(self) -> None:
        if self._history_path is None:
            return
        import json as _json

        # merge: resumed entries not re-encountered this session must
        # survive an interrupted/reordered resume run
        merged = dict(self._resumed)
        for r in self.trial_records:
            merged[r.quant_config.identity_json()] = r.trial_result
        data = {
            "baseline": self.baseline,
            "trials": [
                {"result": res, "config": key}
                for key, res in merged.items()
            ],
        }
        with open(self._history_path, "w") as f:
            _json.dump(data, f, indent=2)

    def set_baseline(self, baseline: float) -> None:
        self.baseline = baseline
        logger.info("Fp-model baseline: %.6f", baseline)

    def add_trial_result(self, trial_index: int, trial_result: float,
                         quant_config: BaseConfig) -> None:
        self.trial_records.append(_TrialRecord(trial_index, trial_result, quant_config))
        self._persist()
        self.print_config_diff(quant_config)
        rows = [[r.trial_index, f"{r.trial_result:.6f}"] for r in self.trial_records]
        Statistics(rows, header="Tuning trials",
                   field_names=["Trial", "Result"]).print_stat()

    def print_config_diff(self, config: BaseConfig) -> None:
        logger.info("Trial config: %s", config)

    def get_number_of_trials(self) -> int:
        return len(self.trial_records)

    def get_best_trial_record(self) -> _TrialRecord:
        """Best FINITE-scoring trial (a NaN eval in the first trial would
        otherwise win ``max`` — NaN comparisons are always False)."""
        assert self.trial_records, "no trials recorded"
        finite = [r for r in self.trial_records
                  if math.isfinite(r.trial_result)]
        if not finite:
            return max(self.trial_records, key=lambda r: r.trial_result)
        return max(finite, key=lambda r: r.trial_result)

    def get_best_quant_config(self) -> BaseConfig:
        return self.get_best_trial_record().quant_config

    def need_stop(self) -> bool:
        """Stop rule (reference base_tuning.py:550-565): meet the accuracy
        goal relative to baseline, or exhaust max_trials."""
        if self.baseline is not None and self.trial_records:
            latest = self.trial_records[-1].trial_result
            if latest >= self.baseline * (1 - self.tuning_config.tolerable_loss):
                logger.info(
                    "Accuracy goal met (%.6f >= %.6f); stopping tuning.",
                    latest, self.baseline * (1 - self.tuning_config.tolerable_loss))
                return True
        if self.get_number_of_trials() >= self.tuning_config.max_trials:
            logger.info("Reached max_trials (%d); stopping tuning.",
                        self.tuning_config.max_trials)
            return True
        return False


def init_tuning(tuning_config: TuningConfig):
    """Build the (loader, logger, monitor) triple for a tuning session."""
    config_loader = ConfigLoader(tuning_config.config_set, tuning_config.sampler)
    tuning_logger = TuningLogger()
    tuning_monitor = TuningMonitor(tuning_config)
    return config_loader, tuning_logger, tuning_monitor
