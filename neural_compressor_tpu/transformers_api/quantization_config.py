"""HF-transformers-style quantization config classes.

Parity target: neural_compressor/transformers/utils/quantization_config.py
:242-457 — the user-facing config names and knobs of the reference's
transformers-like API, mapped onto this framework's internal configs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from ..quantization import config as iq


@dataclasses.dataclass
class _HFQuantBase:
    bits: int = 4
    group_size: int = 32
    sym: bool = True
    compute_dtype: str = "bf16"
    quant_method: str = "base"

    def _dtype(self) -> str:
        return f"int{self.bits}"

    def to_internal(self) -> Any:
        raise NotImplementedError

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclasses.dataclass
class RtnConfig(_HFQuantBase):
    quant_method: str = "rtn"
    use_full_range: bool = False
    use_mse_search: bool = False

    def to_internal(self):
        return iq.RTNConfig(dtype=self._dtype(), use_sym=self.sym,
                            group_size=self.group_size,
                            use_full_range=self.use_full_range,
                            use_mse_search=self.use_mse_search)


@dataclasses.dataclass
class GPTQConfig(_HFQuantBase):
    quant_method: str = "gptq"
    damp_percent: float = 0.01
    desc_act: bool = False
    blocksize: int = 128
    nsamples: int = 128
    static_groups: bool = False
    true_sequential: bool = False

    def to_internal(self):
        return iq.GPTQConfig(dtype=self._dtype(), use_sym=self.sym,
                             group_size=self.group_size,
                             act_order=self.desc_act,
                             percdamp=self.damp_percent,
                             block_size=self.blocksize,
                             nsamples=self.nsamples,
                             static_groups=self.static_groups,
                             true_sequential=self.true_sequential)


@dataclasses.dataclass
class AwqConfig(_HFQuantBase):
    quant_method: str = "awq"
    # AutoAWQ convention: zero_point=True means ASYMMETRIC quantization —
    # so this class's `sym` default flips to False to stay consistent
    sym: bool = False
    zero_point: bool = True
    auto_scale: bool = True
    auto_clip: bool = True

    def to_internal(self):
        if self.sym == self.zero_point:
            raise ValueError(
                f"AwqConfig: sym={self.sym} contradicts zero_point="
                f"{self.zero_point} (zero_point means asymmetric); "
                "set sym=True with zero_point=False, or leave both at "
                "their defaults")
        return iq.AWQConfig(dtype=self._dtype(), use_sym=self.sym,
                            group_size=self.group_size,
                            use_auto_scale=self.auto_scale,
                            use_auto_clip=self.auto_clip)


@dataclasses.dataclass
class TeqConfig(_HFQuantBase):
    quant_method: str = "teq"
    train_steps: int = 100
    lr: float = 1e-3

    def to_internal(self):
        return iq.TEQConfig(dtype=self._dtype(), use_sym=self.sym,
                            group_size=self.group_size,
                            train_steps=self.train_steps, lr=self.lr)


@dataclasses.dataclass
class AutoRoundConfig(_HFQuantBase):
    quant_method: str = "autoround"
    iters: int = 200
    lr: float | None = None
    nsamples: int = 128
    seqlen: int = 2048

    def to_internal(self):
        return iq.AutoRoundConfig(dtype=self._dtype(), use_sym=self.sym,
                                  group_size=self.group_size,
                                  iters=self.iters, lr=self.lr,
                                  nsamples=self.nsamples, seqlen=self.seqlen)
