"""Transformers-like one-liner API.

Parity target: reference ``_BaseINCAutoModelClass``/``AutoModelForCausalLM``
(neural_compressor/transformers/models/modeling_auto.py:92-828) and
``convert_to_quantized_model`` (transformers/quantization/utils.py:337-480):
``from_pretrained(path, quantization_config=...)`` loads a local HF
checkpoint into the NNX model zoo and quantizes it in one shot, with a
built-in calibration loop (``default_run_fn``). ``save_low_bit``/
``load_low_bit`` round-trip the quantized model.

Zero-egress note: the reference calibrates on NeelNanda/pile-10k pulled
from the Hub; here calibration data comes from (in order) an explicit
``calib_dataset`` (token array or list of texts + tokenizer), or synthetic
random tokens with a warning.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..common import logger
from ..models.hf_import import load_hf_model
from ..quantization import quantize, save as nq_save, load as nq_load
from ..algorithms.calib_capture import calibration_forward
from .quantization_config import _HFQuantBase

_CALIB_FREE = ("rtn",)


def default_run_fn(model, calib_ids: np.ndarray, batch_size: int = 8):
    """Built-in calibration loop (reference default_run_fn,
    transformers/quantization/utils.py:258-336)."""
    batches = [jnp.asarray(calib_ids[i:i + batch_size])
               for i in range(0, len(calib_ids), batch_size)]
    calibration_forward(model, batches)


def _resolve_calib_ids(model, quantization_config, calib_dataset, tokenizer,
                       max_seq_length: int, nsamples: int) -> np.ndarray:
    if calib_dataset is not None:
        if isinstance(calib_dataset, np.ndarray):
            return calib_dataset
        if isinstance(calib_dataset, (list, tuple)) and calib_dataset and \
                isinstance(calib_dataset[0], str):
            assert tokenizer is not None, "text calib data needs a tokenizer"
            # concatenate and chunk into FULL windows (the reference chunks
            # pile-10k the same way) — zero-padding ragged rows would feed
            # pad-position activations into the amax/Hessian observers
            stream: list[int] = []
            for t in calib_dataset:
                stream.extend(tokenizer(t, truncation=True,
                                        max_length=max_seq_length)
                              ["input_ids"])
            L = min(len(stream), max_seq_length)
            n_rows = max(len(stream) // L, 1)
            return np.asarray(stream[: n_rows * L],
                              dtype=np.int64).reshape(n_rows, L)
        return np.asarray(calib_dataset)
    vocab = getattr(getattr(model, "cfg", None), "vocab_size", 32000)
    logger.warning(
        "No calibration dataset given — using synthetic random tokens. "
        "Pass calib_dataset=... for faithful calibration statistics.")
    rng = np.random.default_rng(0)
    return rng.integers(0, vocab, (nsamples, min(max_seq_length, 512)))


def convert_to_quantized_model(model, quantization_config: _HFQuantBase,
                               calib_dataset=None, tokenizer=None,
                               max_seq_length: int = 2048,
                               batch_size: int = 8):
    """Map the HF-style config to the internal one and run the flow."""
    internal = quantization_config.to_internal()
    if quantization_config.quant_method in _CALIB_FREE:
        return quantize(model, internal)
    nsamples = getattr(quantization_config, "nsamples", 32)
    calib_ids = _resolve_calib_ids(model, quantization_config, calib_dataset,
                                   tokenizer, max_seq_length, nsamples)
    return quantize(model, internal,
                    run_fn=lambda m: default_run_fn(m, calib_ids, batch_size))


class AutoModelForCausalLM:
    """``from_pretrained``-style loader over the NNX model zoo."""

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path: str,
                        quantization_config: _HFQuantBase | None = None,
                        dtype=jnp.bfloat16, calib_dataset=None,
                        tokenizer=None, **kwargs):
        path = pretrained_model_name_or_path
        assert os.path.isdir(path), (
            f"{path!r} is not a local directory (this build is offline-only; "
            "download checkpoints out of band)")
        low_bit_cfg = os.path.join(path, "quant_config.json")
        if os.path.exists(low_bit_cfg) and quantization_config is None:
            return load_low_bit(path, dtype=dtype)
        # pre-quantized HF-ecosystem checkpoints route on the CHECKPOINT's
        # quant_method regardless of a passed config (reference
        # modeling_auto.py:337) — there are no fp tensors to re-quantize
        import json as _json

        with open(os.path.join(path, "config.json")) as f:
            qc = _json.load(f).get("quantization_config") or {}
        if qc.get("quant_method") == "awq":
            from ..quantization.save_load import load_hf_awq_checkpoint

            if quantization_config is not None:
                logger.warning(
                    "from_pretrained: %s is already AWQ-quantized — "
                    "loading its tensors as-is, ignoring the passed "
                    "quantization_config", path)
            return load_hf_awq_checkpoint(path, dtype=dtype)
        if qc.get("quant_method") == "gptq":
            from ..quantization.save_load import load_hf_gptq_checkpoint

            if quantization_config is not None:
                logger.warning(
                    "from_pretrained: %s is already GPTQ-quantized — "
                    "loading its tensors as-is, ignoring the passed "
                    "quantization_config", path)
            return load_hf_gptq_checkpoint(path, dtype=dtype)
        model = load_hf_model(path, dtype=dtype)
        if quantization_config is not None:
            model = convert_to_quantized_model(
                model, quantization_config, calib_dataset=calib_dataset,
                tokenizer=tokenizer, **{
                    k: v for k, v in kwargs.items()
                    if k in ("max_seq_length", "batch_size")})
        return model


def save_low_bit(model, save_directory: str, hf_model_dir: str | None = None):
    """Save the quantized modules + remember the fp skeleton source."""
    nq_save(model, save_directory)
    if hf_model_dir is not None:
        import json

        meta_path = os.path.join(save_directory, "skeleton.json")
        with open(meta_path, "w") as f:
            json.dump({"hf_model_dir": os.path.abspath(hf_model_dir)}, f)


def load_low_bit(save_directory: str, hf_model_dir: str | None = None,
                 dtype=jnp.bfloat16):
    """Rebuild a quantized model from ``save_low_bit`` output."""
    import json

    if hf_model_dir is None:
        meta_path = os.path.join(save_directory, "skeleton.json")
        assert os.path.exists(meta_path), (
            "load_low_bit needs hf_model_dir (fp skeleton source)")
        with open(meta_path) as f:
            hf_model_dir = json.load(f)["hf_model_dir"]
    skeleton = load_hf_model(hf_model_dir, dtype=dtype)
    return nq_load(save_directory, skeleton)
