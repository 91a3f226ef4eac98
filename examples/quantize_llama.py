"""Quantize a Llama checkpoint and serve it.

Usage:
  python examples/quantize_llama.py --hf-dir /path/to/llama --algo gptq
  python examples/quantize_llama.py --preset llama2-7b --algo rtn  # random init
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import argparse

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.algorithms.calib_capture import calibration_forward
from neural_compressor_tpu.generation import generate
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.models.hf_import import load_hf_llama

ALGOS = {
    "rtn": lambda a: nq.RTNConfig(dtype=a.dtype, group_size=a.group_size),
    "gptq": lambda a: nq.GPTQConfig(dtype=a.dtype, group_size=a.group_size),
    "awq": lambda a: nq.AWQConfig(dtype=a.dtype, group_size=a.group_size),
    "hqq": lambda a: nq.HQQConfig(dtype=a.dtype, group_size=a.group_size),
    "smooth_quant": lambda a: nq.SmoothQuantConfig(alpha=0.5),
    "fp8": lambda a: nq.FP8Config(),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hf-dir", default=None)
    ap.add_argument("--preset", default="llama-test")
    ap.add_argument("--algo", default="rtn", choices=sorted(ALGOS))
    ap.add_argument("--dtype", default="int4")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    model = (load_hf_llama(args.hf_dir) if args.hf_dir
             else LlamaForCausalLM.from_preset(args.preset))
    cfg = ALGOS[args.algo](args)

    needs_calib = args.algo in ("gptq", "awq", "smooth_quant", "fp8")
    if needs_calib:
        rng = np.random.default_rng(0)
        calib = [jnp.asarray(rng.integers(0, model.cfg.vocab_size, (4, 128)))
                 for _ in range(8)]
        if args.algo == "fp8":
            run_fn = lambda m: [m(b) for b in calib]
        else:
            run_fn = lambda m: calibration_forward(m, calib)
        qmodel = nq.quantize(model, cfg, run_fn=run_fn)
    else:
        qmodel = nq.quantize(model, cfg)

    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, model.cfg.vocab_size, (1, 8)))
    out = generate(qmodel, ids, max_new_tokens=16)
    print("generated:", np.asarray(out)[0].tolist())
    if args.save:
        nq.save(qmodel, args.save)
        print("saved to", args.save)


if __name__ == "__main__":
    main()
