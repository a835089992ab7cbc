"""Export trained DCSE params back to the reference's .pt format.

The inverse of torch_import: a model trained in this framework can be
handed to someone still running the PyTorch reference (its ``load_model``,
conformer_pipeline.py:628-649, consumes the produced file). Requires the
model to have been trained with ``conv_norm="batch"`` (the reference's
BatchNorm) — models trained with the default LayerNorm conv module have no
torch-side equivalent and are rejected.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _linear(sd: Dict, prefix: str, p: Dict):
    sd[f"{prefix}.weight"] = _t(p["kernel"]).T
    sd[f"{prefix}.bias"] = _t(p["bias"])


def _layernorm(sd: Dict, prefix: str, p: Dict):
    sd[f"{prefix}.weight"] = _t(p["scale"])
    sd[f"{prefix}.bias"] = _t(p["bias"])


def export_dcse_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Our SpeechEnhancer(conv_norm='batch') variables → reference
    state-dict arrays (NumPy; tensorize at save time)."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    _layernorm(sd, "input_norm", params["input_norm"])
    _linear(sd, "input_proj", params["input_proj"])
    _layernorm(sd, "output_norm", params["output_norm"])
    _linear(sd, "mag_head", params["mag_head"])
    _linear(sd, "phase_head", params["phase_head"])

    blocks = sorted(k for k in params if k.startswith("block_"))
    for bk in blocks:
        i = int(bk.split("_")[1])
        bp = params[bk]
        if "bn" not in bp.get("ConvolutionModule_0", {}):
            raise ValueError(
                "export requires conv_norm='batch' (reference BatchNorm); "
                f"{bk} has no bn parameters")
        p = f"blocks.{i}"
        for our, theirs in (("FeedForwardModule_0", "ff1"),
                            ("FeedForwardModule_1", "ff2")):
            _layernorm(sd, f"{p}.{theirs}.layer_norm",
                       bp[our]["LayerNorm_0"])
            _linear(sd, f"{p}.{theirs}.linear1", bp[our]["Dense_0"])
            _linear(sd, f"{p}.{theirs}.linear2", bp[our]["Dense_1"])

        mhsa = bp["MultiHeadSelfAttention_0"]
        _layernorm(sd, f"{p}.mhsa.layer_norm", mhsa["LayerNorm_0"])
        sd[f"{p}.mhsa.attention.in_proj_weight"] = _t(
            mhsa["qkv"]["kernel"]).T
        sd[f"{p}.mhsa.attention.in_proj_bias"] = _t(mhsa["qkv"]["bias"])
        _linear(sd, f"{p}.mhsa.attention.out_proj", mhsa["out"])

        conv = bp["ConvolutionModule_0"]
        _layernorm(sd, f"{p}.conv.layer_norm", conv["LayerNorm_0"])
        sd[f"{p}.conv.pointwise1.weight"] = _t(
            conv["pointwise1"]["kernel"]).T[:, :, None]
        sd[f"{p}.conv.pointwise1.bias"] = _t(conv["pointwise1"]["bias"])
        sd[f"{p}.conv.depthwise.weight"] = _t(
            conv["depthwise"]["kernel"]).transpose(2, 1, 0)
        sd[f"{p}.conv.depthwise.bias"] = _t(conv["depthwise"]["bias"])
        sd[f"{p}.conv.batch_norm.weight"] = _t(conv["bn"]["scale"])
        sd[f"{p}.conv.batch_norm.bias"] = _t(conv["bn"]["bias"])
        bs = batch_stats.get(bk, {}).get("ConvolutionModule_0", {}).get(
            "bn", {})
        d = sd[f"{p}.conv.batch_norm.weight"].shape[0]
        sd[f"{p}.conv.batch_norm.running_mean"] = _t(
            bs.get("mean", np.zeros(d)))
        sd[f"{p}.conv.batch_norm.running_var"] = _t(
            bs.get("var", np.ones(d)))
        sd[f"{p}.conv.batch_norm.num_batches_tracked"] = np.asarray(
            0, np.int64)
        sd[f"{p}.conv.pointwise2.weight"] = _t(
            conv["pointwise2"]["kernel"]).T[:, :, None]
        sd[f"{p}.conv.pointwise2.bias"] = _t(conv["pointwise2"]["bias"])

        _layernorm(sd, f"{p}.final_norm", bp["LayerNorm_0"])
    return sd


def save_reference_checkpoint(variables: Dict, path: str):
    """Write a reference-format .pt (conformer_pipeline.py:618-626)."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          if isinstance(v, np.ndarray) and v.ndim > 0
          else torch.tensor(v)
          for k, v in export_dcse_state_dict(variables).items()}
    torch.save({"model_state": sd, "model_class": "SpeechEnhancer"}, path)
    return path
