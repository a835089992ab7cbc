"""Import reference PyTorch checkpoints into this framework.

A user of the reference can load their trained ``saved_models/*.pt`` files
directly:

  * ``dnn_{mask}_final.pt`` / ``best_{mask}.pt`` (reference
    training/pipeline.py:774-791) → :func:`import_dnn_state_dict` →
    params for :class:`models.dnn.SpeechEnhancementDNN`;
  * ``conformer_final.pt`` / ``best_conformer.pt``
    (conformer_pipeline.py:611-626) → :func:`import_dcse_state_dict` →
    (params, batch_stats) for :class:`models.dcse.SpeechEnhancer`
    constructed with ``conv_norm="batch"`` (the reference's BatchNorm).

Weight-layout conventions handled: torch Linear (out,in) → Dense (in,out);
torch MultiheadAttention packed in_proj (3d,d) → fused qkv kernel (d,3d);
torch Conv1d (out,in/groups,k) → flax Conv (k,in/groups,out); BatchNorm
running stats → flax batch_stats collection.

Only NumPy is needed at import time (state dicts are converted from
detached tensors); torch itself is only required to unpickle ``.pt`` files.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _layernorm(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def import_dnn_state_dict(state_dict: Dict,
                          num_hidden_layers: int = 3) -> Dict:
    """Reference ``SpeechEnhancementDNN.network`` Sequential →
    our named-layer params (models/dnn.py). Sequential index layout:
    Linear at 0, 3, 6, ... and the output Linear last (dnn.py:54-71)."""
    params = {}
    for i in range(num_hidden_layers):
        params[f"hidden_{i}"] = _linear(state_dict, f"network.{3 * i}")
    params["output"] = _linear(state_dict,
                               f"network.{3 * num_hidden_layers}")
    return {"params": params}


def _conformer_block(sd: Dict, p: str) -> Tuple[Dict, Dict]:
    """One reference ConformerBlock (models/conformer.py:131-151) →
    (params, batch_stats) subtrees matching our ConformerBlock naming."""
    params: Dict = {}
    stats: Dict = {}

    for our, theirs in (("FeedForwardModule_0", "ff1"),
                        ("FeedForwardModule_1", "ff2")):
        params[our] = {
            "LayerNorm_0": _layernorm(sd, f"{p}.{theirs}.layer_norm"),
            "Dense_0": _linear(sd, f"{p}.{theirs}.linear1"),
            "Dense_1": _linear(sd, f"{p}.{theirs}.linear2"),
        }

    in_w = _np(sd[f"{p}.mhsa.attention.in_proj_weight"])     # (3d, d)
    in_b = _np(sd[f"{p}.mhsa.attention.in_proj_bias"])       # (3d,)
    params["MultiHeadSelfAttention_0"] = {
        "LayerNorm_0": _layernorm(sd, f"{p}.mhsa.layer_norm"),
        "qkv": {"kernel": in_w.T, "bias": in_b},
        "out": _linear(sd, f"{p}.mhsa.attention.out_proj"),
    }

    pw1 = _np(sd[f"{p}.conv.pointwise1.weight"])             # (2d, d, 1)
    pw2 = _np(sd[f"{p}.conv.pointwise2.weight"])             # (d, d, 1)
    dw = _np(sd[f"{p}.conv.depthwise.weight"])               # (d, 1, k)
    conv_params = {
        "LayerNorm_0": _layernorm(sd, f"{p}.conv.layer_norm"),
        "pointwise1": {"kernel": pw1[:, :, 0].T,
                       "bias": _np(sd[f"{p}.conv.pointwise1.bias"])},
        "depthwise": {"kernel": dw.transpose(2, 1, 0),       # (k, 1, d)
                      "bias": _np(sd[f"{p}.conv.depthwise.bias"])},
        "bn": {"scale": _np(sd[f"{p}.conv.batch_norm.weight"]),
               "bias": _np(sd[f"{p}.conv.batch_norm.bias"])},
        "pointwise2": {"kernel": pw2[:, :, 0].T,
                       "bias": _np(sd[f"{p}.conv.pointwise2.bias"])},
    }
    params["ConvolutionModule_0"] = conv_params
    stats["ConvolutionModule_0"] = {
        "bn": {"mean": _np(sd[f"{p}.conv.batch_norm.running_mean"]),
               "var": _np(sd[f"{p}.conv.batch_norm.running_var"])}}

    params["LayerNorm_0"] = _layernorm(sd, f"{p}.final_norm")
    return params, stats


def import_dcse_state_dict(state_dict: Dict,
                           num_blocks: int = 4) -> Dict:
    """Reference DCSE ``SpeechEnhancer`` (conformer_pipeline.py:218-301) →
    variables for our SpeechEnhancer(conv_norm="batch")."""
    params: Dict = {
        "input_norm": _layernorm(state_dict, "input_norm"),
        "input_proj": _linear(state_dict, "input_proj"),
        "output_norm": _layernorm(state_dict, "output_norm"),
        "mag_head": _linear(state_dict, "mag_head"),
        "phase_head": _linear(state_dict, "phase_head"),
    }
    batch_stats: Dict = {}
    for i in range(num_blocks):
        bp, bs = _conformer_block(state_dict, f"blocks.{i}")
        params[f"block_{i}"] = bp
        batch_stats[f"block_{i}"] = bs
    return {"params": params, "batch_stats": batch_stats}


def _torch_load_safe(path: str, allow_pickle: bool):
    """``torch.load`` without arbitrary code execution by default.

    ``weights_only=True`` is tried first, with numpy types allow-listed
    (reference DNN checkpoints carry ``feat_mean``/``feat_std`` numpy
    arrays, pipeline.py:765-772). Full unpickling — which executes
    arbitrary pickle code — requires the caller's explicit
    ``allow_pickle=True`` opt-in; auto-discovery paths never set it.
    """
    import torch
    safe = [np.ndarray, np.dtype]
    _ma = getattr(getattr(np, "_core", None) or getattr(np, "core", np),
                  "multiarray", None)
    fn = getattr(_ma, "_reconstruct", None)
    if fn is not None:
        safe.append(fn)
    try:
        from numpy import dtypes as _npdtypes
        safe.extend(v for v in vars(_npdtypes).values()
                    if isinstance(v, type))
    except ImportError:  # numpy < 1.25
        pass
    try:
        with torch.serialization.safe_globals(safe):
            return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise ValueError(
                f"{path} could not be loaded in safe (weights-only) mode: "
                f"{e}. If you trust this checkpoint, pass "
                f"allow_pickle=True to opt in to full unpickling.") from e
    return torch.load(path, map_location="cpu", weights_only=False)


def load_reference_checkpoint(path: str, allow_pickle: bool = False) -> Dict:
    """Load a reference ``.pt`` checkpoint and convert it.

    Dispatches on content: DNN checkpoints carry ``mask_type``/norm stats
    (pipeline.py:782-791), DCSE ones carry ``model_class: 'SpeechEnhancer'``
    (conformer_pipeline.py:611-626).

    Returns a dict with ``variables`` (+ ``feat_mean``/``feat_std``/
    ``mask_type`` for DNN checkpoints).
    """
    ckpt = _torch_load_safe(path, allow_pickle)
    sd = ckpt["model_state"]
    if ckpt.get("model_class") == "SpeechEnhancer" or any(
            k.startswith("blocks.") for k in sd):
        n_blocks = 1 + max(int(k.split(".")[1]) for k in sd
                           if k.startswith("blocks."))
        # infer architecture from tensor shapes. Head count is NOT
        # recoverable from a state dict and changes attention semantics —
        # the reference trains DCSE with 4 heads (conformer_pipeline.py:410);
        # pass num_heads explicitly for non-default reference configs.
        d_model, two_f = _np(sd["input_proj.weight"]).shape
        config = {
            "num_blocks": n_blocks,
            "d_model": d_model,
            "n_freq": two_f // 2,
            "d_ff": _np(sd["blocks.0.ff1.linear1.weight"]).shape[0],
            "kernel_size": _np(sd["blocks.0.conv.depthwise.weight"]
                               ).shape[-1],
        }
        return {"kind": "dcse", "config": config,
                "variables": import_dcse_state_dict(sd, n_blocks)}
    out = {"kind": "dnn", "variables": import_dnn_state_dict(sd)}
    for k in ("feat_mean", "feat_std", "mask_type",
              "feature_dim", "mask_dim"):
        if k in ckpt:
            out[k] = ckpt[k]
    return out
