"""Train state, optimizer factory, NaN guards, checkpointing.

Improvements over the reference (documented in SURVEY.md §5): checkpoints
carry the FULL train state (params, optimizer state, epoch, norm stats) via
Orbax, enabling true mid-training resume — the reference saves only model
weights (pipeline.py:761-791). NaN handling is the reference's per-batch
skip (pipeline.py:661-675) expressed branchlessly: a non-finite loss zeroes
the update inside the jitted step instead of a host-side `continue`.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Flax TrainState + mutable model vars + NaN-batch counter."""
    model_state: Any = None          # e.g. batch_stats when conv_norm="batch"
    nan_count: jnp.ndarray = struct.field(default=None)


def warmup_cosine_schedule(base_lr: float, total_epochs: int,
                           steps_per_epoch: int,
                           warmup_epochs: Optional[int] = None,
                           floor: float = 0.01) -> optax.Schedule:
    """Linear warmup + cosine annealing to ``floor``·peak, *per-epoch*
    granularity matching the reference's LambdaLR
    (conformer_pipeline.py:432-441: warmup = clamp(total//5, 1, 5))."""
    if warmup_epochs is None:
        warmup_epochs = max(1, min(5, total_epochs // 5))

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        warm = (epoch + 1) / warmup_epochs
        progress = (epoch - warmup_epochs) / max(1, total_epochs
                                                 - warmup_epochs)
        cos = jnp.maximum(floor, 0.5 * (1 + jnp.cos(math.pi * progress)))
        return base_lr * jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def make_adamw(base_lr: float, total_epochs: int, steps_per_epoch: int,
               betas=(0.9, 0.98), weight_decay: float = 0.01,
               grad_clip: float = 5.0) -> optax.GradientTransformation:
    """AdamW + grad-clip + warmup/cosine, the DCSE recipe
    (conformer_pipeline.py:424-442)."""
    sched = warmup_cosine_schedule(base_lr, total_epochs, steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, b1=betas[0], b2=betas[1],
                    weight_decay=weight_decay),
    )


def make_adam_plateau(base_lr: float,
                      grad_clip: float = 5.0) -> optax.GradientTransformation:
    """Adam + clip for the DNN pipeline (pipeline.py:563-567). Plateau LR
    reduction is driven host-side via ``scale_lr`` below."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.inject_hyperparams(optax.adam)(learning_rate=base_lr),
    )


def set_injected_lr(opt_state, lr) -> Any:
    """Return a copy of an optax (chained) state with every injected
    ``learning_rate`` hyperparam replaced — the immutable alternative to
    poking ``opt_state[i].hyperparams[...]`` in place, which silently
    breaks if the chain order or optax internals change.

    Works for any nesting of plain tuples around states produced by
    ``optax.inject_hyperparams`` (identified structurally by their
    ``hyperparams`` dict containing ``learning_rate``).
    """
    def _rec(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp and \
                hasattr(s, "_replace"):
            new_hp = dict(hp)
            old = jnp.asarray(hp["learning_rate"])
            new_hp["learning_rate"] = jnp.asarray(lr, old.dtype)
            return s._replace(hyperparams=new_hp)
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            return tuple(_rec(x) for x in s)
        return s

    out = _rec(opt_state)
    if jax.tree_util.tree_structure(out) != \
            jax.tree_util.tree_structure(opt_state):
        raise ValueError("set_injected_lr changed the opt_state structure")
    return out


def guard_nan_update(grads, loss):
    """Zero all gradients when the loss is non-finite — the branchless,
    jit-safe form of the reference's NaN-batch skip
    (pipeline.py:661-675, conformer_pipeline.py:509-510).

    Returns (guarded_grads, is_bad) — is_bad feeds the nan counter.
    """
    leaves = jax.tree.leaves(grads)
    finite = jnp.isfinite(loss)
    for leaf in leaves:
        finite = finite & jnp.all(jnp.isfinite(leaf))
    guarded = jax.tree.map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
    return guarded, ~finite


# ─── Orbax checkpointing ─────────────────────────────────────────────────────

def latest_step_dir(base: str) -> Optional[str]:
    """Newest ``step_N`` checkpoint under ``base``, by NUMERIC step.

    Lexicographic sorting (the naive ``sorted(...)[-1]``) picks ``step_98``
    over ``step_336``; this helper fixes that and also skips orbax's
    in-flight ``*.orbax-checkpoint-tmp`` dirs and ``*.meta.json`` sidecars.
    """
    if not os.path.isdir(base):
        return None
    best, best_n = None, -1
    for d in os.listdir(base):
        if not d.startswith("step_") or d.endswith(".json") \
                or d.endswith("-tmp"):
            continue
        try:
            n = int(d[len("step_"):])
        except ValueError:
            continue
        if n > best_n:
            best, best_n = d, n
    return os.path.join(base, best) if best else None


def checkpoint_step(path: str) -> int:
    """Numeric step of a ``.../step_N`` checkpoint dir (-1 if unparsable)."""
    tail = os.path.basename(path.rstrip(os.sep))
    try:
        return int(tail[len("step_"):]) if tail.startswith("step_") else -1
    except ValueError:
        return -1


def newest_checkpoint(model_dir: str, names) -> Optional[str]:
    """The checkpoint with the MAX step across ``names`` (e.g. final AND
    best). Resume must use this: a fixed final-before-best name preference
    silently discards a newer best_* checkpoint's progress."""
    best, best_n = None, -1
    for name in names:
        p = latest_step_dir(os.path.join(model_dir, name))
        if p is not None and checkpoint_step(p) > best_n:
            best, best_n = p, checkpoint_step(p)
    return best


def inference_ckpt_order(final_name: str, best_name: str):
    """Checkpoint-family preference for INFERENCE loads (``load_model``
    with no explicit path).

    The default prefers the completed-run artifact (``*_final``) — the
    historical behavior every committed eval protocol used. Setting
    ``SINCFORMER_CKPT_PREF=best`` (CLI: ``evaluate --ckpt best``) flips
    the order to the early-stopped best-validation checkpoint, which is
    the deployment-correct choice when training ran past its val optimum
    (measured: the 150-epoch extended run's final checkpoint loses
    ~3.5 dB grid SSNR vs its epoch-29 best). Resume is unaffected — it
    uses :func:`newest_checkpoint` (max step across families)."""
    pref = os.environ.get("SINCFORMER_CKPT_PREF", "final").strip().lower()
    if pref == "best":
        return (best_name, final_name)
    return (final_name, best_name)


def write_train_meta(model_dir: str, name: str, meta: dict) -> None:
    """Sidecar JSON next to a named checkpoint family (host metadata the
    orbax tree shouldn't carry — best val loss, epoch, wall time)."""
    import json
    os.makedirs(os.path.join(model_dir, name), exist_ok=True)
    with open(os.path.join(model_dir, name, "train_meta.json"), "w") as f:
        json.dump(meta, f)


def read_train_meta(model_dir: str, name: str) -> Optional[dict]:
    import json
    p = os.path.join(model_dir, name, "train_meta.json")
    try:
        with open(p) as f:
            return json.load(f)
    except Exception:
        return None


# Validation-mixing protocol version, persisted in best-checkpoint sidecars.
# 2 = val mixtures use held-out noise crops (data.loader.heldout_noises);
# best_val values from older protocols are not comparable, so resume
# re-evaluates the restored model instead of trusting the sidecar.
VAL_PROTOCOL = 2


def resolve_output_gain(step_dir: str) -> float:
    """Output gain to apply at inference for the checkpoint at ``step_dir``
    (a ``.../family/step_N`` path): the val-calibrated ``output_gain`` from
    the family's sidecar, default 1.0. ``SINCFORMER_OUTPUT_GAIN`` overrides:
    ``off``/``1`` disables calibration, a number forces that gain."""
    env = os.environ.get("SINCFORMER_OUTPUT_GAIN", "").strip().lower()
    if env in ("off", "none", "disable", "disabled"):
        return 1.0
    if env:
        try:
            return float(env)
        except ValueError:
            pass
    fam = os.path.dirname(os.path.abspath(step_dir))
    meta = read_train_meta(os.path.dirname(fam), os.path.basename(fam))
    try:
        g = float((meta or {}).get("output_gain", 1.0))
    except (TypeError, ValueError):
        return 1.0
    return g if np.isfinite(g) and g > 0 else 1.0


def merge_train_meta(model_dir: str, name: str, updates: dict) -> dict:
    """Read-modify-write the sidecar so independent writers (best-val
    tracking in the train loop, output-gain calibration in save/calibrate)
    don't clobber each other's keys."""
    meta = read_train_meta(model_dir, name) or {}
    meta.update(updates)
    write_train_meta(model_dir, name, meta)
    return meta

def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    extra: Optional[dict] = None):
    """Persist full train state (+ host metadata like norm stats)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": jnp.asarray(state.step)}
    if state.model_state is not None:
        payload["model_state"] = state.model_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if extra:
        import json
        import numpy as np

        def _tolist(v):
            return v.tolist() if isinstance(v, (jnp.ndarray, np.ndarray)) else v
        with open(os.path.join(ckpt_dir, f"step_{step}.meta.json"),
                  "w") as f:
            json.dump({k: _tolist(v) for k, v in extra.items()}, f)
    return path


def save_checkpoint_quantized(ckpt_dir: str, state: TrainState, step: int,
                              extra: Optional[dict] = None):
    """Serving checkpoint: params int8-quantized per output channel
    (ops/quantize.py stochastic-rounding kernels), ~4× smaller on disk.
    Optimizer state is NOT saved — a quantized checkpoint is a deployment
    artifact, not a training resume point. Restored transparently by
    :func:`restore_checkpoint` (dequantize-on-load)."""
    import orbax.checkpoint as ocp

    from sincformer_tpu.ops.quantize import quantize_tree
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {"params_q": quantize_tree(state.params),
               "step": jnp.asarray(state.step)}
    if state.model_state is not None:
        payload["model_state"] = state.model_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    meta = dict(extra or {})
    meta["quantized"] = True
    import json

    import numpy as np

    def _tolist(v):
        return v.tolist() if isinstance(v, (jnp.ndarray, np.ndarray)) else v
    with open(os.path.join(ckpt_dir, f"step_{step}.meta.json"), "w") as f:
        json.dump({k: _tolist(v) for k, v in meta.items()}, f)
    return path


def _is_quantized_checkpoint(path: str) -> bool:
    meta = os.path.abspath(path) + ".meta.json"
    if os.path.exists(meta):
        import json
        try:
            with open(meta) as f:
                return bool(json.load(f).get("quantized", False))
        except Exception:
            return False
    return False


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore a full train state saved by :func:`save_checkpoint`, or a
    quantized serving checkpoint (:func:`save_checkpoint_quantized`) —
    detected via the sidecar metadata and dequantized on load."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if _is_quantized_checkpoint(path):
        from sincformer_tpu.ops.quantize import (dequantize_tree,
                                                 quantize_tree)
        # orbax needs concrete arrays (with shardings) as the template, so
        # materialise zeros in the quantized structure
        abstract = jax.eval_shape(quantize_tree, state.params)
        template_q = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  abstract)
        template = {"params_q": template_q,
                    "step": jnp.asarray(state.step)}
        if state.model_state is not None:
            template["model_state"] = state.model_state
        restored = ckptr.restore(os.path.abspath(path), template)
        params = dequantize_tree(restored["params_q"])
        return state.replace(params=params, step=int(restored["step"]),
                             model_state=restored.get("model_state",
                                                      state.model_state))
    template = {"params": state.params, "opt_state": state.opt_state,
                "step": jnp.asarray(state.step)}
    if state.model_state is not None:
        template["model_state"] = state.model_state
    restored = ckptr.restore(os.path.abspath(path), template)
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=int(restored["step"]),
                         model_state=restored.get("model_state",
                                                  state.model_state))
