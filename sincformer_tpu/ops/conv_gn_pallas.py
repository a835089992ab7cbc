"""Fused Conv1d → GroupNorm [→ +skip] [→ GELU] Pallas kernel.

STATUS: measured NEGATIVE result at the PerceptionAgent's shapes — kept
as a correct, parity-tested building block, NOT wired into the model.

Round-2b profiling (docs/PERF.md) moved the flagship bottleneck to the
SincNet PerceptionAgent (17 ms of the ~40 ms bf16 metacog call), whose
residual conv blocks materialise ~8 full-rate activations through HBM
because GroupNorm's whole-sequence statistics block XLA fusion. This
kernel eliminates those passes: one batch row per grid step, the strided
conv as a single packed GEMM per row tile (the input pre-reshaped to
(T/s, s·C_in); frame columns built by aligned DMA + register stores so
the MXU contracts over nsh·s·C_in = 384-512), f32-exact Σ/Σ² group
statistics accumulated before the bf16 store, and a VMEM-resident second
pass for normalise → +skip → tanh-GELU.

Measured on one v5e at the block_0 call site (B=128, T=32 k, 64→128,
k=7, s=2, bf16): 15.3 ms for conv1+GN+GELU vs 9.6 ms for XLA running the
ENTIRE flax ConvBlock (3 convs + 3 GNs + 2 GELUs). Three formulations
(per-shift K=128 GEMMs / DMA-built K=512 frames / register-store frames)
all land within 4 % of each other, and act=False saves only 1.5 ms —
i.e. the kernel is bound by its sequential per-row two-pass structure
(VPU pointwise + per-tile stores + dependent DMA chain), not by the MXU,
and the deficit is structural, not tunable. XLA's conv emitter overlaps
MXU/VPU/HBM across the whole batch and wins at these channel counts.
Lesson recorded in docs/PERF.md; the fused-FFN kernel (ops/fused_ffn.py)
found the same pattern at d_model=256.

The op remains useful for geometries where the GEMM dominates (larger
C_in·k) and as the checkpoint-compatible fused path should PA ever scale
up; parity (interpret mode, f32-exact) is pinned by
tests/test_pallas_ops.py::TestConvGN. On TPU hardware the f32 matmul
delta vs a float64 oracle equals XLA's own conv delta (~1e-2 — TPU
default-precision multiplies in BOTH paths; CPU interpret is exact to
3e-6).

Backward = custom VJP through the reference formulation (same pattern as
ops/fused_ffn.py), so the kernel is usable inside training steps.
Reference behaviour matched: reference agents/perception.py:121-171.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TT = 1024         # output-row tile per GEMM


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _same_pads(t: int, k: int, s: int) -> tuple[int, int, int]:
    """lax/flax SAME padding: (t_out, pad_left, pad_right)."""
    t_out = -(-t // s)
    total = max((t_out - 1) * s + k - t, 0)
    return t_out, total // 2, total - total // 2


def _kernel(x2_hbm, w2_ref, b_ref, sc_ref, sh_ref, skip_hbm, out_ref,
            xt, fr, st, sums_ref, sqs_ref, sem_x, sem_s, *, nsh: int,
            tout: int, n_per_group: float, groups: int, eps: float,
            act: bool, has_skip: bool):
    """One batch row. x2_hbm (B, R, s·Cin) in HBM; w2 (L, Cout) VMEM;
    b/sc/sh (1, Cout) VMEM; skip_hbm (B, Tp, Cout) HBM (dummy (B,1,C)
    when has_skip=False); out (1, Tp, Cout) VMEM block. Scratch: xt
    (2, TT+nsh-1, s·Cin), st (2, TT, Cout), sums/sqs (1, Cout) f32,
    sem_x/sem_s DMA((2,))."""
    i = pl.program_id(0)
    cout = out_ref.shape[-1]
    tp = out_ref.shape[1]
    n_tiles = tp // _TT

    scin = x2_hbm.shape[-1]

    def dma_x(t, slot):
        """One ALIGNED copy of rows [t·TT, t·TT+TT+8) — HBM slices must
        start/size on the 8-sublane tiling, so the j-shifted frame columns
        are built in-kernel from this buffer by register stores."""
        return pltpu.make_async_copy(
            x2_hbm.at[i, pl.ds(t * _TT, _TT + 8), :], xt.at[slot],
            sem_x.at[slot])

    def dma_skip(t, slot):
        return pltpu.make_async_copy(
            skip_hbm.at[i, pl.ds(t * _TT, _TT), :], st.at[slot],
            sem_s.at[slot])

    sums_ref[...] = jnp.zeros_like(sums_ref[...])
    sqs_ref[...] = jnp.zeros_like(sqs_ref[...])
    dma_x(0, 0).start()

    def conv_tile(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < n_tiles)
        def _prefetch():
            dma_x(t + 1, jax.lax.rem(t + 1, 2)).start()

        dma_x(t, slot).wait()
        x = xt[slot]                                     # (TT+8, s·Cin)
        # build frames: column block j = rows [j, j+TT) — ONE GEMM with
        # K = nsh·s·Cin (384-512) instead of nsh GEMMs at K = s·Cin
        # (measured 2.6x faster: K=128 runs the MXU at partial depth)
        for j in range(nsh):
            fr[:, j * scin:(j + 1) * scin] = x[j:j + _TT]
        acc = jax.lax.dot_general(
            fr[...], w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (TT, Cout)
        acc = acc + b_ref[0].astype(jnp.float32)
        # exact f32 stats over VALID rows only (tail tile may pass tout)
        rows = jax.lax.broadcasted_iota(jnp.int32, (_TT, 1), 0) + t * _TT
        valid = (rows < tout).astype(jnp.float32)
        accv = acc * valid
        sums_ref[...] = sums_ref[...] + jnp.sum(accv, axis=0,
                                                keepdims=True)
        sqs_ref[...] = sqs_ref[...] + jnp.sum(accv * acc, axis=0,
                                              keepdims=True)
        out_ref[0, pl.ds(t * _TT, _TT), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, conv_tile, 0, unroll=False)

    # group statistics from per-channel Σ/Σ² via a 0/1 membership matmul
    # (Mosaic cannot reshape (1, C) → (G, C/G) vectors)
    cg = cout // groups
    chan = jax.lax.broadcasted_iota(jnp.int32, (cout, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (cout, groups), 1)
    memb = (chan // cg == grp).astype(jnp.float32)       # (C, G)
    s_g = jnp.dot(sums_ref[...], memb,
                  preferred_element_type=jnp.float32)    # (1, G)
    q_g = jnp.dot(sqs_ref[...], memb,
                  preferred_element_type=jnp.float32)
    mean_g = s_g / n_per_group
    var_g = q_g / n_per_group - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast per-group → per-channel through membᵀ
    mean_c = jax.lax.dot_general(
        mean_g, memb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (1, C)
    inv_c = jax.lax.dot_general(
        inv_g, memb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scf = sc_ref[...].astype(jnp.float32)
    scale = inv_c * scf
    shift = sh_ref[...].astype(jnp.float32) - mean_c * scale

    if has_skip:
        dma_skip(0, 0).start()

    def norm_tile(t, _):
        slot = jax.lax.rem(t, 2)
        y = out_ref[0, pl.ds(t * _TT, _TT), :].astype(jnp.float32)
        y = y * scale + shift
        if has_skip:
            @pl.when(t + 1 < n_tiles)
            def _prefetch():
                dma_skip(t + 1, jax.lax.rem(t + 1, 2)).start()

            dma_skip(t, slot).wait()
            y = y + st[slot].astype(jnp.float32)
        if act:
            y = jax.nn.gelu(y, approximate=True)
        out_ref[0, pl.ds(t * _TT, _TT), :] = y.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, norm_tile, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("stride", "groups", "eps", "act", "interpret"))
def _conv1d_gn_pallas(x, w, b, gamma, beta, skip, *, stride: int,
                      groups: int, eps: float, act: bool,
                      interpret: bool = False):
    bsz, t, cin = x.shape
    k, _, cout = w.shape
    s = stride
    t_out, pl_, _pr = _same_pads(t, k, s)
    nsh = (k - 1) // s + 1
    # Geometry guards: the xt scratch/DMA uses (_TT+8)-row windows, so the
    # frame build supports at most 9 input rows per output row; large k at
    # small stride also drives pad_total negative below. Fail loudly with
    # the supported envelope instead of a cryptic trace error.
    if nsh > 9:
        raise ValueError(
            f"fused_conv_gn: unsupported geometry kernel={k}, stride={s} — "
            f"needs (k-1)//s+1 <= 9 (got {nsh}); use XLA's conv instead.")
    tp = _round_up(t_out, _TT)
    # every tile DMAs an aligned (TT+8)-row window; the last starts at
    # tp - _TT
    rows_needed = tp + 8
    pad_total = rows_needed * s - t - pl_
    if pad_total < 0:
        raise ValueError(
            f"fused_conv_gn: kernel={k}, stride={s}, T={t} leaves "
            f"pad_total={pad_total} < 0 — geometry outside the supported "
            f"envelope (see docstring).")
    x_p = jnp.pad(x, [(0, 0), (pl_, pad_total), (0, 0)])
    x2 = x_p.reshape(bsz, rows_needed, s * cin)

    # packed weights: W2[(j·s + r)·cin + c, o] = w[s·j + r, c, o]
    w2 = jnp.zeros((nsh * s, cin, cout), w.dtype).at[:k].set(w)
    w2 = w2.reshape(nsh * s * cin, cout)

    has_skip = skip is not None
    if has_skip:
        skip_p = jnp.pad(skip, [(0, 0), (0, tp - t_out), (0, 0)])
    else:
        skip_p = jnp.zeros((bsz, 1, cout), x.dtype)

    kern = functools.partial(
        _kernel, nsh=nsh, tout=t_out,
        n_per_group=float(t_out * (cout // groups)),
        groups=groups, eps=eps, act=act, has_skip=has_skip)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bsz, tp, cout), x.dtype),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # x2 (HBM)
            pl.BlockSpec((nsh * s * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),            # skip (HBM)
        ],
        out_specs=pl.BlockSpec((1, tp, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _TT + 8, s * cin), x.dtype),
            pltpu.VMEM((_TT, nsh * s * cin), x.dtype),
            pltpu.VMEM((2, _TT, cout), skip_p.dtype),
            pltpu.VMEM((1, cout), jnp.float32),
            pltpu.VMEM((1, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * tp * nsh * s * cin * cout,
            bytes_accessed=(x2.size + 2 * bsz * tp * cout) * x.dtype.itemsize,
            transcendentals=bsz * tp * cout if act else 0,
        ),
        interpret=interpret,
    )(x2, w2, b[None], gamma[None], beta[None], skip_p)
    return out[:, :t_out]


def conv_gn_reference(x, w, b, gamma, beta, skip=None, *, stride: int,
                      groups: int, eps: float = 1e-6, act: bool = True):
    """Unfused oracle/backward: flax-identical Conv(SAME) → GroupNorm
    [→ +skip] [→ GELU], f32 math."""
    xf = x.astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        xf, w.astype(jnp.float32), window_strides=(stride,),
        padding="SAME", dimension_numbers=("NHC", "HIO", "NHC"))
    y = y + b.astype(jnp.float32)
    bsz, t_out, cout = y.shape
    yg = y.reshape(bsz, t_out, groups, cout // groups)
    mu = jnp.mean(yg, axis=(1, 3), keepdims=True)
    var = jnp.mean((yg - mu) ** 2, axis=(1, 3), keepdims=True)
    yn = ((yg - mu) * jax.lax.rsqrt(var + eps)).reshape(bsz, t_out, cout)
    yn = yn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if skip is not None:
        yn = yn + skip.astype(jnp.float32)
    if act:
        yn = jax.nn.gelu(yn, approximate=True)
    return yn.astype(x.dtype)


def _use_pallas() -> bool:
    from sincformer_tpu.utils.backend import on_tpu
    return on_tpu()


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def conv1d_gn(x, w, b, gamma, beta, skip,
              stride: int, groups: int, eps: float = 1e-6,
              act: bool = True):
    """Fused Conv1d(SAME, stride) → GroupNorm(groups) [→ +skip] [→ GELU].

    Args:
        x: (B, T, Cin). w: (K, Cin, Cout). b/gamma/beta: (Cout,).
        skip: optional (B, Tout, Cout) added after GN, before activation.
        act: apply tanh-GELU at the end (flax ``nn.gelu`` default).

    Returns:
        (B, Tout, Cout), Tout = ceil(T / stride), dtype of x.
    """
    if _use_pallas():
        return _conv1d_gn_pallas(x, w, b, gamma, beta, skip, stride=stride,
                                 groups=groups, eps=eps, act=act)
    return conv_gn_reference(x, w, b, gamma, beta, skip, stride=stride,
                             groups=groups, eps=eps, act=act)


def _vjp_fwd(x, w, b, gamma, beta, skip, stride, groups, eps, act):
    out = conv1d_gn(x, w, b, gamma, beta, skip, stride, groups, eps, act)
    return out, (x, w, b, gamma, beta, skip)


def _vjp_bwd(stride, groups, eps, act, res, g):
    x, w, b, gamma, beta, skip = res
    if skip is None:
        def f(x_, w_, b_, g_, be_):
            return conv_gn_reference(x_, w_, b_, g_, be_, None,
                                     stride=stride, groups=groups, eps=eps,
                                     act=act)
        _, vjp = jax.vjp(f, x, w, b, gamma, beta)
        dx, dw, db, dg, dbe = vjp(g)
        return dx, dw, db, dg, dbe, None

    def f(x_, w_, b_, g_, be_, sk_):
        return conv_gn_reference(x_, w_, b_, g_, be_, sk_, stride=stride,
                                 groups=groups, eps=eps, act=act)
    _, vjp = jax.vjp(f, x, w, b, gamma, beta, skip)
    return vjp(g)


conv1d_gn.defvjp(_vjp_fwd, _vjp_bwd)
