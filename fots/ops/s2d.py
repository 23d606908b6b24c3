"""Space-to-depth execution of low-channel, high-resolution convolutions.

The reference stem (tools/models.py:250-264) runs 3->16->32->64 channel
convs at full and half resolution.  On TPU, tensors are tiled to 128 lanes
on the channel axis, so a full-resolution 16/32-channel NHWC tensor wastes
4-8x HBM bandwidth on lane padding, and the instance norms over those
tensors are pure bandwidth.  Measured on v5e at 16x704x1280: the stem alone
was 55 of 83 ms of the detector forward.

This module re-expresses those convs on a space-to-depth representation:
an original-resolution tensor ``[B, H, W, C]`` is stored as cells
``[B, H/f, W/f, f*f*C]`` (sub-position-major channel layout: channel
``(sy*f+sx)*C + c`` holds original pixel ``(f*y+sy, f*x+sx)`` channel
``c``).  A K x K / stride-s conv at original resolution becomes a small
dense conv on the cell grid whose kernel is *derived from the canonical
kernel* by pure index algebra — parameters keep their reference shapes, so
checkpoints, weight import, and autodiff are untouched (the derivation is
linear, so gradients flow to the canonical weights).

Equivalence is exact up to float reassociation (same taps, same adds, MXU
accumulation order differs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x, f: int):
    """[B, H, W, C] -> [B, H/f, W/f, f*f*C], sub-position-major channels."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, H/f, W/f, fy, fx, C]
    return x.reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x, f: int):
    """Inverse of :func:`space_to_depth`."""
    b, hc, wc, cc = x.shape
    c = cc // (f * f)
    x = x.reshape(b, hc, wc, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hc * f, wc * f, c)


def _same_pad_lo(kernel: int, stride: int, in_size_even: bool = True) -> int:
    """Low-side padding of the canonical conv: torch Conv2d semantics,
    ``(k-1)//2`` on both sides for every stride (reference models.py uses
    padding=1 3x3 convs throughout).  NOT XLA-'SAME', which pads (0,1)
    for stride 2 / K=3 / even input and would shift the grid one pixel
    (see fots/models/layers.py:conv)."""
    return (kernel - 1) // 2


@functools.lru_cache(maxsize=None)
def _s2d_tap_plan(kernel: int, stride: int, f_in: int, f_out: int):
    """Static 1-D tap tables for deriving the cell-grid kernel.

    For each (cell offset a, input sub-pos u, output sub-pos t) there is at
    most one original kernel tap k with ``stride*t + k - pad = f_in*a' + u``
    (a' the unshifted cell offset).  Returns (K2, pad_lo_cell, s_cell,
    k_tab [K2, f_in, f_out] int (-1 = no tap)).
    """
    assert (stride * f_out) % f_in == 0, "cell grids must align"
    s_cell = (stride * f_out) // f_in
    pad = _same_pad_lo(kernel, stride)
    raw = []
    amin, amax = 10**9, -(10**9)
    for t in range(f_out):
        for k in range(kernel):
            p = stride * t + k - pad  # original-res offset for cell 0
            a, u = p // f_in, p % f_in
            amin, amax = min(amin, a), max(amax, a)
            raw.append((t, k, a, u))
    k2 = amax - amin + 1
    k_tab = np.full((k2, f_in, f_out), -1, np.int32)
    for t, k, a, u in raw:
        k_tab[a - amin, u, t] = k
    return k2, -amin, s_cell, k_tab


def s2d_conv_kernel(w, f_in: int, f_out: int, stride: int):
    """Derive the cell-grid HWIO kernel from a canonical HWIO kernel.

    w: [K, K, Cin, Cout] canonical kernel of a stride-``stride`` SAME conv
    at original resolution.  Returns [K2, K2, f_in^2*Cin, f_out^2*Cout].
    One static gather + mask — cheap enough to run inside every forward,
    and autodiff carries gradients back to the canonical ``w``.
    """
    kernel, _, cin, cout = w.shape
    k2, _, _, k_tab = _s2d_tap_plan(kernel, stride, f_in, f_out)
    # broadcast the two 1-D tap tables into 6-D index/mask grids (numpy,
    # trace-time constants)
    ky = k_tab[:, None, :, None, :, None]   # [K2,1,fi,1,fo,1]
    kx = k_tab[None, :, None, :, None, :]   # [1,K2,1,fi,1,fo]
    ky, kx = np.broadcast_arrays(ky, kx)    # [K2,K2,fi,fi,fo,fo]
    valid = (ky >= 0) & (kx >= 0)
    big = w[np.where(valid, ky, 0), np.where(valid, kx, 0)]  # [...,Cin,Cout]
    big = jnp.where(jnp.asarray(valid)[..., None, None], big, 0)
    # [K2,K2,uy,ux,ty,tx,Cin,Cout] -> [K2,K2,(uy,ux),Cin,(ty,tx),Cout]
    big = big.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    return big.reshape(k2, k2, f_in * f_in * cin, f_out * f_out * cout)


@functools.lru_cache(maxsize=None)
def _crelu_half_perm(f_in: int, cin: int):
    """Input-row permutation mapping the HALF channel layout produced by
    ``crelu_instance_norm_s2d`` (first f_in^2*Cin/2 channels = +x part,
    rest = -x part, each sub-major) onto the plain sub-major layout a
    derived kernel expects.  Half-layout position p holds (u, j): first
    half j < Corig, second half j >= Corig; the plain layout stores (u, j)
    at u*Cin + j."""
    fi2 = f_in * f_in
    corig = cin // 2
    perm = np.empty(fi2 * cin, np.int32)
    p = np.arange(fi2 * corig)
    perm[: fi2 * corig] = (p // corig) * cin + (p % corig)
    perm[fi2 * corig:] = (p // corig) * cin + corig + (p % corig)
    return perm


def s2d_conv(x, w, f_in: int, f_out: int, stride: int, out_cells,
             crelu_half_in: bool = False):
    """Apply the canonical conv ``w`` on the S2D representation ``x``.

    x: [B, Hc, Wc, f_in^2*Cin] cells; returns [B, out_cells[0],
    out_cells[1], f_out^2*Cout].

    crelu_half_in: the input uses the half channel layout (see
    :func:`_crelu_half_perm`); the derived kernel's input rows are
    permuted accordingly (free — it happens at kernel-derivation time).
    """
    kernel = w.shape[0]
    k2, pad_lo, s_cell, _ = _s2d_tap_plan(kernel, stride, f_in, f_out)
    wk = s2d_conv_kernel(w, f_in, f_out, stride).astype(x.dtype)
    if crelu_half_in:
        wk = wk[:, :, _crelu_half_perm(f_in, w.shape[2]), :]
    cells_in = x.shape[1:3]
    pads = []
    for i in range(2):
        hi = (out_cells[i] - 1) * s_cell + k2 - cells_in[i] - pad_lo
        pads.append((pad_lo, hi))
    return jax.lax.conv_general_dilated(
        x, wk, (s_cell, s_cell), pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _s2d_tap_plan_1t(kernel: int, stride: int, f_in: int, f_out: int,
                     t: int):
    """1-D tap table for a SINGLE output sub-position ``t``: the union
    plan's column ``t`` trimmed to its minimal cell window.

    Returns (k2, pad_lo_cell, k_tab [k2, f_in]) where k_tab[a, u] is the
    canonical kernel tap feeding cell offset ``a`` sub-position ``u``
    (-1 = structurally zero).
    """
    _, pad_lo, _, k_tab = _s2d_tap_plan(kernel, stride, f_in, f_out)
    tab = k_tab[:, :, t]                               # [K2, f_in]
    live = np.nonzero((tab >= 0).any(axis=1))[0]
    a0, a1 = int(live[0]), int(live[-1])
    return a1 - a0 + 1, pad_lo - a0, tab[a0:a1 + 1]


def s2d_conv_split(x, w, f_in: int, f_out: int, stride: int, out_cells,
                   crelu_half_in: bool = False):
    """:func:`s2d_conv`, computed as ``f_out^2`` narrow convs — one per
    output sub-position, each with its minimal tap window.

    The single dense derived kernel pays for the UNION of all output
    sub-positions' tap windows: for K=3/s=1/f=2 that is a [3,3] cell
    kernel with 75% structural zeros (4x the canonical MXU work), which
    made conv1a the most expensive op in the stem (7.6 of 23.4 ms at
    16x704x1280 bf16 on v5e).  Per sub-position the window is only [2,2]
    (25% zeros), so the split form does 2.25x less MXU work at the price
    of reading the input ``f_out^2`` times — a win exactly when the dense
    form is MXU-bound.  Outputs concatenate to the standard sub-major
    layout, so consumers cannot tell which form produced the tensor.
    """
    kernel, _, cin, cout = w.shape
    assert (stride * f_out) % f_in == 0, "cell grids must align"
    s_cell = (stride * f_out) // f_in
    perm = None
    if crelu_half_in:
        perm = _crelu_half_perm(f_in, cin)
    cells_in = x.shape[1:3]
    outs = []
    for ty in range(f_out):
        k2y, pady, taby = _s2d_tap_plan_1t(kernel, stride, f_in, f_out, ty)
        for tx in range(f_out):
            k2x, padx, tabx = _s2d_tap_plan_1t(kernel, stride, f_in, f_out,
                                               tx)
            ky = taby[:, None, :, None]            # [k2y,1,uy,1]
            kx = tabx[None, :, None, :]            # [1,k2x,1,ux]
            ky, kx = np.broadcast_arrays(ky, kx)   # [k2y,k2x,uy,ux]
            valid = (ky >= 0) & (kx >= 0)
            big = w[np.where(valid, ky, 0), np.where(valid, kx, 0)]
            big = jnp.where(jnp.asarray(valid)[..., None, None], big, 0)
            wk = big.reshape(k2y, k2x, f_in * f_in * cin, cout).astype(x.dtype)
            if perm is not None:
                wk = wk[:, :, perm, :]
            pads = []
            for i, (k2, pl) in enumerate(((k2y, pady), (k2x, padx))):
                hi = (out_cells[i] - 1) * s_cell + k2 - cells_in[i] - pl
                pads.append((pl, hi))
            outs.append(jax.lax.conv_general_dilated(
                x, wk, (s_cell, s_cell), pads,
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
    return jnp.concatenate(outs, axis=-1)


def crelu_instance_norm_s2d(x, scale, bias, f: int, eps: float = 1e-5,
                            negative_slope: float = 0.01):
    """Fused CReLU + InstanceNorm + leaky-relu on an S2D tensor.

    Original op (reference CReLU_IN, tools/models.py:42-49):
    ``leaky(IN(concat(x, -x)))`` over an original-resolution [B,H,W,C]
    tensor.  Here x is its S2D form [B,Hc,Wc,f^2*C]; output is the
    2C-channel result in the **half layout** (first f^2*C channels = +x
    part, next f^2*C = -x part, each sub-major) — pass
    ``crelu_half_in=True`` to the consuming :func:`s2d_conv`.

    Reads x once for stats, once for the normalize pass (mean(-x) =
    -mean(x), var identical — no concat is ever materialized); on TPU both
    passes run as spatially-tiled Pallas kernels
    (fots/ops/instance_norm.py).  scale/bias: [2C] affine of the original
    IN (first C for +x, next C for -x).
    """
    from fots.ops.instance_norm import crelu_instance_norm_half

    return crelu_instance_norm_half(x, scale, bias, f * f, eps, negative_slope)
