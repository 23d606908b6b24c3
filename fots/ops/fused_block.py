"""Fused conv3x3 + InstanceNorm + (residual add) + ReLU/leaky — one Pallas
kernel, two passes over row tiles.

Motivation (docs/PERFORMANCE.md "The HBM wall"): the detector is HBM-bound
(27% bandwidth-bound MFU ceiling, ~90% of HBM peak achieved), so the only
lever left is removing bytes.  The XLA-composed residual-block tail
``relu(IN(conv(x)) + r)`` moves ~6 activation-sized tensors through HBM:

    conv:      read x, write y
    IN stats:  read y
    IN+add:    read y, read r, write out        (XLA fuses these three)

This kernel moves ~4: instance-norm statistics need the *global* spatial
mean/var of the conv output, which forces two passes; instead of
materializing the conv output between them we RECOMPUTE the conv in pass 2
— the MXU idles at this arithmetic intensity, so the extra FLOPs are free
while the saved bytes are not:

    pass 1 (per row tile): conv from x (+1-row halo), accumulate per-
                           channel sum/sumsq in VMEM scratch      read ~x
    pass 2 (per row tile): conv again, normalize+affine with the now-
                           complete stats, add r, activate, DMA out
                                                     read ~x, read r, write

Halos are fetched with manual async DMA from HBM (the input stays in
``ANY`` memory space); column padding is zeroed in VMEM scratch, so the
SAME-padding semantics match ``lax.conv_general_dilated``.

Channel constraint (measured on v5e, jax 0.9 Mosaic): HBM DMA slices must
be 128-lane aligned — a C=64 tensor is 128-padded in the kernel's HBM
view, so every DMA would move 2x the dense bytes and erase the traffic
win.  The kernel therefore requires C % 128 == 0.  In this model that
rules out layer1 (the 1/4-scale stage, C=64) and targets layer2 (the
1/8-scale stage, C=128) — which moves MORE total bytes anyway: same
57.7 MB per activation (16x88x160x128 vs 16x176x320x64 bf16) across 4
blocks vs layer1's 3.

The reference composes this block from separate CUDA kernels
(tools/models.py:140-168 BasicBlockIn: conv2d -> InstanceNorm2d -> += ->
relu_); there is no reference counterpart to the fusion itself.

Measured verdict on v5e (tools/profile_fused_block.py, committed in
docs/PERFORMANCE.md): see that file — this kernel exists to make the
"fusing whole blocks" wall claim a measurement instead of an assertion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def conv_in_act_reference(x, w, scale, bias, residual=None, eps=1e-5,
                          negative_slope=None):
    """jnp/XLA reference: act(IN(conv3x3_same(x, w)) * scale + bias [+ r]).

    Also the baseline the kernel is benchmarked against, and the autodiff
    path of the custom_vjp wrapper."""
    dt = x.dtype
    y = jax.lax.conv_general_dilated(
        x, w.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y32 = y.astype(jnp.float32)
    n = y32.shape[1] * y32.shape[2]
    s1 = jnp.sum(y32, axis=(1, 2), keepdims=True)
    s2 = jnp.sum(y32 * y32, axis=(1, 2), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    z = (y32 - mean) * jax.lax.rsqrt(var + eps)
    z = z * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if residual is not None:
        z = z + residual.astype(jnp.float32)
    if negative_slope is None:
        z = jnp.maximum(z, 0.0)
    else:
        z = jnp.where(z >= 0, z, z * negative_slope)
    return z.astype(dt)


def _pick_row_tile(h: int) -> int:
    """Largest divisor of h that is <= 32 and a multiple of 8 (sublane
    alignment); 0 if none exists."""
    for ht in (32, 24, 16, 8):
        if h % ht == 0:
            return ht
    return 0


def _kernel(x_hbm, w_ref, g_ref, b_ref, r_hbm, o_hbm,
            xs, rs, os, stats, sems, *, ht, eps, slope, npix, has_res):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    p = pl.program_id(1)
    s = pl.program_id(2)
    n_s = pl.num_programs(2)
    # scratch is [ht+2, W+16, C]: data columns live at [8, 8+W) because a
    # VMEM DMA destination offset must be 8-sublane-aligned (Mosaic
    # rejects a +1 column offset); the conv taps read at 7+kx, an
    # unaligned VALUE slice, which is legal (costs a vector shift, not a
    # layout violation)
    w_full = xs.shape[1] - 16
    cdim = xs.shape[2]
    col0 = 8

    # ---- stage the x row tile (+1-row halo) into zero-padded VMEM ----
    # zero only the regions no DMA writes (avoids store/DMA races):
    # the padding column bands always, the top/bottom halo rows at edges
    xs[:, 0:col0, :] = jnp.zeros((ht + 2, col0, cdim), xs.dtype)
    xs[:, col0 + w_full:, :] = jnp.zeros((ht + 2, 8, cdim), xs.dtype)

    @pl.when(s == 0)
    def _():
        xs[0, col0:col0 + w_full, :] = jnp.zeros((w_full, cdim), xs.dtype)

    @pl.when(s == n_s - 1)
    def _():
        xs[ht + 1, col0:col0 + w_full, :] = jnp.zeros((w_full, cdim),
                                                      xs.dtype)

    main = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(s * ht, ht), :, :],
        xs.at[pl.ds(1, ht), pl.ds(col0, w_full), :],
        sems.at[0])
    main.start()

    @pl.when(s > 0)
    def _():
        top = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(s * ht - 1, 1), :, :],
            xs.at[pl.ds(0, 1), pl.ds(col0, w_full), :],
            sems.at[1])
        top.start()
        top.wait()

    @pl.when(s < n_s - 1)
    def _():
        bot = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(s * ht + ht, 1), :, :],
            xs.at[pl.ds(ht + 1, 1), pl.ds(col0, w_full), :],
            sems.at[2])
        bot.start()
        bot.wait()

    main.wait()

    # ---- conv3x3 as 9 shifted MXU contractions, f32 accumulator ----
    acc = jnp.zeros((ht, w_full, cdim), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = xs[ky:ky + ht, col0 - 1 + kx:col0 - 1 + kx + w_full, :]
            acc = acc + jax.lax.dot_general(
                sl, w_ref[ky, kx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    # ---- pass 1: accumulate per-channel spatial sum / sumsq ----
    @pl.when(p == 0)
    def _():
        s1 = jnp.sum(acc, axis=(0, 1))
        s2 = jnp.sum(acc * acc, axis=(0, 1))

        @pl.when(s == 0)
        def _():
            stats[0] = s1
            stats[1] = s2

        @pl.when(s > 0)
        def _():
            stats[0] = stats[0] + s1
            stats[1] = stats[1] + s2

    # ---- pass 2: normalize + affine (+ residual) + activate, DMA out ----
    @pl.when(p == 1)
    def _():
        if has_res:
            rdma = pltpu.make_async_copy(
                r_hbm.at[n, pl.ds(s * ht, ht), :, :], rs, sems.at[1])
            rdma.start()
        mean = stats[0] / npix
        var = jnp.maximum(stats[1] / npix - mean * mean, 0.0)
        a = jax.lax.rsqrt(var + eps) * g_ref[0]
        c = b_ref[0] - mean * a
        z = acc * a[None, None, :] + c[None, None, :]
        if has_res:
            rdma.wait()
            z = z + rs[...].astype(jnp.float32)
        if slope is None:
            z = jnp.maximum(z, 0.0)
        else:
            z = jnp.where(z >= 0, z, z * slope)
        os[...] = z.astype(os.dtype)
        odma = pltpu.make_async_copy(
            os, o_hbm.at[n, pl.ds(s * ht, ht), :, :], sems.at[0])
        odma.start()
        odma.wait()


def _conv_in_act_pallas(x, w, scale, bias, residual, eps, negative_slope,
                        interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wd, c = x.shape
    ht = _pick_row_tile(h)
    assert ht > 0, f"h={h} has no 8-multiple divisor <= 32"
    assert interpret or c % 128 == 0, (
        f"C={c}: Mosaic HBM DMA slices must be 128-lane aligned; a "
        "narrower channel dim is 128-padded in the kernel's HBM view and "
        "the padded DMAs erase the fusion's traffic win (see module "
        "docstring) — use the XLA composition instead")
    has_res = residual is not None
    kernel = functools.partial(
        _kernel, ht=ht, eps=eps, slope=negative_slope,
        npix=float(h * wd), has_res=has_res)
    scale2 = scale.astype(jnp.float32).reshape(1, c)
    bias2 = bias.astype(jnp.float32).reshape(1, c)
    r_arg = residual if has_res else jnp.zeros((1, 1, 1, c), x.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, 2, h // ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),         # w [3,3,C,C]
            pl.BlockSpec(memory_space=pltpu.VMEM),         # scale [1,C]
            pl.BlockSpec(memory_space=pltpu.VMEM),         # bias [1,C]
            pl.BlockSpec(memory_space=pl.ANY),          # residual
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),    # out (manual DMA)
        scratch_shapes=[
            pltpu.VMEM((ht + 2, wd + 16, c), x.dtype),     # padded x tile
            pltpu.VMEM((ht, wd, c), x.dtype),              # residual tile
            pltpu.VMEM((ht, wd, c), x.dtype),              # out tile
            pltpu.VMEM((2, c), jnp.float32),               # sum / sumsq
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x, w.astype(x.dtype), scale2, bias2, r_arg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_conv3x3_in_act(x, w, scale, bias, residual, eps=1e-5,
                         negative_slope=None):
    """act(IN(conv3x3_same(x, w)) * scale + bias [+ residual]) in one
    Pallas kernel (TPU; falls back to the XLA composition elsewhere).

    x, residual: [N,H,W,C]; w: [3,3,C_in,C]; scale/bias: [C].
    negative_slope None = ReLU, else leaky.  Backward runs the XLA
    composition's autodiff on the saved inputs.
    """
    if jax.default_backend() != "tpu" or x.shape[-1] % 128 != 0:
        return conv_in_act_reference(x, w, scale, bias, residual, eps,
                                     negative_slope)
    return _conv_in_act_pallas(x, w, scale, bias, residual, eps,
                               negative_slope)


def _fwd(x, w, scale, bias, residual, eps, negative_slope):
    y = fused_conv3x3_in_act(x, w, scale, bias, residual, eps,
                             negative_slope)
    return y, (x, w, scale, bias, residual)


def _bwd(eps, negative_slope, saved, g):
    x, w, scale, bias, residual = saved
    if residual is None:
        _, vjp = jax.vjp(
            lambda x, w, s, b: conv_in_act_reference(
                x, w, s, b, None, eps, negative_slope),
            x, w, scale, bias)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(
        lambda x, w, s, b, r: conv_in_act_reference(
            x, w, s, b, r, eps, negative_slope),
        x, w, scale, bias, residual)
    return vjp(g)


fused_conv3x3_in_act.defvjp(_fwd, _bwd)
