"""Microbench: brick-conv formulations at Bcap=36864, C=32 on the real chip.

Round-3 search for a conv schedule that beats both the gather engine
(latency-bound row gathers) and the XLA dense conv (measured ~13 ms per
37k-brick conv). Candidates:

  a) XLA conv_general_dilated on halo'd (B,6,6,6,C)        [current brick]
  b) x-slab banded matmul: P as (B,6,1152); out[:,x,:] =
     sum_dx P[:,x+dx,:] @ W_dx (1152, 512) banded           [new, pure XLA]
  c) same in bf16
  d) halo assembly (the 26 neighbor gathers) alone          [cost floor]
  e) axis-by-axis halo assembly (6 bigger gathers)
  f) pallas x-slab kernel: P tile in VMEM, 12 matmuls       [new, pallas]
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _sync_scalar(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _sync_scalar(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync_scalar(outs[-1])
    _sync_scalar(outs[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def banded_weights(w27, c, cout):
    """(27, C, Cout) -> 3 x (6C, 4Cout) banded x-slab matrices.

    W_dx[(z_out+dz)*C + ci, z_out... wait: columns are (y,z,c) flattened.
    Layout: P rows (b, x), cols (y*6 + z)*C + c, y,z in [0,6).
    Output cols (y_out*4 + z_out)*Cout + co, y_out,z_out in [0,4).
    W_dx[(y_out+dy)*6*C + (z_out+dz)*C + ci, (y_out*4+z_out)*Cout + co]
      = w27[dx*9+dy*3+dz, ci, co]
    """
    w = np.asarray(w27).reshape(3, 3, 3, c, cout)
    mats = []
    for dx in range(3):
        m = np.zeros((36 * c, 16 * cout), np.float32)
        for dy in range(3):
            for dz in range(3):
                for yo in range(4):
                    for zo in range(4):
                        r0 = ((yo + dy) * 6 + (zo + dz)) * c
                        c0 = (yo * 4 + zo) * cout
                        m[r0 : r0 + c, c0 : c0 + cout] = w[dx, dy, dz]
        mats.append(m)
    return jnp.asarray(np.stack(mats))  # (3, 36C, 16Cout)


def main():
    bcap, c, cout = 36864, 32, 32
    rng = np.random.default_rng(0)
    padded = jnp.asarray(
        rng.normal(size=(bcap, 6, 6, 6, c)).astype(np.float32)
    )
    w27 = jnp.asarray(rng.normal(size=(27, c, cout)).astype(np.float32) * 0.1)
    wb = banded_weights(w27, c, cout)  # (3, 1152, 512)

    @jax.jit
    def xla_conv(padded, w27):
        kernel = w27.reshape(3, 3, 3, c, cout)
        return lax.conv_general_dilated(
            padded, kernel, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )

    @partial(jax.jit, static_argnames=("dtype",))
    def xslab(padded, wb, dtype=jnp.float32):
        p = padded.reshape(bcap, 6, 36 * c).astype(dtype)
        w = wb.astype(dtype)
        out = jnp.zeros((bcap, 4, 16 * cout), jnp.float32)
        for dx in range(3):
            out = out + jnp.einsum(
                "bxk,kn->bxn", p[:, dx : dx + 4, :], w[dx],
                preferred_element_type=jnp.float32,
            )
        return out.reshape(bcap, 4, 4, 4, cout)

    err = jax.jit(
        lambda p, w27, wb: jnp.abs(xla_conv(p, w27) - xslab(p, wb)).max()
    )(padded, w27, wb)
    print("xslab max err:", float(err), flush=True)

    timeit("a) XLA conv f32", xla_conv, padded, w27)
    timeit("b) x-slab banded matmul f32", xslab, padded, wb)
    timeit("c) x-slab banded matmul bf16",
           partial(xslab, dtype=jnp.bfloat16), padded, wb)

    # d) halo assembly cost: 26 gathers of brick rows
    nbrs = jnp.asarray(
        rng.integers(0, bcap + 1, (bcap, 27)).astype(np.int32)
    )
    dense = jnp.asarray(
        rng.normal(size=(bcap + 1, 4, 4, 4, c)).astype(np.float32)
    )
    _dirs = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ]

    @jax.jit
    def halo26(dense, nbrs):
        def src_slice(d):
            out = []
            for ad in d:
                if ad == 1:
                    out.append(slice(0, 1))
                elif ad == -1:
                    out.append(slice(3, 4))
                else:
                    out.append(slice(0, 4))
            return tuple(out)

        def block(d):
            if d == (0, 0, 0):
                return dense[:bcap]
            k = _dirs.index(d)
            nbr = nbrs[:, k]
            sx, sy, sz = src_slice(d)
            return dense[:, sx, sy, sz, :][nbr]

        x_slabs = []
        for dx in (-1, 0, 1):
            y_slabs = []
            for dy in (-1, 0, 1):
                z_blocks = [block((dx, dy, dz)) for dz in (-1, 0, 1)]
                y_slabs.append(jnp.concatenate(z_blocks, axis=3))
            x_slabs.append(jnp.concatenate(y_slabs, axis=2))
        return jnp.concatenate(x_slabs, axis=1)

    # e) axis-by-axis: 6 gathers of growing slabs
    @jax.jit
    def halo_axis(dense, nbrs):
        # x axis: need neighbor (dx, 0, 0) at k = _dirs.index
        def nb(d):
            return nbrs[:, _dirs.index(d)]

        lo = dense[:, 3:4, :, :, :][nb((-1, 0, 0))]  # (B,1,4,4,C)
        hi = dense[:, 0:1, :, :, :][nb((1, 0, 0))]
        px = jnp.concatenate([lo, dense[:bcap], hi], axis=1)  # (B,6,4,4,C)
        pxd = jnp.concatenate(
            [px, jnp.zeros((1, 6, 4, 4, c), px.dtype)], axis=0
        )
        lo = pxd[:, :, 3:4, :, :][nb((0, -1, 0))]  # (B,6,1,4,C)
        hi = pxd[:, :, 0:1, :, :][nb((0, 1, 0))]
        py = jnp.concatenate([lo, px, hi], axis=2)  # (B,6,6,4,C)
        pyd = jnp.concatenate(
            [py, jnp.zeros((1, 6, 6, 4, c), py.dtype)], axis=0
        )
        lo = pyd[:, :, :, 3:4, :][nb((0, 0, -1))]
        hi = pyd[:, :, :, 0:1, :][nb((0, 0, 1))]
        return jnp.concatenate([lo, py, hi], axis=3)  # (B,6,6,6,C)

    timeit("d) halo assembly 26 gathers", halo26, dense, nbrs)
    timeit("e) halo assembly 6 axis gathers", halo_axis, dense, nbrs)

    # f) fused: halo + conv, both variants
    @jax.jit
    def fused26_conv(dense, nbrs, wb):
        p = halo26(dense, nbrs)
        return xslab(p, wb)

    @jax.jit
    def fused_axis_conv(dense, nbrs, wb):
        p = halo_axis(dense, nbrs)
        return xslab(p, wb)

    timeit("f) halo26 + xslab f32", fused26_conv, dense, nbrs, wb)
    timeit("g) haloaxis + xslab f32", fused_axis_conv, dense, nbrs, wb)


if __name__ == "__main__":
    main()
