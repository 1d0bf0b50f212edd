"""Point -> nearest-cylinder projection on TPU.

This is the framework's supervision-generating geometry kernel, with
behavioral parity to the reference GPU broadcast kernel
``closest_cylinder_cuda_batch`` (``/root/reference/Modules/Projection.py:19-115``)
and its batched driver (``:117-144``). Semantics:

For every point p and cylinder (start s, unit axis u, length L, radius r):

1. project p onto the axis segment: ``t = clamp(dot(p - s, u), 0, L)``,
   axis point ``q = s + t u``.
2. split ``w = p - q`` into a parallel part ``(w.u) u`` and the rejection.
   The point is "perpendicular" when ``|w.u| <= 1e-3`` (it lies beside the
   mantle, not beyond the caps).
3. perpendicular case: the closest surface point is the radial projection
   onto the mantle ``q + r n`` with ``n = rejection / max(|rejection|, 1e-8)``.
4. cap case: the closest point of the cap disc, ``q + min(|rejection|, r) n``
   (derived from the reference's auxiliary-axis construction, which clamps a
   projection onto a diameter segment through q along n).
5. distance = |p - closest point|; pick argmin over cylinders.
6. with ``move_to_mantle`` (the labeling default), cap-case points snap to
   the *rim* ``q ± r n`` (the nearer end of the diameter segment) so that
   offset labels always land on the cylinder surface, never inside a cap.

TPU design: the (N, M) broadcast is evaluated in static-size point tiles via
``lax.map`` so VMEM/HBM footprint is bounded regardless of cloud size; each
tile is a pure vectorized computation XLA fuses into a handful of VPU loops.
Distances are accumulated as a running argmin across cylinder tiles, so M is
also unbounded. Everything is float32 — the parity target is 1e-3 and bf16
would not hold it.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Column-name candidates accepted for QSM CSV tables, in preference order
# (parity with reference Modules/Projection.py:287-297).
QSM_COLUMN_MAPPINGS = {
    "startX": ["startX", "start.x", "start_x"],
    "startY": ["startY", "start.y", "start_y"],
    "startZ": ["startZ", "start.z", "start_z"],
    "endX": ["endX", "end.x", "end_x"],
    "endY": ["endY", "end.y", "end_y"],
    "endZ": ["endZ", "end.z", "end_z"],
    "radius": ["radius", "Radius"],
    "ID": ["ID", "extension", "id"],
}

PERP_ATOL = 1e-3
NORM_EPS = 1e-8


class Cylinders(NamedTuple):
    """Structure-of-arrays cylinder set, padded to a static size.

    ``valid`` masks out padding; padded entries never win the argmin.
    """

    start: jax.Array  # (M, 3) float32
    axis_unit: jax.Array  # (M, 3) float32
    axis_length: jax.Array  # (M,) float32
    radius: jax.Array  # (M,) float32
    ids: jax.Array  # (M,) int32
    valid: jax.Array  # (M,) bool

    @property
    def end(self):
        return self.start + self.axis_unit * self.axis_length[:, None]


def make_cylinders(
    start: np.ndarray,
    end: np.ndarray,
    radius: np.ndarray,
    ids: np.ndarray | None = None,
    pad_to: int | None = None,
) -> Cylinders:
    """Build a :class:`Cylinders` from start/end/radius arrays (host side)."""
    start = np.asarray(start, dtype=np.float32)
    end = np.asarray(end, dtype=np.float32)
    radius = np.asarray(radius, dtype=np.float32)
    m = start.shape[0]
    if ids is None:
        ids = np.arange(m, dtype=np.int32)
    ids = np.asarray(ids, dtype=np.int32)

    axis = end - start
    length = np.linalg.norm(axis, axis=1)
    # Degenerate (zero-length) axes get a safe unit, mirroring the
    # eps-clamped normalization in reference Projection.py:129-132.
    safe = np.maximum(length, NORM_EPS)
    unit = axis / safe[:, None]

    valid = np.ones(m, dtype=bool)
    if pad_to is not None and pad_to > m:
        pad = pad_to - m
        start = np.concatenate([start, np.zeros((pad, 3), np.float32)])
        unit = np.concatenate(
            [unit, np.tile(np.array([[0, 0, 1]], np.float32), (pad, 1))]
        )
        length = np.concatenate([length, np.zeros(pad, np.float32)])
        radius = np.concatenate([radius, np.zeros(pad, np.float32)])
        ids = np.concatenate([ids, np.full(pad, -1, np.int32)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])

    return Cylinders(
        start=jnp.asarray(start),
        axis_unit=jnp.asarray(unit),
        axis_length=jnp.asarray(length.astype(np.float32)),
        radius=jnp.asarray(radius),
        ids=jnp.asarray(ids),
        valid=jnp.asarray(valid),
    )


def cylinders_from_dataframe(df, pad_to: int | None = None) -> Cylinders:
    """Build cylinders from a QSM table, resolving column-name variants.

    Accepts any of the CSV schemas the reference handles
    (``Modules/Projection.py:287-297``).
    """
    cols = {}
    available = list(df.columns)
    for internal, candidates in QSM_COLUMN_MAPPINGS.items():
        found = next((c for c in candidates if c in available), None)
        if found is None:
            raise KeyError(
                f"QSM table missing field {internal!r}; tried {candidates}, "
                f"available: {available}"
            )
        cols[internal] = df[found].to_numpy()
    return make_cylinders(
        start=np.stack([cols["startX"], cols["startY"], cols["startZ"]], 1),
        end=np.stack([cols["endX"], cols["endY"], cols["endZ"]], 1),
        radius=cols["radius"],
        ids=cols["ID"].astype(np.int32),
        pad_to=pad_to,
    )


def _project_tile(points: jax.Array, cyl: Cylinders, move_to_mantle: bool):
    """Core (n_tile, M) broadcast. Returns (ids, distances, offsets)."""
    p = points[:, None, :]  # (n, 1, 3)
    s = cyl.start[None, :, :]  # (1, M, 3)
    u = cyl.axis_unit[None, :, :]
    length = cyl.axis_length[None, :, None]  # (1, M, 1)
    r = cyl.radius[None, :, None]  # (1, M, 1)

    t = jnp.sum((p - s) * u, axis=2, keepdims=True)  # (n, M, 1)
    t = jnp.clip(t, 0.0, length)
    q = s + t * u  # clamped axis point

    w = p - q
    w_dot_u = jnp.sum(w * u, axis=2, keepdims=True)  # (n, M, 1)
    perpendicular = jnp.abs(w_dot_u) <= PERP_ATOL

    rejected = w - w_dot_u * u
    rej_norm = jnp.linalg.norm(rejected, axis=2, keepdims=True)
    n = rejected / jnp.maximum(rej_norm, NORM_EPS)

    mantle_point = q + n * r  # radial projection onto the mantle
    disc_point = q + jnp.minimum(rej_norm, r) * n  # nearest point of cap disc
    surface_point = jnp.where(perpendicular, mantle_point, disc_point)

    dist = jnp.linalg.norm(points[:, None, :] - surface_point, axis=2)  # (n, M)
    dist = jnp.where(cyl.valid[None, :], dist, jnp.inf)

    best = jnp.argmin(dist, axis=1)  # (n,)
    row = jnp.arange(points.shape[0])
    best_dist = dist[row, best]

    if move_to_mantle:
        # Cap-case points snap to the rim q ± r n (nearer diameter end);
        # with s_axis = min(|rej|, r) + r on the diameter [0, 2r], the start
        # end is closer iff s_axis < r, i.e. never — except |rej| < r ties
        # resolve to the far end, matching the reference's strict '<' at
        # Projection.py:100 (dist_to_start = s_axis, dist_to_end = 2r-s_axis;
        # start wins only when s_axis < r which requires |rej| < 0).
        s_axis = jnp.minimum(rej_norm, r) + r
        closer_to_start = s_axis < (2 * r - s_axis)
        rim_point = jnp.where(closer_to_start, q - r * n, q + r * n)
        final_point = jnp.where(perpendicular, mantle_point, rim_point)
    else:
        final_point = surface_point

    best_point = final_point[row, best]
    offsets = best_point - points
    ids = cyl.ids[best]
    return ids, best_dist, offsets


@partial(jax.jit, static_argnames=("move_to_mantle", "tile"))
def closest_cylinder(
    points: jax.Array,
    cyl: Cylinders,
    move_to_mantle: bool = True,
    tile: int = 4096,
):
    """Nearest cylinder for every point.

    Args:
        points: (N, 3) float32. N is padded internally to a multiple of
            ``tile``; results for pad rows are discarded.
        cyl: padded cylinder set.
        move_to_mantle: snap cap-case offsets to the mantle rim (labeling
            default, reference ``Projection.py:93-107``).
        tile: static point-tile size; bounds the (tile, M) broadcast buffer.

    Returns:
        ids (N,) int32, distances (N,) float32, offsets (N, 3) float32.
    """
    n = points.shape[0]
    n_pad = -n % tile
    padded = jnp.concatenate(
        [points.astype(jnp.float32), jnp.zeros((n_pad, 3), jnp.float32)]
    )
    tiles = padded.reshape(-1, tile, 3)

    ids, dists, offs = jax.lax.map(
        lambda pts: _project_tile(pts, cyl, move_to_mantle), tiles
    )
    return (
        ids.reshape(-1)[:n],
        dists.reshape(-1)[:n],
        offs.reshape(-1, 3)[:n],
    )


def closest_cylinder_host(
    points: np.ndarray,
    start: np.ndarray,
    end: np.ndarray,
    radius: np.ndarray,
    move_to_mantle: bool = True,
):
    """Numpy mirror of :func:`_project_tile` for host-driven loops.

    The QSM engine queries a few hundred points against tens of
    cylinders thousands of times per fit; a device round-trip per query
    costs ~250 ms under this sandbox's axon tunnel (measured: the whole
    fit ran 20-1000x slower than the reference's numpy/torch loop).
    Identical formulas and epsilon case-splits to the jnp tile — only
    the argmin's tie-breaking can differ at exact fp ties.

    Returns (ids, distances, offsets) with ids indexing the input rows.
    """
    p = points[:, None, :].astype(np.float32)  # (N, 1, 3)
    s = start[None, :, :].astype(np.float32)
    axis = (end - start).astype(np.float32)
    length = np.linalg.norm(axis, axis=1)
    u = (axis / np.maximum(length, NORM_EPS)[:, None])[None, :, :]
    ln = length[None, :, None]
    r = radius.astype(np.float32)[None, :, None]

    t = np.clip(np.sum((p - s) * u, axis=2, keepdims=True), 0.0, ln)
    q = s + t * u
    w = p - q
    w_dot_u = np.sum(w * u, axis=2, keepdims=True)
    perpendicular = np.abs(w_dot_u) <= PERP_ATOL
    rejected = w - w_dot_u * u
    rej_norm = np.linalg.norm(rejected, axis=2, keepdims=True)
    n = rejected / np.maximum(rej_norm, NORM_EPS)

    mantle_point = q + n * r
    disc_point = q + np.minimum(rej_norm, r) * n
    surface_point = np.where(perpendicular, mantle_point, disc_point)
    dist = np.linalg.norm(
        points[:, None, :].astype(np.float32) - surface_point, axis=2
    )
    best = np.argmin(dist, axis=1)
    rows = np.arange(len(points))
    best_dist = dist[rows, best]

    if move_to_mantle:
        s_axis = np.minimum(rej_norm, r) + r
        closer_to_start = s_axis < (2 * r - s_axis)
        rim_point = np.where(closer_to_start, q - r * n, q + r * n)
        final_point = np.where(perpendicular, mantle_point, rim_point)
    else:
        final_point = surface_point
    offsets = final_point[rows, best] - points[:, :3].astype(np.float32)
    return best.astype(np.int32), best_dist, offsets


def generate_offset_cloud(
    cloud: np.ndarray, cylinders_df, tile: int = 4096
) -> np.ndarray:
    """Label a cloud against a QSM: returns the (N, 7) offset-cloud format.

    Columns: xyz, offset vector to nearest cylinder surface, cylinder id.
    Parity with reference ``generate_offset_cloud_cuda_batched``
    (``Modules/Projection.py:117-144``) — but one device dispatch per tile
    batch instead of a host loop of 1024-point batches.
    """
    cyl = cylinders_from_dataframe(cylinders_df)
    pts = np.asarray(cloud)[:, :3].astype(np.float32)
    ids, _, offsets = closest_cylinder(jnp.asarray(pts), cyl, tile=tile)
    out = np.zeros((len(pts), 7), dtype=np.float32)
    out[:, :3] = pts
    out[:, 3:6] = np.asarray(offsets)
    out[:, 6] = np.asarray(ids)
    return out
