"""Registration error metrics.

The reference's per-iteration error is the Frobenius RMS of the residual
between the transformed source and its matched target points:
``E = ||p - q_idx||_F / sqrt(N)``
(/root/reference/src/CUDA/ICP_point_to_point_clean.cu:446-456 — cublasScopy +
Saxpy(-1) + Snrm2, divided by sqrt(N)). Note the point-to-plane driver reports
this same *point* metric (/root/reference/src/CUDA/ICP_point_to_plane_clean.cu:684-688).

All metrics are mask-aware and optionally ``psum`` over a mesh axis so the
identical code runs single-chip and sharded (shard_map) without modification.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def masked_count(mask: Optional[jnp.ndarray], n: int, dtype, axis_name=None):
    if mask is None:
        return _psum(jnp.asarray(n, dtype=dtype), axis_name)
    return _psum(jnp.sum(mask.astype(dtype)), axis_name)


def rmse(
    p: jnp.ndarray,
    q: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """RMS registration error between paired clouds ``[N, 3]``.

    ``sqrt(sum_i ||p_i - q_i||^2 / N_valid)`` — identical to the reference's
    ``Snrm2 / sqrt(N)`` when ``mask`` is None.
    """
    diff = p - q
    sq = jnp.sum(diff * diff, axis=-1)
    if mask is not None:
        # mask may be boolean (valid/invalid) or float (IRLS weights)
        sq = sq * mask.astype(sq.dtype)
    total = _psum(jnp.sum(sq), axis_name)
    count = masked_count(mask, p.shape[0], p.dtype, axis_name)
    return jnp.sqrt(total / jnp.maximum(count, 1.0))


def transform_rmse(t_est, t_ref, probe_points: jnp.ndarray) -> jnp.ndarray:
    """RMS discrepancy of two transforms measured on probe points — the parity
    measure used to compare against the CUDA reference (BASELINE.md: transform
    parity 1e-5 on Bunny / hall scan)."""
    return rmse(t_est.apply(probe_points), t_ref.apply(probe_points))


def evaluate_registration(
    source: jnp.ndarray,
    target: jnp.ndarray,
    transform=None,
    *,
    max_correspondence_dist: Optional[float] = None,
    target_mask: Optional[jnp.ndarray] = None,
    source_chunk: int = 2048,
    target_tile: int = 2048,
):
    """Post-hoc quality of an alignment: nearest-neighbor fitness and
    inlier RMSE (the PCL/Open3D ``evaluate_registration`` convention).

    Applies ``transform`` (None = identity, i.e. the clouds are already
    aligned), matches every source point to its nearest target point with
    the streaming MXU argmin, and reports over the matches within
    ``max_correspondence_dist`` (None = auto: 2× the target's median point
    spacing — a fixed constant would be meaningless across scene scales):

    * ``fitness`` — inlier matches / N (overlap estimate in [0, 1]);
    * ``inlier_rmse`` — RMS Euclidean distance over the inliers;
    * ``num_inliers`` — the inlier count.

    Unlike the in-loop error sequence (which reports the metric being
    optimized), this is a metric-independent check usable on any result —
    ICP, NDT, global registration, or an external pose. Returns a dict of
    device scalars.
    """
    from ..ops.matching import nn_argmin

    if max_correspondence_dist is None:
        from ..ops.grid import suggest_cell_size

        max_correspondence_dist = suggest_cell_size(target, scale=2.0)
    pts = source if transform is None else transform.apply(source)
    # exact (difference-form) distances: the matmul expansion's ~1e-7 f32
    # noise in squared units would floor the reported RMSE at ~3e-4 — too
    # coarse for a quality diagnostic on well-converged alignments
    _, dmin = nn_argmin(pts, target, target_mask, exact=True,
                        source_chunk=source_chunk, target_tile=target_tile)
    # nn_argmin returns squared distances (difference form)
    thresh = jnp.asarray(max_correspondence_dist, pts.dtype) ** 2
    inlier = dmin <= thresh
    num = jnp.sum(inlier)
    denom = jnp.maximum(num, 1)
    mse = jnp.sum(jnp.where(inlier, jnp.maximum(dmin, 0.0), 0.0)) / denom
    return {
        "fitness": num / pts.shape[0],
        "inlier_rmse": jnp.sqrt(mse),
        "num_inliers": num,
        # the gate actually used (reports the auto-resolved value)
        "max_correspondence_dist": jnp.asarray(max_correspondence_dist,
                                               pts.dtype),
    }
