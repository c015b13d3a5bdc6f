"""kNN search and PCA surface-normal estimation — streaming, on device.

Replaces the reference's normals prepass
(/root/reference/src/CUDA/ICP_point_to_plane_clean.cu:433-497):

* its ``knn`` kernel materializes the FULL MxM distance matrix in global
  memory (cudaMalloc of p_points*q_points floats, :442) and then does k+1
  sequential selection passes with a sentinel overwrite (:75-85). Here kNN
  streams target tiles with a running top-k carried in registers/VMEM
  (``lax.top_k`` over [carry | tile] concatenation) — O(chunk·tile) memory,
  never O(N·M).
* its ``Normals`` kernel computes neighbor centroid + covariance upper
  triangle on device (:97-123) but then ships all 9M covariance entries to
  the HOST for per-point LAPACKE_ssyev eigensolves (:487-497). Here the
  covariance build is a batched einsum and the eigensolve is the closed-form
  device kernel in ``eigh3.py`` — zero host round trips.

Semantics parity: k+1 nearest neighbors *including self* are found, then the
nearest (self, distance 0) is dropped, so the centroid/covariance use exactly
the k non-self neighbors, as in the reference (loops from j=1 to k,
:97-123; default k=4, :436). Normals are unoriented, like the reference's
(SURVEY.md §8).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.cloud import round_up
from .eigh3 import smallest_eigenvector
from .matching import _pad_to, pairwise_sqdist, pairwise_sqdist_exact

# plain python float: a module-level jnp scalar would eagerly
# initialize the backend (and could leak a tracer) at import time.
_BIG = float("inf")


@functools.partial(jax.jit, static_argnames=("k", "chunk", "tile", "exact"))
def knn(
    p: jnp.ndarray,
    q: jnp.ndarray,
    k: int,
    q_mask: Optional[jnp.ndarray] = None,
    *,
    chunk: int = 1024,
    tile: int = 2048,
    exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest targets for every query point, streaming over target tiles.

    Returns ``(idx int32[N, k], sqdist float32[N, k])`` sorted ascending by
    distance. Ties prefer earlier target indices (reference ``minimum``
    keeps the first strict min, ICP_point_to_plane_clean.cu:33-47).
    """
    n, m = p.shape[0], q.shape[0]
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)

    sc = min(chunk, round_up(n, 8))
    tt = min(tile, round_up(m, 8))
    n_pad = round_up(n, sc)
    m_pad = round_up(m, tt)

    p_padded = _pad_to(p, n_pad, 0.0)
    q_padded = _pad_to(q, m_pad, 0.0)
    if q_mask is None:
        valid_q = jnp.arange(m_pad) < m
    else:
        valid_q = _pad_to(q_mask, m_pad, False)

    num_tiles = m_pad // tt
    q_tiles = q_padded.reshape(num_tiles, tt, 3)
    mask_tiles = valid_q.reshape(num_tiles, tt)
    tile_bases = jnp.arange(num_tiles, dtype=jnp.int32) * tt

    dist_fn = pairwise_sqdist_exact if exact else pairwise_sqdist

    def per_chunk(p_chunk):
        rows = p_chunk.shape[0]

        def step(carry, tile_in):
            best_d, best_i = carry  # [rows, k] each
            q_tile, tmask, base = tile_in
            d = dist_fn(p_chunk, q_tile)
            d = jnp.where(tmask[None, :], d, _BIG)
            tile_idx = base + lax.broadcasted_iota(jnp.int32, d.shape, 1)
            cat_d = jnp.concatenate([best_d, d], axis=1)
            cat_i = jnp.concatenate([best_i, tile_idx], axis=1)
            # top_k of negated distances = k smallest; stable order keeps
            # earlier (carried, i.e. lower-index) entries on ties.
            neg_top, pos = lax.top_k(-cat_d, k)
            new_i = jnp.take_along_axis(cat_i, pos, axis=1)
            return (-neg_top, new_i), None

        init = (
            jnp.full((rows, k), _BIG, dtype=jnp.float32),
            jnp.zeros((rows, k), dtype=jnp.int32),
        )
        (best_d, best_i), _ = lax.scan(step, init, (q_tiles, mask_tiles, tile_bases))
        return best_d, best_i

    num_chunks = n_pad // sc
    if num_chunks == 1:
        best_d, best_i = per_chunk(p_padded)
    else:
        best_d, best_i = lax.map(per_chunk, p_padded.reshape(num_chunks, sc, 3))
        best_d = best_d.reshape(n_pad, k)
        best_i = best_i.reshape(n_pad, k)

    return best_i[:n], best_d[:n]


def self_knn(
    q: jnp.ndarray,
    kk: int,
    mask: Optional[jnp.ndarray] = None,
    *,
    chunk: int = 2048,
    tile: int = 2048,
    exact: bool = False,
    banded_threshold: int = 100_000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Self-kNN dispatch shared by the neighborhood prepasses
    (``estimate_normals``, ``fpfh_features``): the O(M²) streaming search
    below ``banded_threshold`` points, the Morton-banded O(M·band) search
    above it. ``kk`` INCLUDES the self slot (callers drop column 0).

    * the banded chunk is clamped monotonically at 1024: smaller chunks
      (e.g. 256) halve the Morton seam coverage on >100k clouds (the
      banded window extends half a chunk each side);
    * ``exact=True`` (difference-form, cancellation-free distances) is
      honored at EVERY size — the approximate banded search cannot provide
      it, so the streaming path is used instead of silently degrading.
    """
    if q.shape[0] > banded_threshold and not exact:
        from .morton import knn_morton

        return knn_morton(q, kk, mask, chunk=min(chunk, 1024))
    return knn(q, q, kk, mask, chunk=chunk, tile=tile, exact=exact)


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "tile", "exact", "include_self",
                              "banded_threshold")
)
def estimate_normals(
    q: jnp.ndarray,
    k: int = 4,
    mask: Optional[jnp.ndarray] = None,
    *,
    chunk: int = 1024,
    tile: int = 2048,
    exact: bool = False,
    include_self: bool = False,
    banded_threshold: int = 100_000,
) -> jnp.ndarray:
    """Unoriented PCA normals of a cloud from its k nearest (non-self)
    neighbors — the reference pipeline's prepass, entirely on device.

    Args:
      q: ``[M, 3]`` cloud (the ICP *target*).
      k: neighbors per point excluding self (reference default 4).
      mask: optional validity mask for padded clouds.
      include_self: if True, the point itself also joins its neighborhood
        (a mild robustness improvement the reference does not do).
      banded_threshold: cloud size above which the O(M²) streaming kNN
        gives way to the Morton-banded O(M·band) search (exposed as
        ``ICPConfig.normals_banded_threshold``).

    Returns ``[M, 3]`` unit normals (fallback (1,1,1)/sqrt(3) for degenerate
    neighborhoods, matching the reference's device-kernel fallback).
    """
    m = q.shape[0]
    q = q.astype(jnp.float32)
    # k+1 including self, then drop the nearest (= self at distance 0).
    # Above banded_threshold points the O(M²) streaming search gives way to
    # the Morton-banded O(M·band) search (ops/morton.py) — PCA normals only
    # need *near* neighbors, which the bands always contain.
    idx_all, _ = self_knn(q, k + 1, mask, chunk=chunk, tile=tile,
                          exact=exact, banded_threshold=banded_threshold)
    nbr_idx = idx_all[:, 0:] if include_self else idx_all[:, 1:]  # [M, k(+1)]

    nbrs = jnp.take(q, nbr_idx, axis=0)  # [M, kk, 3]
    centroid = jnp.mean(nbrs, axis=1, keepdims=True)  # [M, 1, 3]
    dev = nbrs - centroid
    # per-point 3x3 covariance (not normalized — scale doesn't change the
    # eigenvectors; the reference also skips the 1/k factor)
    cov = jnp.einsum("mki,mkj->mij", dev, dev,
                     precision=jax.lax.Precision.HIGHEST)
    normals, _ = smallest_eigenvector(cov)
    return normals


def orient_normals(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    viewpoint: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flip unoriented PCA normals to a consistent sign.

    ``viewpoint=None`` orients every normal AWAY from the cloud centroid
    (right for roughly star-shaped/convex scans); otherwise normals point
    TOWARD the given viewpoint (the usual sensor-origin convention). The
    reference leaves normals unoriented (SURVEY.md §8) — fine for squared
    plane residuals, but sign-sensitive consumers (FPFH features,
    visualization) need this.
    """
    points = points.astype(jnp.float32)
    if viewpoint is None:
        ref = points - jnp.mean(points, axis=0, keepdims=True)
    else:
        ref = jnp.asarray(viewpoint, jnp.float32)[None, :] - points
    s = jnp.sign(jnp.sum(normals * ref, axis=1, keepdims=True))
    return normals * jnp.where(s == 0, 1.0, s)


def normals_with_curvature(
    q: jnp.ndarray,
    k: int = 4,
    mask: Optional[jnp.ndarray] = None,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normals plus the surface-variation curvature proxy
    ``lam_min / (lam0+lam1+lam2)`` (useful for downstream filtering;
    not in the reference)."""
    from .eigh3 import eigvals3

    q = q.astype(jnp.float32)
    idx_all, _ = knn(q, q, k + 1, mask, **kwargs)
    nbrs = jnp.take(q, idx_all[:, 1:], axis=0)
    centroid = jnp.mean(nbrs, axis=1, keepdims=True)
    dev = nbrs - centroid
    cov = jnp.einsum("mki,mkj->mij", dev, dev,
                     precision=jax.lax.Precision.HIGHEST)
    normals, lam_min = smallest_eigenvector(cov)
    lams = eigvals3(cov)
    trace = jnp.sum(lams, axis=-1)
    curvature = lam_min / jnp.where(trace > 0, trace, 1.0)
    return normals, curvature
