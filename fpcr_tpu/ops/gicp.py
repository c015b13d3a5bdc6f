"""Generalized-ICP (plane-to-plane) solver: batched anisotropic 6x6
Gauss-Newton step, fully on device.

GICP (Segal, Haehnel & Thrun, RSS 2009) models every point as a Gaussian
with a surface-aligned covariance and minimizes the Mahalanobis residual

    sum_i  d_i^T (C_q_i + R C_p_i R^T)^{-1} d_i ,   d_i = T(p_i) - q_i,

which subsumes point-to-point (C = I) and point-to-plane (C_q singular
along the normal) as special cases. The reference implements neither; this
is a beyond-reference model family built from the framework's existing
pieces (kNN + PCA normals, masked psum-able moment reductions, on-device
6x6 Cholesky — see fpcr_tpu/ops/solve.py and the reference's Cxb analog at
/root/reference/src/CUDA/ICP_point_to_plane_clean.cu:240-283).

TPU-first design notes:

* With the canonical GICP regularization (surface eigenvalues -> (eps,1,1))
  a point's covariance is fully determined by its normal:
  ``C = I - (1-eps) n n^T``. Only normals are stored; no [N,3,3]
  covariance arrays live in HBM.
* The per-point 3x3 inverse ``M_i = (C_p_i + C_q_i)^{-1}`` is a closed-form
  batched adjugate (``inv3x3_sym``) — pure VPU arithmetic, no lax.linalg
  custom call, vmap/shard_map friendly.
* The 6x6 system ``H x = -g`` is assembled from per-point 3x3 einsum
  blocks and reduced with masked sums; H and g are psum'd over the mesh
  axis exactly like the point/plane moments, so distributed GICP falls out
  of the same ``axis_name`` plumbing.
* The rotation update uses the exact SO(3) exponential map
  (``core.transforms.rotation_exp``) rather than an Euler rebuild.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.transforms import RigidTransform, rotation_exp


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def normal_covariances(normals: jnp.ndarray, epsilon: float) -> jnp.ndarray:
    """GICP surface covariances from unit normals: ``C = I - (1-eps) n n^T``
    (eigenvalues (eps, 1, 1) with the eps-axis along the normal)."""
    eye = jnp.eye(3, dtype=normals.dtype)
    outer = normals[:, :, None] * normals[:, None, :]  # elementwise, no MXU
    return eye - (1.0 - epsilon) * outer


def inv3x3_sym(A: jnp.ndarray, floor: float = 1e-12) -> jnp.ndarray:
    """Batched closed-form inverse of symmetric 3x3 matrices [N,3,3] via the
    adjugate — elementwise VPU arithmetic only (no LU custom call).

    ``floor`` guards the determinant against (numerically) singular inputs;
    GICP inputs satisfy ``A = 2I - PSD`` with eigenvalues >= 2*eps, so the
    guard never binds on valid data.
    """
    a, b, c = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    e, f = A[:, 1, 1], A[:, 1, 2]
    i = A[:, 2, 2]
    # cofactors of the symmetric matrix [[a,b,c],[b,e,f],[c,f,i]]
    A11 = e * i - f * f
    A12 = c * f - b * i
    A13 = b * f - c * e
    A22 = a * i - c * c
    A23 = b * c - a * f
    A33 = a * e - b * b
    det = a * A11 + b * A12 + c * A13
    inv_det = 1.0 / jnp.where(jnp.abs(det) > floor, det,
                              jnp.where(det >= 0, floor, -floor))
    M = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A12, A22, A23], axis=-1),
        jnp.stack([A13, A23, A33], axis=-1),
    ], axis=-2)
    return M * inv_det[:, None, None]


def _skew(p: jnp.ndarray) -> jnp.ndarray:
    """Batched skew-symmetric matrices [N,3,3] with ``S_i v = p_i x v``."""
    zeros = jnp.zeros_like(p[:, 0])
    return jnp.stack([
        jnp.stack([zeros, -p[:, 2], p[:, 1]], axis=-1),
        jnp.stack([p[:, 2], zeros, -p[:, 0]], axis=-1),
        jnp.stack([-p[:, 1], p[:, 0], zeros], axis=-1),
    ], axis=-2)


def gicp_normal_equations(
    p: jnp.ndarray,
    q: jnp.ndarray,
    source_normals: jnp.ndarray,
    target_normals: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    epsilon: float = 1e-3,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble the 6x6 GICP Gauss-Newton system ``H x = -g`` linearized at
    the current pose (``p`` already transformed; ``source_normals`` already
    rotated).

    Residual model r(x) = r0 - S_i w + t with r0 = p - q, S = skew(p),
    x = (w, t); per-point metric M_i = (C_p_i + C_q_i)^{-1}.
    Returns (H [6,6], g [6]) with mask weights applied and moments psum'd.
    """
    f32 = jnp.float32
    p = p.astype(f32)
    q = q.astype(f32)

    def _unit(n):
        # defensive renormalization: ||n|| > 1 makes C = I - (1-eps) n n^T
        # indefinite, which can push A near-singular when the two normals
        # align (the convergence regime) and explode the inverse
        n = n.astype(f32)
        return n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True),
                               1e-12)

    A = (normal_covariances(_unit(source_normals), epsilon)
         + normal_covariances(_unit(target_normals), epsilon))
    M = inv3x3_sym(A)  # [N,3,3]

    if mask is not None:
        w = mask.astype(f32)
        M = M * w[:, None, None]

    S = _skew(p)
    r0 = p - q
    # full-f32 precision on every contraction: default bf16 MXU passes are
    # enough to make H indefinite and NaN the Cholesky on TPU (the same
    # failure mode as the bf16 extraction matmuls in docs/performance.md)
    hi = jax.lax.Precision.HIGHEST
    MS = jnp.einsum("nij,njk->nik", M, S, precision=hi)  # M S
    # J = [-S, I]  =>  H blocks: [[S^T M S, -S^T M], [-M S, M]]
    St = jnp.swapaxes(S, 1, 2)
    B11 = jnp.sum(jnp.einsum("nij,njk->nik", St, MS, precision=hi), axis=0)
    B12 = -jnp.sum(jnp.einsum("nij,njk->nik", St, M, precision=hi), axis=0)
    B22 = jnp.sum(M, axis=0)
    Mr = jnp.einsum("nij,nj->ni", M, r0, precision=hi)
    g1 = -jnp.sum(jnp.einsum("nij,nj->ni", St, Mr, precision=hi), axis=0)
    g2 = jnp.sum(Mr, axis=0)

    H = jnp.block([[B11, B12], [B12.T, B22]])
    g = jnp.concatenate([g1, g2])
    return _psum(H, axis_name), _psum(g, axis_name)


def gicp_solve_update(
    H: jnp.ndarray,
    g: jnp.ndarray,
    damping: float = 0.0,
) -> Tuple[RigidTransform, jnp.ndarray]:
    """Solve ``H x = -g`` (6x6 Cholesky on device) and rebuild the increment
    with the exact SO(3) exponential. Same relative-floor guard as the
    plane solve (ops/solve.py::plane_solve_update): a collapsed inlier set
    yields an identity update, never NaN."""
    if damping:
        H = H + damping * jnp.eye(6, dtype=H.dtype)
    floor = 1e-7 * (jnp.trace(H) / 6.0) + 1e-30
    H = H + floor * jnp.eye(6, dtype=H.dtype)
    chol, lower = jax.scipy.linalg.cho_factor(H)
    x = jax.scipy.linalg.cho_solve((chol, lower), -g)
    R = rotation_exp(x[:3]).astype(H.dtype)
    return RigidTransform(R, x[3:6]), x


def gicp_transform(
    p: jnp.ndarray,
    q: jnp.ndarray,
    source_normals: jnp.ndarray,
    target_normals: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    epsilon: float = 1e-3,
    damping: float = 0.0,
    axis_name: Optional[str] = None,
) -> RigidTransform:
    """One GICP Gauss-Newton step: current points, matched targets and both
    clouds' normals (source normals rotated to the current pose) ->
    incremental rigid transform."""
    H, g = gicp_normal_equations(
        p, q, source_normals, target_normals, mask,
        epsilon=epsilon, axis_name=axis_name,
    )
    transform, _ = gicp_solve_update(H, g, damping)
    return transform
