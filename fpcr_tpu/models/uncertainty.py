"""Registration uncertainty: the 6-dof pose covariance at convergence.

A registration result is an *estimate*; downstream consumers — the
pose-graph back-end above all — need to know how good. This module
implements the standard Gauss-Newton (Censi 2007, "An accurate
closed-form estimate of ICP's covariance") approximation

    Σ_pose ≈ σ² · H⁻¹,     H = Σ_i J_iᵀ J_i,

evaluated at the CONVERGED pose with one fresh correspondence pass:

* plane metric: scalar residuals ``r_i = (p_i − q_i)·n_i`` with
  ``J_i = [p_i×n_i, n_i]`` — exactly the `plane_normal_equations` H.
* point metric: 3-D residuals ``r_i = p_i − q_i`` with
  ``J_i = [−[p_i]×  |  I]`` (rotation block first, matching the plane
  parametrization [θ, t]).

``σ²`` defaults to the measured residual variance per degree of freedom
(the noise level the data itself exhibits); pass a known sensor variance
to override.

The [θ, t] covariance converts to the pose-graph's ``[ρ, w]`` tangent
ordering with :func:`information_from_covariance`, giving ``close_loops``
per-edge 6×6 information matrices instead of scalar weights — edges from
well-constrained registrations pull harder, sloppy ones less, axis by
axis. The CUDA reference has no uncertainty story (its result is the
bare printf'd transform, /root/reference/src/CUDA/
ICP_point_to_point_clean.cu:458-465); this is beyond-reference
capability built on the same J/H machinery as ``ops/solve.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.transforms import RigidTransform
from .icp import ICPConfig, build_matcher_state, _correspondences

_PREC = jax.lax.Precision.HIGHEST


def registration_covariance(
    source: jnp.ndarray,
    target: jnp.ndarray,
    transform: RigidTransform,
    config: Optional[ICPConfig] = None,
    *,
    sigma2: Optional[float] = None,
    target_normals: Optional[jnp.ndarray] = None,
    target_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """6×6 pose covariance (order ``[θx θy θz, tx ty tz]``) of a converged
    registration, from one correspondence pass at the final pose.

    Uses the ``config`` matcher/metric (default: exact matcher, plane
    J's if normals are available or computable — plane J's are the
    better-conditioned covariance model for surface scans).
    """
    config = config or ICPConfig()
    src = transform.apply(source.astype(jnp.float32))
    tgt = target.astype(jnp.float32)

    if config.metric in ("plane", "symmetric", "gicp") and target_normals is None:
        from ..ops.normals import estimate_normals

        target_normals = estimate_normals(
            tgt, k=config.k_neighbors, mask=target_mask,
            banded_threshold=config.normals_banded_threshold)

    state = build_matcher_state(tgt, target_mask, config, target_normals)
    if config.matcher == "morton":
        # the band matcher wants spatially coherent sources; H/σ² are sums
        # over points, so the permutation is harmless as long as p_i/q_i
        # stay PAIRED — sort src and use the sorted order throughout
        from ..ops.morton import source_morton_order

        order = source_morton_order(src, state[0][0])
        src = jnp.take(src, order, axis=0)
    q_m, n_m, dmin, found = _correspondences(
        src, tgt, target_mask, target_normals, config, state)
    # the SAME trimming/robust pipeline the ICP loop applies — morton
    # window misses carry unbounded distances and MUST be auto-trimmed
    # out of H and σ² exactly as they are trimmed out of the solve
    from .icp import correspondence_weights

    mask = correspondence_weights(dmin, found, config)
    w = (jnp.ones((src.shape[0],), jnp.float32) if mask is None
         else mask.astype(jnp.float32))
    n_eff = jnp.maximum(jnp.sum(w), 1.0)

    if n_m is not None:
        # plane model: H is exactly plane_normal_equations' C
        from ..ops.solve import plane_normal_equations

        H, _ = plane_normal_equations(src, q_m, n_m, mask=w)
        r = jnp.sum((src - q_m) * n_m, axis=1)
        s2 = (jnp.sum(w * r * r) / n_eff) if sigma2 is None else jnp.float32(sigma2)
    else:
        # point model: J_i = [-[p]x | I] per 3-D residual; H = sum J^T J
        # closed form: H_tt = n_eff*I, H_θθ = Σ w ([p]x^T [p]x),
        # H_θt = Σ w (-[p]x)^T = Σ w [p]x
        x = src * w[:, None]
        # Σ w [p]×ᵀ[p]× = Σ w (|p|² I − p pᵀ)
        pp = jax.lax.dot_general(
            x, src, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC)
        p2 = jnp.trace(pp)
        H_tt = n_eff * jnp.eye(3)
        H_thth = p2 * jnp.eye(3) - pp
        s = jnp.sum(x, axis=0)
        sx = jnp.array([
            [0.0, -s[2], s[1]],
            [s[2], 0.0, -s[0]],
            [-s[1], s[0], 0.0],
        ])
        # H_θt = Σ w [p]× (from (−[p]×)ᵀ · I blocks)
        H = jnp.block([[H_thth, sx], [sx.T, H_tt]])
        r = src - q_m
        s2 = (jnp.sum(w[:, None] * r * r) / (3.0 * n_eff)
              if sigma2 is None else jnp.float32(sigma2))

    floor = 1e-9 * (jnp.trace(H) / 6.0) + 1e-30
    Hf = H + floor * jnp.eye(6)
    cov = s2 * jnp.linalg.inv(Hf)
    return 0.5 * (cov + cov.T)  # symmetrize away inversion noise


def information_from_covariance(
    cov_tt: jnp.ndarray,
    transform: Optional[RigidTransform] = None,
) -> jnp.ndarray:
    """[θ, t]-ordered registration covariance → [ρ, w]-ordered 6×6
    information matrix in the pose graph's RIGHT-tangent convention
    (``models/pose_graph.py``: ``Z = Ẑ·exp(ε)``).

    The Censi covariance describes a LEFT perturbation of the estimated
    transform (``p ↦ p + θ×p + t`` applied after Ẑ): with
    ``exp(δ_left)·Ẑ = Ẑ·exp(ε)``, the right-tangent error is
    ``ε = Ad(Ẑ⁻¹)·δ_left``. Pass the converged ``transform`` (= the edge
    measurement Ẑ) to apply that transport — REQUIRED for edges far from
    identity (e.g. a facing-the-other-way loop closure), where a bare
    permutation would rotate the information axes wrongly. ``None``
    keeps the near-identity approximation.
    """
    perm = jnp.asarray([3, 4, 5, 0, 1, 2])
    cov_rw = cov_tt[perm][:, perm]
    if transform is not None:
        from .pose_graph import se3_adjoint, se3_inv

        top = jnp.concatenate(
            [transform.rotation,
             transform.translation[:, None].astype(jnp.float32)], axis=1)
        M = jnp.concatenate(
            [top, jnp.asarray([[0.0, 0.0, 0.0, 1.0]])], axis=0)
        A = se3_adjoint(se3_inv(M))
        cov_rw = jnp.matmul(
            A, jnp.matmul(cov_rw, A.T, precision=_PREC), precision=_PREC)
    floor = 1e-12 * (jnp.trace(cov_rw) / 6.0) + 1e-30
    return jnp.linalg.inv(cov_rw + floor * jnp.eye(6))
