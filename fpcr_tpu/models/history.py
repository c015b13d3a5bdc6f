"""ICP with full per-iteration history + checkpoint/resume.

The reference's closest artifact is the CPU baseline storing every
intermediate transformed cloud in ``pt_total`` for post-hoc export
(/root/reference/src/ICP_CPU.c:196-201,254,409-448). Here the history is a
first-class, statically-shaped ``lax.scan`` output — per-iteration incremental
transforms, accumulated transforms and errors — plus simple npz checkpoint
save/load so a long registration can be resumed or audited.
"""

from __future__ import annotations

import dataclasses
import functools
import json
from pathlib import Path
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.transforms import RigidTransform
from .icp import (ICPConfig, build_matcher_state, icp_iteration,
                  rotation_angle)


class ICPHistory(NamedTuple):
    transform: RigidTransform  # final accumulated transform
    incremental_rotations: jnp.ndarray  # [T, 3, 3]
    incremental_translations: jnp.ndarray  # [T, 3]
    accumulated_rotations: jnp.ndarray  # [T, 3, 3]
    accumulated_translations: jnp.ndarray  # [T, 3]
    errors: jnp.ndarray  # [T]
    active: jnp.ndarray  # [T] bool — iteration actually executed
    num_iterations: jnp.ndarray
    converged: jnp.ndarray
    points: jnp.ndarray
    matched_fraction: jnp.ndarray  # [T] post-trim inlier fraction
    delta_t: jnp.ndarray  # [T] ‖Δt‖ per increment
    delta_rot: jnp.ndarray  # [T] ∠ΔR (radians) per increment


@functools.partial(jax.jit, static_argnames=("config", "axis_name"))
def run_icp_with_history(
    source: jnp.ndarray,
    target: jnp.ndarray,
    config: ICPConfig = ICPConfig(),
    target_normals: Optional[jnp.ndarray] = None,
    source_mask: Optional[jnp.ndarray] = None,
    target_mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> ICPHistory:
    """Fixed-trip ``lax.scan`` ICP: convergence is handled by masking
    (iterations after the stop are no-ops), so every per-iteration artifact
    has a static shape — jit/vjp/shard_map friendly."""
    symmetric = config.metric in ("symmetric", "gicp")  # carries source normals
    if (config.metric in ("plane", "symmetric", "gicp")
            and target_normals is None):
        from ..ops.normals import estimate_normals

        target_normals = estimate_normals(
            target, k=config.k_neighbors, mask=target_mask,
            chunk=config.source_chunk, tile=config.target_tile,
            banded_threshold=config.normals_banded_threshold,
        )
    source_normals = None
    if symmetric:
        from ..ops.normals import estimate_normals

        source_normals = estimate_normals(
            source, k=config.k_neighbors, mask=source_mask,
            chunk=config.source_chunk, tile=config.target_tile,
            banded_threshold=config.normals_banded_threshold,
        )

    tol = jnp.float32(config.tolerance)
    matcher_state = build_matcher_state(target, target_mask, config,
                                        target_normals=target_normals)

    source = source.astype(jnp.float32)
    unsort = None
    if config.matcher == "morton":
        from ..ops.morton import source_morton_order

        order = source_morton_order(source, matcher_state[0][0])
        source = jnp.take(source, order, axis=0)
        if source_mask is not None:
            source_mask = jnp.take(source_mask, order)
        if symmetric:
            source_normals = jnp.take(source_normals, order, axis=0)
        unsort = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=jnp.int32))

    def step(carry, _):
        points, normals, acc, prev_e, done = carry
        new_points, inc, error, aux = icp_iteration(
            points, target, config,
            source_mask=source_mask, target_mask=target_mask,
            target_normals=target_normals, axis_name=axis_name,
            matcher_state=matcher_state,
            source_normals=normals if symmetric else None,
        )
        # freeze the state once converged (masked no-op iteration)
        identity = RigidTransform.identity()
        inc_eff = jax.tree.map(
            lambda a, b: jnp.where(done, a, b), identity, inc
        )
        new_points = jnp.where(done, points, new_points)
        new_normals = (jnp.matmul(normals, inc_eff.rotation.T,
                                  precision=jax.lax.Precision.HIGHEST)
                       if symmetric else normals)  # full-f32: bf16 drifts ||n||
        error = jnp.where(done, prev_e, error)
        acc_new = inc_eff.compose(acc)
        now_done = jnp.logical_or(
            done, jnp.logical_or(error < tol, jnp.abs(error - prev_e) < tol)
        )
        out = (inc_eff.rotation, inc_eff.translation,
               acc_new.rotation, acc_new.translation, error, ~done,
               jnp.where(done, jnp.nan, aux.matched_fraction),
               jnp.linalg.norm(inc_eff.translation),
               rotation_angle(inc_eff.rotation))
        return (new_points, new_normals, acc_new, error, now_done), out

    init = (
        source.astype(jnp.float32),
        (source_normals.astype(jnp.float32) if symmetric
         else jnp.zeros((1, 3), jnp.float32)),
        RigidTransform.identity(),
        jnp.float32(jnp.inf),
        jnp.bool_(False),
    )
    (points, _, acc, _, done), outs = lax.scan(
        step, init, None, length=config.max_iterations
    )
    if unsort is not None:
        points = jnp.take(points, unsort, axis=0)
    (inc_r, inc_t, acc_r, acc_t, errors, active,
     matched_fraction, delta_t, delta_rot) = outs
    return ICPHistory(
        transform=acc,
        incremental_rotations=inc_r,
        incremental_translations=inc_t,
        accumulated_rotations=acc_r,
        accumulated_translations=acc_t,
        errors=errors,
        active=active,
        num_iterations=jnp.sum(active.astype(jnp.int32)),
        converged=done,
        points=points,
        matched_fraction=matched_fraction,
        delta_t=delta_t,
        delta_rot=delta_rot,
    )


def _checkpoint_paths(path: Union[str, Path]) -> tuple:
    """ONE filename convention for save and load: numpy APPENDS '.npz' to a
    path without that suffix, so both sides must do the same — a
    with_suffix() on load would REPLACE a foreign suffix ('run.ckpt' →
    'run.npz') and miss the 'run.ckpt.npz' that save actually wrote
    (review find r3). The config sidecar sits next to the npz."""
    path = Path(path)
    npz = path if path.suffix == ".npz" else path.with_name(path.name + ".npz")
    sidecar = npz.with_name(npz.name[: -len(".npz")] + ".config.json")
    return npz, sidecar


def save_checkpoint(path: Union[str, Path], history: ICPHistory,
                    config: ICPConfig) -> Path:
    """Persist a registration run (npz arrays + json config sidecar).
    Returns the actual npz path written ('.npz' appended if absent)."""
    npz, sidecar = _checkpoint_paths(path)
    npz.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        npz,
        **{k: np.asarray(v) for k, v in history._asdict().items()
           if k != "transform"},
        rotation=np.asarray(history.transform.rotation),
        translation=np.asarray(history.transform.translation),
    )
    sidecar.write_text(json.dumps(dataclasses.asdict(config), indent=2))
    return npz


def load_checkpoint(path: Union[str, Path]):
    """Load a saved run → (ICPHistory of numpy arrays, ICPConfig)."""
    npz, config_path = _checkpoint_paths(path)
    data = np.load(npz)
    transform = RigidTransform(
        jnp.asarray(data["rotation"]), jnp.asarray(data["translation"])
    )
    history = ICPHistory(
        transform=transform,
        incremental_rotations=data["incremental_rotations"],
        incremental_translations=data["incremental_translations"],
        accumulated_rotations=data["accumulated_rotations"],
        accumulated_translations=data["accumulated_translations"],
        errors=data["errors"],
        active=data["active"],
        num_iterations=data["num_iterations"],
        converged=data["converged"],
        points=data["points"],
        # new-in-round-2 fields: tolerate older checkpoints
        matched_fraction=(data["matched_fraction"]
                          if "matched_fraction" in data else None),
        delta_t=data["delta_t"] if "delta_t" in data else None,
        delta_rot=data["delta_rot"] if "delta_rot" in data else None,
    )
    config = None
    if config_path.exists():
        config = ICPConfig(**json.loads(config_path.read_text()))
    return history, config


def resume_icp(
    checkpoint: ICPHistory,
    target: jnp.ndarray,
    config: ICPConfig,
    **kwargs,
) -> ICPHistory:
    """Continue a registration from a checkpoint's transformed points; the
    returned history composes on top of the checkpoint's transform."""
    cont = run_icp_with_history(
        jnp.asarray(checkpoint.points), target, config, **kwargs
    )
    total = cont.transform.compose(
        RigidTransform(jnp.asarray(checkpoint.transform.rotation),
                       jnp.asarray(checkpoint.transform.translation))
    )
    return cont._replace(transform=total)
