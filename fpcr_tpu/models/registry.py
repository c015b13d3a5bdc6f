"""One front door: ``fpcr_tpu.register(source, target, method=...)``.

The reference exposes ~20 per-variant ``main()``s (one executable per
configuration — /root/reference/src/CUDA/ICP_point_to_point_clean.cu,
ICP_point_to_plane_clean.cu, GPU_point_to_plane_real.cu, the
*_time_complexity_* sweeps, etc.; SURVEY.md §2.2 program inventory);
this framework's variants are config-driven, and this module gives them
a single uniform entry point for users who just want a registration:

    register(src, tgt)                        # exact ICP
    register(src, tgt, method="plane")        # point-to-plane
    register(src, tgt, method="gicp")         # Generalized-ICP
    register(src, tgt, method="ndt")          # NDT init + ICP refine
    register(src, tgt, method="global")       # FPFH+RANSAC init + refine
    register(src, tgt, method="coarse_to_fine")  # large-N pipeline
    register(src, tgt, method="aa")           # Anderson-accelerated
    register(src, tgt, method="sgd")          # stochastic mini-batch

Every method returns an ``ICPResult``-shaped object whose ``transform``
is the full composed source→target estimate. Extra keyword arguments are
forwarded into ``ICPConfig`` (e.g. ``matcher="morton"``,
``max_iterations=60``, ``robust_loss="huber"``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .icp import ICPConfig, run_icp

METHODS = ("point", "plane", "symmetric", "gicp", "ndt", "global",
           "coarse_to_fine", "aa", "sgd")

_METRIC_METHODS = {"point", "plane", "symmetric", "gicp"}


def register(
    source: jnp.ndarray,
    target: jnp.ndarray,
    method: str = "point",
    config: Optional[ICPConfig] = None,
    **config_kw,
):
    """Register ``source`` onto ``target``; see module docstring.

    ``config`` (an :class:`ICPConfig`) and ``config_kw`` are mutually
    exclusive ways to configure the underlying loop; metric-style methods
    ("point"/"plane"/"symmetric"/"gicp") set ``metric`` themselves.
    """
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}; one of {METHODS}")
    if config is not None and config_kw:
        raise ValueError("pass either config= or config keywords, not both")
    if "metric" in config_kw:
        raise ValueError(
            "pass the metric as method= (e.g. method='plane'), not metric=")

    if method in _METRIC_METHODS:
        cfg = config or ICPConfig(metric=method, **config_kw)
        if cfg.metric != method:
            import dataclasses

            cfg = dataclasses.replace(cfg, metric=method)
        return run_icp(source, target, cfg)

    if method == "sgd":
        from .sgd_icp import run_sgd_icp

        if config is not None:
            return run_sgd_icp(source, target, config)
        if config_kw:
            return run_sgd_icp(source, target, ICPConfig(**config_kw))
        # no explicit config: keep run_sgd_icp's SGD-tuned defaults
        # (200 iterations / 1e-5 EMA tolerance) — a plain ICPConfig()'s
        # 40 iters / 1e-6 stops the stochastic path far from the optimum
        # (the lr anneal has barely decayed and batch-noise EMA deltas
        # never reach 1e-6; review find r3)
        return run_sgd_icp(source, target)

    cfg = config or (ICPConfig(**config_kw) if config_kw else ICPConfig())
    if method == "ndt":
        from .ndt import register_ndt

        return register_ndt(source, target, cfg)
    if method == "global":
        from .global_reg import register_global

        return register_global(source, target, cfg)
    if method == "coarse_to_fine":
        import dataclasses

        from .pipeline import icp_coarse_to_fine

        # the coarse stage is brute-force-on-a-subset by design; the fine
        # stage honors an explicitly requested matcher, defaulting to the
        # banded large-N path
        fine_matcher = (cfg.matcher if ("matcher" in config_kw
                                        or config is not None)
                        else "morton")
        c2f = icp_coarse_to_fine(
            source, target,
            coarse_config=dataclasses.replace(cfg, matcher="xla"),
            fine_config=dataclasses.replace(cfg, matcher=fine_matcher),
        )
        return c2f.fine._replace(transform=c2f.transform)
    # method == "aa"
    from .anderson import run_aa_icp

    return run_aa_icp(source, target, cfg)
