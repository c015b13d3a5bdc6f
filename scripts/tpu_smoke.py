"""Real-TPU correctness smoke: asserts the TPU-only numerics each round.

VERDICT r2 #8: the CI suite runs on the virtual CPU mesh (the single chip
is driver-held), so the class of TPU-only numerical bugs BENCH_NOTES
records finding twice — bf16 normals rotation drift, elided bf16 splits
under --xla_allow_excess_precision — had no automated guard. This script
is that guard: a few minutes of chip time asserting CORRECTNESS (not
speed) on real hardware. Exit nonzero on any regression.

Checks:
  1. packed6 vs highest Pallas brute matcher: argmin agreement (near-tie
     swaps allowed only when the extra squared distance is negligible);
  1b. packed6_idx (round-5 packed value|index reduction): near-tie bound
     + exact recomputed distances;
  2. Bunny point + plane GT recovery through run_icp (parity contract);
  3. hall scan (strict reference ordering) plane GT recovery;
  4. morton banded vs exact matcher: same recovered transform;
  5. NDT banded vs gather lookup: identical rows on coherent queries;
  5b. fused Pallas NDT moments vs the explicit 7-offset gather path;
  6. GICP + symmetric metrics converge (the carried-normals HIGHEST path);
  7. tune_morton scale-aware thresholds under packed6 noise;
  8. morton matchers at non-chunk-multiple N (probe-padding bug class,
     VERDICT r3 #2) — both xla and pallas implementations;
  9. isotropic-covariance voxels through eigh3 + NDT (frame bug class,
     VERDICT r3 #2);
  10. the 259k wide-plane cloud that stresses the fused-NDT band-coverage
     policy (VERDICT r4 weak #3): asserts _resolve_fused's choice, fused
     count parity vs the gather oracle at the chosen window, and
     end-to-end GT recovery + matched_fraction on hardware;
  11. band-kernel packed6_idx (round 5): in-kernel bitcast/int-min packed
     reduction parity vs packed6 + morton ICP GT recovery (check 1c).

Run: python scripts/tpu_smoke.py   (on the TPU; ~a few min incl. compiles)
or:  python bench.py --smoke       (probe -> smoke -> bench -> artifacts)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import fpcr_tpu as f  # noqa: E402

FAILURES = []


def check(name, ok, detail=""):
    status = "ok" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    if dev.platform != "tpu":
        print("NOT a TPU — this smoke only means something on hardware",
              flush=True)

    # --- 1. packed6 vs highest argmin agreement ------------------------
    from fpcr_tpu.ops.matching_pallas import nn_argmin_pallas

    scene = f.synthetic_scene(width=128)
    src, tgt = scene.source, scene.target
    i_hi, d_hi = nn_argmin_pallas(src, tgt, None, mode="highest")
    i_pk, d_pk = nn_argmin_pallas(src, tgt, None, mode="packed6")
    i_hi, i_pk = np.asarray(i_hi), np.asarray(i_pk)
    d_hi, d_pk = np.asarray(d_hi), np.asarray(d_pk)
    swaps = i_hi != i_pk
    # swapped rows must be genuine near-ties (measured r2: <= 2 rows,
    # extra sqdist <= 7e-7)
    tgt_np = np.asarray(tgt)
    src_np = np.asarray(src)
    extra = 0.0
    if swaps.any():
        d_true = ((src_np[swaps] - tgt_np[i_hi[swaps]]) ** 2).sum(1)
        d_got = ((src_np[swaps] - tgt_np[i_pk[swaps]]) ** 2).sum(1)
        extra = float(np.max(d_got - d_true))
    check("packed6 argmin agreement",
          swaps.mean() < 1e-3 and extra < 1e-5,
          f"swaps={int(swaps.sum())}/{swaps.size}, max extra sqdist={extra:.2e}")
    check("packed6 distance accuracy",
          float(np.max(np.abs(d_pk - d_hi))) < 1e-4,
          f"max |d| err={float(np.max(np.abs(d_pk - d_hi))):.2e}")

    # --- 1b. packed (value|index) reduction mode (round 5) -------------
    # The selection quantization is RELATIVE (idx_bits=14 at m_pad=16384
    # drops 14 mantissa bits -> 2^-9 of the distance): on the displaced
    # reference scene (NN sqdist ~0.1-1) plateaus of near-equal candidates
    # produce a few % of swaps, EACH within 2^-9 relative of the true
    # minimum. First hardware run measured swaps=687/16384, max relative
    # excess 2.0e-3 — the bound, not a bug; assert the bound, then assert
    # the operative guarantee: full-ICP GT recovery with the mode on.
    i_px, d_px = nn_argmin_pallas(src, tgt, None, mode="packed6_idx")
    i_px, d_px = np.asarray(i_px), np.asarray(d_px)
    swaps_px = i_px != i_hi
    rel_px = 0.0
    if swaps_px.any():
        d_true = ((src_np[swaps_px] - tgt_np[i_hi[swaps_px]]) ** 2).sum(1)
        d_got = ((src_np[swaps_px] - tgt_np[i_px[swaps_px]]) ** 2).sum(1)
        rel_px = float(np.max((d_got - d_true) / np.maximum(d_true, 1e-12)))
    d_sel = ((src_np - tgt_np[i_px]) ** 2).sum(1)
    check("packed6_idx quantization bound",
          swaps_px.mean() < 0.08 and rel_px < 2.0 ** -9 * 4
          and float(np.max(np.abs(d_px - d_sel)
                           / np.maximum(d_sel, 1.0))) < 1e-5,
          f"swaps={int(swaps_px.sum())}/{swaps_px.size}, "
          f"max rel excess={rel_px:.2e}")
    res_px = f.run_icp(src, tgt, f.ICPConfig(
        matcher="pallas", pallas_mode="packed6_idx", max_iterations=40))
    err_px = float(f.transform_rmse(res_px.transform, scene.ground_truth,
                                    src))
    check("packed6_idx ICP GT recovery", err_px < 1e-5,
          f"err={err_px:.2e}")

    # --- 1c. band-kernel packed6_idx (round 5) --------------------------
    # Covers the Mosaic lowering of the in-kernel bitcast/int-min packed
    # reduction, which CPU interpret mode cannot. Morton is a local
    # refiner, so GT here is a small displacement (the matcher's basin).
    from fpcr_tpu.ops.morton import build_morton_table, source_morton_order
    from fpcr_tpu.ops.morton_pallas import morton_nn_pallas

    gt_sm = f.gt_transform((0.004, -0.002, 0.003), (0.002, -0.003, 0.002))
    tgt_sm = gt_sm.apply(src)
    tb = build_morton_table(tgt_sm)
    ps = jnp.take(src, source_morton_order(src, tb), axis=0)
    _, d_b6, i_b6, _ = morton_nn_pallas(ps, tb, mode="packed6")
    m_bx, d_bx, i_bx, _ = morton_nn_pallas(ps, tb, mode="packed6_idx")
    ps_np = np.asarray(ps)
    d_resel = ((ps_np - np.asarray(m_bx)) ** 2).sum(1)
    band_swaps = np.asarray(i_b6) != np.asarray(i_bx)
    check("band packed6_idx parity",
          band_swaps.mean() < 0.02
          and float(np.max(np.abs(np.asarray(d_bx) - d_resel))) < 1e-5
          and float(np.max(np.abs(np.asarray(d_bx) - np.asarray(d_b6))
                           / np.maximum(np.asarray(d_b6), 1.0))) < 2e-3,
          f"swaps={int(band_swaps.sum())}/{band_swaps.size}")
    res_bx = f.run_icp(src, tgt_sm, f.ICPConfig(
        matcher="morton", pallas_mode="packed6_idx", morton_impl="pallas",
        morton_chunk=512, morton_window=64, max_iterations=30,
        tolerance=0.0))
    err_bx = float(f.transform_rmse(res_bx.transform, gt_sm, src))
    check("band packed6_idx ICP GT recovery", err_bx < 1e-5,
          f"err={err_bx:.2e}")

    # --- 2. Bunny GT recovery ------------------------------------------
    from fpcr_tpu.data.bunny import bunny_scene

    bs = bunny_scene()
    for metric in ("point", "plane"):
        res = f.run_icp(bs.source, bs.target,
                        f.ICPConfig(metric=metric, max_iterations=40))
        err = float(f.transform_rmse(res.transform, bs.ground_truth,
                                     bs.source))
        check(f"bunny {metric} GT recovery", err < 1e-5, f"err={err:.2e}")

    # --- 3. hall scan (strict ordering) plane recovery -----------------
    from fpcr_tpu.data.ouster import hall_scene

    hs = hall_scene(strict=True)
    res = f.run_icp(hs.source, hs.target,
                    f.ICPConfig(metric="plane", max_iterations=100))
    err = float(f.transform_rmse(res.transform, hs.ground_truth, hs.source))
    check("hall strict plane GT recovery", err < 1e-5, f"err={err:.2e}")

    # --- 4. morton banded vs exact: same transform ---------------------
    gt_small = f.gt_transform((0.004, -0.002, 0.003), (0.002, -0.003, 0.002))
    tgt_near = gt_small.apply(scene.source)
    r_exact = f.run_icp(scene.source, tgt_near,
                        f.ICPConfig(matcher="pallas", max_iterations=30))
    r_band = f.run_icp(scene.source, tgt_near,
                       f.ICPConfig(matcher="morton", max_iterations=30,
                                   morton_window=128))
    dt = float(jnp.linalg.norm(r_exact.transform.translation
                               - r_band.transform.translation))
    dR = float(jnp.max(jnp.abs(r_exact.transform.rotation
                               - r_band.transform.rotation)))
    check("morton vs exact transform agreement",
          dt < 1e-5 and dR < 1e-5, f"|dt|={dt:.2e}, |dR|={dR:.2e}")

    # --- 5. NDT banded vs gather lookup parity on TPU ------------------
    from fpcr_tpu.ops.ndt import (build_ndt_grid, cell_key_order,
                                  ndt_lookup, ndt_lookup_banded)

    rng = np.random.default_rng(21)
    pts = rng.uniform(0, 2.0, (16384, 3)).astype(np.float32)
    grid = build_ndt_grid(jnp.asarray(pts), 0.25)
    q = jnp.asarray(pts + rng.normal(0, 0.02, pts.shape).astype(np.float32))
    q = jnp.take(q, cell_key_order(q, grid), axis=0)
    mu_g, si_g, hit_g = ndt_lookup(q, grid)
    mu_b, si_b, hit_b = ndt_lookup_banded(q, grid)
    hg, hb = np.asarray(hit_g), np.asarray(hit_b)
    both = hg & hb
    mu_ok = np.array_equal(np.asarray(mu_b)[both], np.asarray(mu_g)[both])
    si_ok = np.array_equal(np.asarray(si_b)[both], np.asarray(si_g)[both])
    check("NDT banded lookup parity",
          (not (hb & ~hg).any()) and (hb == hg).mean() > 0.999
          and mu_ok and si_ok,
          f"hit agreement={(hb == hg).mean():.5f}, rows exact={mu_ok and si_ok}")

    # --- 5b. fused Pallas NDT moments vs explicit gather path on TPU ---
    # the oracle is the SAME function tests/test_ndt.py validates against
    # in interpret mode — parity contract can't drift between CPU CI and
    # this on-hardware check
    from fpcr_tpu.ops.ndt import (gauss_d1_d2,
                                  reference_neighborhood_moments)
    from fpcr_tpu.ops.ndt_pallas import (ndt_fused_moments,
                                         prepare_fused_tables)

    d1f, d2f = gauss_d1_d2(0.55, 0.25)
    d1f = abs(d1f)
    WS, WSr, count, _ = reference_neighborhood_moments(q, grid, d1f, d2f)
    tables = prepare_fused_tables(grid)
    rows, xp = ndt_fused_moments(q, grid, tables, voxel_size=0.25,
                                 d1=d1f, d2=d2f, chunk=512, window=256)
    rows, xp = np.asarray(rows), np.asarray(xp)
    sr_fused = np.stack([
        rows[:, 0] * xp[:, 0] + rows[:, 1] * xp[:, 1]
        + rows[:, 2] * xp[:, 2] - rows[:, 6],
        rows[:, 1] * xp[:, 0] + rows[:, 3] * xp[:, 1]
        + rows[:, 4] * xp[:, 2] - rows[:, 7],
        rows[:, 2] * xp[:, 0] + rows[:, 4] * xp[:, 1]
        + rows[:, 5] * xp[:, 2] - rows[:, 8],
    ], axis=1)
    ws_err = float(np.max(np.abs(rows[:, 0:6] - WS))) / max(
        float(np.abs(WS).max()), 1e-9)
    sr_err = float(np.max(np.abs(sr_fused - WSr))) / max(
        float(np.abs(WSr).max()), 1e-9)
    check("NDT fused kernel moment parity",
          np.array_equal(rows[:, 10], count) and ws_err < 2e-3
          and sr_err < 2e-3,
          f"count exact={np.array_equal(rows[:, 10], count)}, "
          f"WS rel={ws_err:.2e}, WSr rel={sr_err:.2e}")

    # --- 6. carried-normals metrics converge on TPU --------------------
    for metric in ("symmetric", "gicp"):
        res = f.run_icp(scene.source, scene.target,
                        f.ICPConfig(metric=metric, max_iterations=30))
        err = float(f.transform_rmse(res.transform, scene.ground_truth,
                                     scene.source))
        ok = bool(np.isfinite(err)) and err < 1e-4
        check(f"{metric} TPU convergence", ok, f"err={err:.2e}")

    # --- 7. tune_morton scale-aware thresholds under packed6 ----------
    # TPU's packed6 distance noise is larger than CPU's f32 XLA noise;
    # the scale-aware floors must still classify a benign far-from-origin
    # cloud (|p| ~ 500, global-frame coordinates) as clean — no rescue
    # escalation, no degenerate full brute re-match.
    from fpcr_tpu.models.icp import tune_morton

    rng2 = np.random.default_rng(11)
    far_cloud = jnp.asarray(
        (rng2.uniform(-1, 1, (8192, 3)) + [500.0, -300.0, 400.0]
         ).astype(np.float32))
    tuned = tune_morton(far_cloud + 0.002, far_cloud,
                        f.ICPConfig(matcher="morton"))
    check("tune_morton far-from-origin stays untuned",
          tuned.morton_rescue == 0 and tuned.morton_shifts == 1,
          f"rescue={tuned.morton_rescue}, shifts={tuned.morton_shifts}")

    # --- 8. morton probe padding: non-chunk-multiple N (VERDICT r3 #2) --
    # n % chunk in [1, chunk//2] puts the final chunk's fixed probe row
    # inside the padding; the round-3 fix pads with the last REAL point.
    # The CPU regression (tests/test_morton.py::test_morton_probe_never_
    # reads_padding) runs Pallas in interpret mode only — this asserts the
    # same contract on the real chip, both implementations.
    from fpcr_tpu.ops.morton import (build_morton_table, morton_nn,
                                     source_morton_order)
    from fpcr_tpu.ops.morton_pallas import morton_nn_pallas

    rng3 = np.random.default_rng(13)
    n_odd = 800  # chunk=256: last chunk holds 32 real rows, probe row > 32
    q_odd = (rng3.uniform(0, 2, size=(n_odd, 3)) + 10.0).astype(np.float32)
    p_odd = (q_odd + rng3.normal(scale=0.001, size=q_odd.shape)
             ).astype(np.float32)
    table8 = build_morton_table(jnp.asarray(q_odd))
    order8 = source_morton_order(jnp.asarray(p_odd), table8)
    p_sorted8 = jnp.take(jnp.asarray(p_odd), order8, axis=0)
    ref_idx8 = np.array([int(np.argmin(((p - q_odd) ** 2).sum(1)))
                         for p in np.asarray(p_sorted8)])
    orig8 = np.asarray(table8.orig_index)
    for impl_name, fn in (("xla", morton_nn), ("pallas", morton_nn_pallas)):
        _, _, idx_sorted8, _ = fn(p_sorted8, table8, chunk=256, window=256)
        got8 = orig8[np.asarray(idx_sorted8)]
        tail_agree = float((got8[768:800] == ref_idx8[768:800]).mean())
        check(f"morton {impl_name} non-chunk-multiple tail (n=800)",
              tail_agree > 0.9, f"tail agreement={tail_agree:.3f}")

    # --- 9. isotropic-covariance voxel through eigh3 (VERDICT r3 #2) ----
    # λI covariances fire every eigenvector fallback; the frame must stay
    # orthonormal so V diag(1/λ) Vᵀ reconstructs I/λ (the round-3 frame
    # bug class) — asserted here on real-TPU f32 arithmetic.
    from fpcr_tpu.ops.eigh3 import eigh3

    iso = np.stack([lam * np.eye(3, dtype=np.float32)
                    for lam in (1.0, 0.25, 4.0)])
    lams9, vecs9 = eigh3(jnp.asarray(iso))
    lams9, vecs9 = np.asarray(lams9), np.asarray(vecs9)
    worst_orth = max(float(np.abs(V.T @ V - np.eye(3)).max())
                     for V in vecs9)
    worst_rec = max(float(np.abs(V @ np.diag(1.0 / l) @ V.T
                                 - np.eye(3) / l[0]).max())
                    for V, l in zip(vecs9, lams9))
    check("eigh3 isotropic frame orthonormal",
          worst_orth < 1e-5 and worst_rec < 1e-4,
          f"max |VᵀV-I|={worst_orth:.2e}, max recon err={worst_rec:.2e}")
    # and end-to-end: an NDT registration whose grid contains isotropic
    # voxels (duplicate points quantized together) must stay finite
    from fpcr_tpu.models.ndt import NDTConfig, run_ndt

    rng9 = np.random.default_rng(7)
    base9 = rng9.uniform(0, 2.0, (4096, 3)).astype(np.float32)
    dup9 = np.repeat(base9[:256], 4, axis=0)  # duplicate clusters
    cloud9 = np.concatenate([base9, dup9]).astype(np.float32)
    gt9 = f.gt_transform((0.003, -0.002, 0.002), (0.001, -0.002, 0.001))
    tgt9 = gt9.apply(jnp.asarray(cloud9))
    res9 = run_ndt(jnp.asarray(cloud9), tgt9,
                   NDTConfig(voxel_size=0.25, max_iterations=20))
    err9 = float(f.transform_rmse(res9.transform, gt9, jnp.asarray(cloud9)))
    # NDT is a coarse aligner (voxel-resolution objective): CPU-measured
    # err ~2e-3 here; the frame bug class this guards against produced
    # O(1)-wrong inverse covariances, i.e. divergence or err >> 1e-2
    check("NDT with isotropic voxels converges finite",
          bool(np.isfinite(err9)) and err9 < 5e-3, f"err={err9:.2e}")

    # --- 10. wide-plane 259k cloud: fused band-coverage policy ----------
    # The round-4 exact d_max bound keeps this scene on the fused pallas
    # path with an escalated window (the round-3 row-count bound forced
    # the 19.6 ms/iter xla fallback here) — assert the policy choice AND
    # that the escalated window actually covers (count parity vs the
    # gather oracle), then end-to-end registration quality.
    from fpcr_tpu.data.synthetic import wide_plane_cloud
    from fpcr_tpu.models.ndt import NDTConfig as NCfg
    from fpcr_tpu.models.ndt import resolve_ndt_config, run_ndt as run_ndt10
    from fpcr_tpu.ops.ndt import cell_key_order as cko10

    wp = wide_plane_cloud()  # 18 x (120x120) sheets = 259,200 pts
    grid10 = f.build_ndt_grid(wp, 0.25)
    gt10 = f.gt_transform((0.004, -0.003, 0.002), (0.002, -0.002, 0.003))
    src10 = gt10.inverse().apply(wp)
    src_sorted10 = jnp.take(src10, cko10(src10, grid10), axis=0)
    cfg10 = resolve_ndt_config(
        NCfg(voxel_size=0.25, lookup="banded", lookup_chunk=512), grid10,
        src_sorted10)
    on_tpu = dev.platform == "tpu"
    check("wide-plane fused policy (pallas, escalated window)",
          (not on_tpu) or (cfg10.lookup_impl == "pallas"
                           and cfg10.lookup_window > 256),
          f"impl={cfg10.lookup_impl}, window={cfg10.lookup_window}")
    if cfg10.lookup_impl == "pallas":
        WS10, WSr10, count10, _ = reference_neighborhood_moments(
            src_sorted10, grid10, d1f, d2f)
        tables10 = prepare_fused_tables(grid10)
        rows10, _ = ndt_fused_moments(
            src_sorted10, grid10, tables10, voxel_size=0.25, d1=d1f, d2=d2f,
            chunk=cfg10.lookup_chunk, window=cfg10.lookup_window)
        counts_ok = np.array_equal(np.asarray(rows10)[:, 10],
                                   np.asarray(count10))
        check("wide-plane escalated window covers (count parity)", counts_ok,
              f"window={cfg10.lookup_window}")
    res10 = run_ndt10(src10, wp, cfg10, grid=grid10)
    err10 = float(f.transform_rmse(res10.transform, gt10, src10))
    mf10 = float(res10.matched_fraction)
    check("wide-plane NDT registration",
          bool(np.isfinite(err10)) and err10 < 1e-2 and mf10 > 0.85,
          f"err={err10:.2e}, matched_fraction={mf10:.3f}")

    print(f"\n{len(FAILURES)} failure(s)" if FAILURES else "\nall checks ok",
          flush=True)
    return 1 if FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())
