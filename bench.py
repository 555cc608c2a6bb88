"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: bundle-adjustment LM iterations/sec/chip at BAL Ladybug-1723 scale
(1723 cameras, 156k landmarks, ~530k observations) on data with BAL-REALISTIC
SKEW: power-law track lengths and Zipf per-camera observation counts
(sfm/synthetic.py:make_skewed_problem — the real Ladybug file cannot be
fetched in this environment; round-1 used a uniform stand-in, VERDICT r1
flagged that as dishonest because global-max padding wastes ~116x on skewed
data). The solver is the packed-tile engine (sfm/ba_pack.py): cameras wrap
over 128-lane rows / stack up to 4 per row, points stack up to 8 per 8-row
tile column or wrap across columns — physical padding stays under 1.25x on
this skew (BENCH_LAYOUT=bucket selects the older 8-class bucketed engine).

One iteration = one full Levenberg-Marquardt iteration entirely on device
in fp32: batched relinearization (analytic Jacobians == the autodiff-
through-SE(3)-retraction oracle, for every observation) + implicit-Schur
PCG camera solve (2 CG iterations — the measured inexact-Newton sweet spot
for the packed engine: the LM accept/reject makes aggressive CG budgets
safe, cg=1 stalls at 4.1px, cg=2 reaches the noise floor; sweep in
PERFORMANCE.md) + landmark back-substitution +
retract + error + accept/reject with lambda adaptation (the reference's
tryLambda; rejected tries count as iterations there too — and, exactly
like the reference, a rejected try REUSES the cached linearization, since
the state did not move; relinearization happens after every accept). The
carry stays on device — no host sync inside the timed loop.

vs_baseline: Ceres/GTSAM-class CPU bundle adjusters run ~1 LM iteration/sec
at this scale (BASELINE.md; the reference itself publishes no numbers).
baseline_iters_per_sec = 1.0.

Env knobs: BENCH_UNIFORM=1 reruns the round-1 uniform-ring problem for
continuity; BENCH_ITERS overrides the timed iteration count; BENCH_LAYOUT
selects pack|bucket; BENCH_CG the CG budget per iteration.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.sfm import ba, ba_bucket, ba_pack, synthetic

    uniform = os.environ.get("BENCH_UNIFORM") == "1"
    if uniform:
        prob = synthetic.make_ring_problem(
            num_cameras=1723, num_points=156000, obs_per_point=4, seed=2)
    else:
        prob = synthetic.make_skewed_problem(
            num_cameras=1723, num_points=156000, mean_track=4.0,
            max_track=40, seed=2, cam_zipf=1.2)
    state, obs = ba.state_from_bal(prob)
    state = ba.BAState(*[x.astype(jnp.float32) for x in state])
    obs = ba.BAObservations(obs.cam, obs.point, obs.uv.astype(jnp.float32))

    # default engine: packed-tile layout (sfm/ba_pack.py) — measured 18.4
    # vs 13.0 it/s for the 8-class bucketed layout (BENCH_LAYOUT=bucket)
    engine = os.environ.get("BENCH_LAYOUT", "pack")
    if engine == "pack":
        bl = ba_pack.make_pack_layout(
            obs, state.cam_poses.shape[0], state.points.shape[0])
        cam_w, pt_w = bl.padding_waste()
        print(f"# obs={bl.M} pack rowsC={bl.rowsC} PTC={bl.PTC} "
              f"cam_classes={len(bl.cam_classes)} "
              f"pt_classes={len(bl.pt_classes)} "
              f"cam_waste={cam_w:.2f}x pt_waste={pt_w:.2f}x", file=sys.stderr)
        error_fn, lm_run_fn = ba_pack.ba_error_pk, ba_pack.ba_lm_run_pk
    else:
        bl = ba_bucket.make_bucket_layout(
            obs, state.cam_poses.shape[0], state.points.shape[0],
            max_cam_buckets=int(os.environ.get("BENCH_CAMB", "8")),
            max_pt_buckets=int(os.environ.get("BENCH_PTB", "6")))
        cam_w, pt_w = bl.padding_waste()
        print(f"# obs={bl.M} cam_buckets={bl.cam_shapes} "
              f"pt_buckets={bl.pt_shapes}"
              f" cam_waste={cam_w:.2f}x pt_waste={pt_w:.2f}x",
              file=sys.stderr)
        error_fn, lm_run_fn = ba_bucket.ba_error_bl, ba_bucket.ba_lm_run_bl

    # Each timed iteration is one FULL on-device LM iteration: damped solve
    # + retract trial + error + accept/reject + lambda update (reference
    # tryLambda semantics). A fixed-lambda try-step sequence diverges on
    # this problem (round-2's silent failure mode, caught by the round-3
    # quality gate below); the LM carry cannot.
    err_init = float(error_fn(state, obs, bl))
    cg = int(os.environ.get("BENCH_CG", "2" if engine == "pack" else "3"))
    lam = jnp.float32(1e-3)
    err0 = jnp.float32(err_init)
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    # The timed region is ONE dispatch of `iters` LM iterations (lax.scan in
    # ba_lm_run_bl): per-dispatch tunnel latency on the axon backend is tens
    # of ms and NOT chip work, so a per-iteration dispatch loop times the
    # tunnel, not the TPU. compile + warmup first (block_until_ready is
    # unreliable on axon: sync via a host transfer).
    _, _, errw = lm_run_fn(state, obs, bl, lam, err0,
                           n_iters=iters, cg_maxiter=cg)
    float(errw)

    t0 = time.perf_counter()
    st2, lamc, errc = lm_run_fn(state, obs, bl, lam, err0,
                                n_iters=iters, cg_maxiter=cg)
    err_final = float(errc)
    dt = time.perf_counter() - t0

    # quality gate: bench.py is the only check that runs on the real TPU;
    # CPU tests cannot catch TPU-only numeric corruption (see CLAUDE.md on
    # the silent bf16 Jacobian corruption found via a bench regression).
    # explicit raises, not asserts: `python -O` strips asserts, which would
    # silently disable the only numeric check that runs on real TPU hardware
    rms_px = float(np.sqrt(2.0 * err_final / bl.M))
    if not np.isfinite(err_final):
        raise RuntimeError(f"bench quality gate: non-finite BA error {err_final}")
    if not err_final < err_init:
        raise RuntimeError(
            f"bench quality gate: BA error did not decrease: "
            f"{err_init} -> {err_final}")
    if not rms_px < 1.3:
        raise RuntimeError(
            f"bench quality gate: rms reprojection {rms_px:.3f}px above gate "
            f"(1.3; the 1px-noise floor is ~1.12px — regression if 10 LM "
            f"iterations can't reach it)")
    print(f"# err {err_init:.1f} -> {err_final:.1f}, rms {rms_px:.3f}px",
          file=sys.stderr)

    ips = iters / dt

    # --- second quality-gated metric: pose-graph batch LM on city10000
    # (10k poses / 20.7k factors) through the SAME honest-LM machinery:
    # accept/reject + lambda adaptation + reject-try linearization caching,
    # N iterations in ONE lax.scan dispatch (optimizers.lm_run), partitioned
    # Schur solver. BENCH_CITY=0 skips. ---
    extra = {}
    if os.environ.get("BENCH_CITY", "1") == "1":
        from gtsam_personal_tpu.slam import dataset
        from gtsam_personal_tpu.linear import schur
        from gtsam_personal_tpu.nonlinear import optimizers
        graph, initial = dataset.load_2d(
            dataset.find_example_data("city10000.g2o"), dtype=np.float32)
        n_poses = initial["se2"].shape[0]
        plan = schur.make_plan(graph, {"se2": n_poses}, max_part_size=256)
        params = optimizers.Params(solver="schur")
        err0c = optimizers.graph_error(graph, initial)
        iters_c = int(os.environ.get("BENCH_CITY_ITERS", "12"))
        lam0 = jnp.asarray(1e-5, dtype=err0c.dtype)
        _, _, ew_c = optimizers.lm_run(graph, initial, lam0, err0c,
                                       n_iters=iters_c, params=params,
                                       plan=plan)
        float(ew_c)                         # compile + warmup sync
        t0 = time.perf_counter()
        _, _, ec_c = optimizers.lm_run(graph, initial, lam0, err0c,
                                       n_iters=iters_c, params=params,
                                       plan=plan)
        errc_final = float(ec_c)
        dt_c = time.perf_counter() - t0
        # quality gate: the known batch optimum is 0.077 in 11 host-driver
        # LM iterations (PERFORMANCE.md); 12 scan iterations must land near
        # it. Explicit raises (python -O strips asserts).
        if not np.isfinite(errc_final):
            raise RuntimeError("bench gate: city10000 non-finite error")
        if not errc_final < 0.2:
            raise RuntimeError(
                f"bench gate: city10000 LM stalled at {errc_final} "
                f"(batch optimum 0.077)")
        print(f"# city10000: err {float(err0c):.1f} -> {errc_final:.4f}, "
              f"{iters_c / dt_c:.1f} LM it/s", file=sys.stderr)
        extra = {"city10000_lm_iters_per_sec": round(iters_c / dt_c, 3),
                 "city10000_final_error": round(errc_final, 4)}

    print(json.dumps({
        "metric": ("ba_lm_iters_per_sec_ladybug1723_uniform" if uniform
                   else "ba_lm_iters_per_sec_ladybug1723_skewed"),
        "value": round(ips, 3),
        "unit": "iterations/sec/chip",
        "vs_baseline": round(ips / 1.0, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
