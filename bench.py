"""Benchmark: hybrid-LHM training epoch on the dim-8 synthetic cohort.

Protocol mirrors the reference's training regime (run_simulation.py with
--data_config dim8: batch 50, dopri5 rtol=1e-7/atol=1e-8, backprop through
the solver): one epoch = 20 jitted train steps of batch 50 (= one pass over
1000 training samples). Prints ONE JSON line with the epoch wall-clock plus
the solver steps/sec (accepted DOPRI5 steps across the batch — the
BASELINE.json metric pair).

vs_baseline: speedup over the torch-CPU reference-equivalent epoch measured
by bench_baseline_torch.py on this machine (stored in BASELINE_TORCH.json).
If no stored baseline exists, vs_baseline is 0.0.

Set BENCH_TRACE_DIR to also capture a jax.profiler device trace of one epoch.
"""

from __future__ import annotations

import contextlib
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def _pause_own_queues():
    """SIGSTOP this repo's own background CPU queues (pidfiles listed in
    BENCH_PAUSE_PIDFILES) for the duration of the timed window, SIGCONT
    after. The 1-core host's torch baseline queue otherwise starves JAX's
    dispatch thread and inflates the epoch ~2.6x (measured round 3). Only
    ever touches PIDs we started ourselves; silently a no-op when the
    pidfiles are stale or absent."""
    import glob as _glob

    default = ":".join(["/tmp/cpuqueue2.pid"] + sorted(_glob.glob("/tmp/hybridode_cpu/*.pid")))
    pidfiles = os.environ.get("BENCH_PAUSE_PIDFILES", default).split(":")

    def _is_our_queue(pid: int) -> bool:
        # PID-recycling guard: only signal processes whose command line looks
        # like one of this repo's queue scripts (bash/python running something
        # under /root/repo or a ref_run/cpu queue) — a stale pidfile must not
        # freeze an unrelated process for the deadman's 20 minutes.
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode("utf-8", "replace")
        except OSError:
            return False
        markers = ("hybridode", "/root/repo", "ref_run", "cpuqueue", "cpu_queue", "run_queue")
        return any(m in cmd for m in markers)

    stopped = []
    for pf in pidfiles:
        try:
            with open(pf) as f:
                root = int(f.read().strip())
        except (OSError, ValueError):
            continue
        if not _is_our_queue(root):
            try:
                os.unlink(pf)  # stale pidfile: PID gone or recycled
            except OSError:
                pass
            continue
        tree, frontier = [root], [root]
        while frontier:
            try:
                out = os.popen("ps -o pid= --ppid " + ",".join(map(str, frontier))).read().split()
            except OSError:
                break
            frontier = [int(p) for p in out]
            tree += frontier
        for pid in tree:
            try:
                os.kill(pid, signal.SIGSTOP)
                stopped.append(pid)
            except (OSError, ProcessLookupError):
                pass
    if stopped:
        # Deadman unfreezer: if this process is SIGKILLed mid-bench the
        # finally below never runs — a detached sleeper guarantees the queue
        # resumes regardless (a second CONT to a running process is a no-op).
        # 2700 s covers the full-experiment + MFU sections (the chain script
        # bounds the whole bench at 2400 s) so the queue can't thaw inside a
        # timed window.
        os.system(
            "nohup bash -c 'sleep 2700; kill -CONT %s 2>/dev/null' >/dev/null 2>&1 &"
            % " ".join(map(str, stopped))
        )
    try:
        yield
    finally:
        for pid in stopped:
            try:
                os.kill(pid, signal.SIGCONT)
            except (OSError, ProcessLookupError):
                pass


def main():
    try:
        from hybridode.utils.cache import host_keyed_cache_dir

        jax.config.update("jax_compilation_cache_dir",
                          host_keyed_cache_dir(os.path.join(os.path.dirname(__file__), ".jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from hybridode.cli.common import build_sim_model
    from hybridode.config import RocheConfig, dim8_config
    from hybridode.data.synthetic import SyntheticCohort
    from hybridode.inference import init_vi, make_optimizer, make_train_step
    from hybridode.solvers import odeint_dopri5
    from hybridode.utils import PhaseTimer, trace_to

    # dim-8 cohort, 1000 usable samples (generate_data_dim8.py regime).
    dg = SyntheticCohort(
        n_sample=1100, obs_dim=40, t_max=14, step_size=1, roche_config=RocheConfig(kel=1),
        output_sigma=0.2, dose_max=10, latent_dim=8, sparsity=0.5, output_sparsity=1 - 0.375,
        p_remove=0.5, val_size=50, test_size=50, rng=np.random.RandomState(666),
    )
    dg.generate_data()
    dg.split_sample()

    # A/B knobs (defaults match the shipped configuration).
    max_steps = int(os.environ.get("BENCH_MAX_STEPS", "256"))
    use_adjoint = os.environ.get("BENCH_ADJOINT", "") == "1"
    max_record = os.environ.get("BENCH_MAX_RECORD")
    model = build_sim_model("hybrid", dim8_config, elbo=True, max_steps=max_steps)
    if use_adjoint or max_record:
        model = model._replace(decoder_spec=model.decoder_spec._replace(
            use_adjoint=use_adjoint,
            max_record=int(max_record) if max_record else None,
        ))
    params = init_vi(jax.random.PRNGKey(0), model)
    optimizer = make_optimizer(0.01, params)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer)

    batch_size = 50
    steps_per_epoch = 20
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    timer = PhaseTimer()

    # BENCH_FUSED=1: run the whole epoch as ONE jitted lax.scan over the 20
    # pre-gathered mini-batches (the fused-restart training loop's shape,
    # inference/fused.py) instead of 20 host-dispatched steps. Round 1
    # rejected epoch fusion from a pre-sync-fix measurement; this knob
    # re-measures it under the sync-once protocol.
    fused_epoch = os.environ.get("BENCH_FUSED", "") == "1"
    if fused_epoch:
        # Mirror inference/fused.py: mini-batch INDEX streams are drawn on
        # the host (ints only) and the gather happens on device inside the
        # scan. The first version stacked device-resident mini-batches with
        # np.stack — 20 D2H reads/epoch, which trips the tunnel's
        # first-read dispatch cliff (PERFORMANCE.md round 3) and turned the
        # "data" phase into 2.8 s/epoch of pure readback.
        train_fold = dg._fold("train")
        n_train = train_fold["measurements"].shape[1]

        @jax.jit
        def epoch_scan(params, opt_state, idx, key):
            def one(carry, idx_row):
                params, opt_state, key = carry
                batch = {k2: jnp.take(v, idx_row, axis=1) for k2, v in train_fold.items()}
                key, k = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state, batch, k)
                return (params, opt_state, key), loss

            (params, opt_state, key), losses = jax.lax.scan(one, (params, opt_state, key), idx)
            return params, opt_state, key, losses[-1]

    def make_probe(model):
        spec = model.decoder_spec
        ts = jnp.asarray(spec.ts)

        @jax.jit
        def probe(params, batch, key, probe_steps=spec.max_steps):
            from hybridode.fields import doses_from_actions, roche_field
            from hybridode.inference.elbo import encode

            mu, log_var = encode(params, model, batch["measurements"], batch["actions"], batch["masks"])
            from hybridode.models import priors

            z = priors.gaussian_reparameterize(key, mu, log_var)
            ctx = doses_from_actions(batch["actions"], spec.step_size)
            CtxType = type(ctx)

            def solve_one(z_i, times_i, amounts_i):
                _, stats = odeint_dopri5(
                    roche_field, z_i, ts,
                    (params["decoder"]["ode"], CtxType(times=times_i, amounts=amounts_i)),
                    rtol=spec.rtol, atol=spec.atol, max_steps=probe_steps,
                )
                return stats.n_steps, stats.n_accepted, stats.success

            n_steps, n_acc, ok = jax.vmap(solve_one)(z, ctx.times, ctx.amounts)
            return jnp.sum(n_steps), jnp.sum(n_acc), jnp.max(n_steps), jnp.max(n_acc), jnp.all(ok)

        return probe

    def one_epoch(params, opt_state, key, sync=True):
        if fused_epoch:
            with timer.phase("data"):
                idx = np.stack([rng.choice(n_train, batch_size, replace=False)
                                for _ in range(steps_per_epoch)]).astype(np.int32)
            with timer.phase("step"):
                params, opt_state, key, loss = epoch_scan(params, opt_state, idx, key)
            if sync:
                with timer.phase("sync"):
                    jax.block_until_ready(loss)
            return params, opt_state, key, loss
        for _ in range(steps_per_epoch):
            with timer.phase("data"):
                batch = dg.get_mini_batch("train", batch_size, rng)
            key, k = jax.random.split(key)
            with timer.phase("step"):
                params, opt_state, loss = step(params, opt_state, batch, k)
        if sync:
            # One device roundtrip per epoch (outside the timed window the
            # measurement loop syncs once at the end instead — standard JAX
            # timing practice; the tunnel RTT on this box is ~100-150 ms and
            # would otherwise dominate the dispatch-pipelined epoch).
            with timer.phase("sync"):
                jax.block_until_ready(loss)
        return params, opt_state, key, loss

    # Warmup (compile) + 1 epoch to stabilize.
    params, opt_state, key, _ = one_epoch(params, opt_state, key)

    # BENCH_CALIBRATE=1: measure the cohort's actual per-sample trial-step
    # demand (after the warmup updates) and shrink the budget to
    # 1.25 * max-demand rounded to the solver chunk — the calibrated-budget
    # configuration from PERFORMANCE.md's headroom list.
    calibrated = None
    if os.environ.get("BENCH_CALIBRATE", "") == "1":
        import math

        from hybridode.solvers.dopri5 import _CHUNK_SIZE

        wide = model._replace(decoder_spec=model.decoder_spec._replace(max_steps=512))
        pbatch = dg.get_mini_batch("train", batch_size, np.random.RandomState(2))
        _, _, max_trial, _, probe_ok = make_probe(wide)(params, pbatch, jax.random.PRNGKey(9))
        # Same exhaustion check calibrate_trial_budget performs: a probe lane
        # that burned the whole wide budget would silently under-calibrate.
        if not bool(probe_ok):
            raise RuntimeError("calibration probe exhausted its 512-step budget; cannot calibrate")
        calibrated = max(1, math.ceil(1.25 * int(max_trial) / _CHUNK_SIZE)) * _CHUNK_SIZE
        model = model._replace(decoder_spec=model.decoder_spec._replace(max_steps=calibrated))
        step = make_train_step(model, optimizer)
        print(f"calibrated max_steps: {calibrated} (probe max trial {int(max_trial)})", file=sys.stderr)
        params, opt_state, key, _ = one_epoch(params, opt_state, key)  # re-compile

    timer = PhaseTimer()  # drop compile time from the report

    n_epochs = 3
    # Min over BENCH_REPS timed windows: the tunnel to the TPU adds tens of
    # ms of jitter per sync, and min-of-N is the standard estimator of the
    # interference-free cost (reps reuse the compiled step, so they cost
    # only the device work itself).
    reps = max(1, int(os.environ.get("BENCH_REPS", "5")))
    times = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n_epochs):
            params, opt_state, key, loss = one_epoch(params, opt_state, key, sync=False)
        jax.block_until_ready(loss)
        times.append((time.time() - t0) / n_epochs)
    epoch_seconds = min(times)
    print(f"epoch times across {reps} windows: {[round(t, 4) for t in times]}", file=sys.stderr)
    assert np.isfinite(float(loss)), "bench epoch produced non-finite loss (budget too tight?)"

    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:
        with trace_to(trace_dir):
            params, opt_state, key, _ = one_epoch(params, opt_state, key)

    # Solver utilization: accepted/trial DOPRI5 steps for one training batch
    # under the decoder's own settings (per-sample adaptive control).
    probe_batch = dg.get_mini_batch("train", batch_size, np.random.RandomState(1))
    n_trial, n_accepted, max_trial, max_acc, solve_ok = (
        int(x) for x in make_probe(model)(params, probe_batch, jax.random.PRNGKey(7)))
    assert solve_ok, "a benched solve exhausted its step budget (max_steps too tight)"
    # Accepted solver steps per wall-clock second across one epoch's forward
    # solves (each train step advances `batch_size` per-sample integrations).
    solver_steps_per_sec = n_accepted * steps_per_epoch / epoch_seconds

    print(timer.report(), file=sys.stderr)
    print(
        f"solver: {n_accepted} accepted / {n_trial} trial steps per batch-{batch_size} solve "
        f"({n_accepted / max(n_trial, 1):.2%} accept rate); "
        f"per-patient max: {max_acc} accepted / {max_trial} trial (budget {model.decoder_spec.max_steps})",
        file=sys.stderr,
    )

    # ----- Utilization-meaningful extensions (VERDICT r4 #2) -----------------
    # The reference-shape epoch above deliberately times the reference's own
    # microscopic shapes (batch 50, one step per dispatch), where the chip is
    # dispatch-latency-bound and MFU is ~0.06%. Two further measurements make
    # the artifact utilization-meaningful:
    #   full_experiment_seconds — the WHOLE sweep cell (3 restarts x 400
    #     iters + early-stop + validation + test eval) as one batched device
    #     program (--restart_mode=vmap; inference/fused.py), i.e. what a user
    #     actually waits for. Steady-state: first run warms the compile
    #     cache, the second is reported.
    #   large_batch_* — the same train step at B=1000 (the whole cohort per
    #     step), with XLA-cost-model FLOPs -> achieved GFLOP/s and MFU
    #     against the TPU v5e f32 peak (matmul precision is pinned highest
    #     framework-wide, so f32 is the honest denominator — roofline.py).
    # Default-on for real backends; skipped on CPU smoke runs unless forced
    # (BENCH_FULL=1 / BENCH_MFU=1; =0 disables anywhere). Only the default
    # protocol runs them, so A/B knob runs stay fast.
    default_protocol = (not calibrated and max_steps == 256 and not use_adjoint
                        and not max_record and not fused_epoch)
    on_cpu = jax.default_backend() == "cpu"
    extras = {}

    if default_protocol and os.environ.get("BENCH_FULL", "") != "0" and (
            not on_cpu or os.environ.get("BENCH_FULL") == "1"):
        import shutil
        import tempfile

        from hybridode.cli.common import run_batched_experiment
        from hybridode.eval import evaluate
        from hybridode.utils.hostrng import host_key

        def full_experiment(seed):
            tmp = tempfile.mkdtemp(prefix="bench_full_")
            try:
                t0 = time.time()
                key, exp_params, _ = run_batched_experiment(
                    host_key(seed), model, dg, n_restart=3, niters=400,
                    batch_size=batch_size, lr=0.01, test_freq=10, path=tmp,
                    best_on_disk=1e9, early_stop=10, shuffle=True,
                    val_criterion="elbo", val_t0=5, curve_path=None,
                    events_path=None, restart_mode="vmap",
                    restart_devices=None, dp_devices=None)
                with contextlib.redirect_stdout(sys.stderr):
                    evaluate(exp_params, model, dg, batch_size=50, t0=5,
                             mc_itr=50, verbose=False)
                return time.time() - t0
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        # Guarded: the headline epoch above is already measured, and a null
        # BENCH artifact is strictly worse than one missing the extras — two
        # rounds of relay outage taught us never to risk the whole artifact
        # on an optional section.
        try:
            cold = full_experiment(666)   # warms the persistent compile cache
            warm = full_experiment(667)   # steady-state: what a sweep pays per cell
            print(f"full experiment (3x400+eval, restart_mode=vmap): "
                  f"cold {cold:.1f}s, warm {warm:.1f}s", file=sys.stderr)
            extras.update({
                "full_experiment_seconds": round(warm, 2),
                "full_experiment_protocol": "3 restarts x 400 iters + ELBO val + "
                                            "mc50 test eval, restart_mode=vmap, "
                                            "steady-state (compile cached)",
            })
        except Exception as e:
            print(f"full-experiment bench failed (headline unaffected): {e!r}",
                  file=sys.stderr)
            extras["full_experiment_error"] = repr(e)

    def mfu_section():
        B = int(os.environ.get("BENCH_MFU_BATCH", "1000"))
        big_batch = dg.get_mini_batch("train", B, np.random.RandomState(3))
        mfu_key = jax.random.PRNGKey(11)
        lowered = jax.jit(step).lower(params, opt_state, big_batch, mfu_key)
        flops = 0.0
        try:
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
        except Exception as e:
            print(f"cost_analysis unavailable: {e}", file=sys.stderr)

        def big_run(n):
            p, o, k, loss = params, opt_state, mfu_key, None
            for _ in range(n):
                k, ks = jax.random.split(k)
                p, o, loss = step(p, o, big_batch, ks)
            return loss

        jax.block_until_ready(big_run(2))  # warm
        big_times = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(big_run(10))
            big_times.append((time.time() - t0) / 10)
        big_sec = min(big_times)
        # Same env-var convention as experiments/roofline.py (value in FLOP/s).
        peak_f32 = float(os.environ.get("ROOFLINE_PEAK_F32_TFLOPS", "98.5e12"))
        extras.update({
            "large_batch": B,
            "large_batch_step_seconds": round(big_sec, 5),
            "large_batch_achieved_gflops": round(flops / big_sec / 1e9, 1) if flops else None,
            # Peak denominator is TPU v5e f32; meaningless off-TPU.
            "large_batch_mfu_pct_f32": (round(100 * flops / big_sec / peak_f32, 3)
                                        if flops and not on_cpu else None),
        })
        print(f"large-batch B={B}: {big_sec * 1e3:.2f} ms/step, "
              f"{extras['large_batch_achieved_gflops']} GFLOP/s, "
              f"MFU(f32) {extras['large_batch_mfu_pct_f32']}%", file=sys.stderr)

    if default_protocol and os.environ.get("BENCH_MFU", "") != "0" and (
            not on_cpu or os.environ.get("BENCH_MFU") == "1"):
        try:  # guarded for the same reason as the full-experiment section
            mfu_section()
        except Exception as e:
            print(f"MFU bench failed (headline unaffected): {e!r}", file=sys.stderr)
            extras["large_batch_error"] = repr(e)

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_TORCH.json")
    vs_baseline = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        vs_baseline = float(base["epoch_seconds"]) / epoch_seconds

    result = {
        "metric": "hybrid_lhm_dim8_epoch_wallclock",
        "value": round(epoch_seconds, 4),
        "unit": "s/epoch (20x batch-50 dopri5 train steps)",
        "vs_baseline": round(vs_baseline, 2),
        "solver_steps_per_sec": round(solver_steps_per_sec, 1),
        "solver_accepted_steps_per_batch": n_accepted,
        "solver_trial_steps_per_batch": n_trial,
        **extras,
        **({"calibrated_max_steps": calibrated} if calibrated else {}),
    }
    print(json.dumps(result))
    if default_protocol and not on_cpu:
        # Only a default-protocol run on the REAL backend updates the outage
        # fallback — a CPU smoke run must never replace the TPU measurement
        # the driver falls back to (caught live in round 5: a forced-CPU
        # BENCH_MFU smoke overwrote the 0.0149 s/epoch TPU record).
        _save_last_good(result)


_LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST_GOOD.json")


def _save_last_good(result: dict) -> None:
    """Persist a fresh successful measurement as the outage fallback."""
    import datetime

    record = dict(result)
    record["measured"] = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M UTC (this machine, bench.py default protocol)"
    )
    record["source"] = "bench.py live run"
    try:
        with open(_LAST_GOOD_PATH, "w") as f:
            json.dump(record, f, indent=2)
            f.write("\n")
    except OSError:
        pass


def _probe_tunnel():
    """Block the bench from hanging when the TPU tunnel relay is down.

    With the axon plugin registered but its loopback relay dead, ANY
    jax.devices() call hangs indefinitely (observed round 3 when the relay
    process died). Instead of failing on the first refused connection (which
    turned one transient outage into a null BENCH_r03), re-probe with backoff
    for up to BENCH_PROBE_RETRY_SECS (default 600 s). If the relay stays
    dead, emit the last committed good measurement labeled ``stale: true``
    (plus the outage error) so the driver artifact is never empty, and exit 0.
    """
    if "axon" not in os.environ.get("JAX_PLATFORMS", "") or not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    import socket

    deadline = time.time() + float(os.environ.get("BENCH_PROBE_RETRY_SECS", "600"))
    delay, last_err = 5.0, None
    while True:
        s = socket.socket()
        s.settimeout(5)
        try:
            s.connect(("127.0.0.1", 8082))
            return  # relay alive — proceed with the real bench
        except OSError as e:
            last_err = e
        finally:
            s.close()
        remaining = deadline - time.time()
        if remaining <= 0:
            break
        print(f"tunnel relay down ({last_err}); retrying in {min(delay, remaining):.0f}s "
              f"({remaining:.0f}s left)", file=sys.stderr)
        time.sleep(min(delay, remaining))
        delay = min(delay * 2, 60.0)

    error = (f"TPU tunnel relay unreachable on 127.0.0.1:8082 ({last_err}) after "
             f"retrying with backoff; refusing to start a bench that would hang in backend init")
    fallback = None
    try:
        with open(_LAST_GOOD_PATH) as f:
            fallback = json.load(f)
    except (OSError, ValueError):
        pass
    if fallback and fallback.get("value") is not None:
        fallback.update({"stale": True, "error": error})
        print(json.dumps(fallback))
        # The JSON line is a STALE re-emission of the last good measurement,
        # not a fresh run — consumers parsing the payload must check the
        # `stale` flag before comparing values. HYBRIDODE_BENCH_STRICT=1
        # additionally exits 4 so exit-status consumers can't mistake the
        # fallback for success; the default stays 0 because the round driver
        # records this process's stdout as the round's BENCH artifact and a
        # stale-labeled artifact beats a missing one.
        sys.exit(4 if os.environ.get("HYBRIDODE_BENCH_STRICT") == "1" else 0)
    print(json.dumps({
        "metric": "hybrid_lhm_dim8_epoch_wallclock", "value": None,
        "unit": "s/epoch", "vs_baseline": None, "error": error,
    }))
    sys.exit(3)


if __name__ == "__main__":
    _probe_tunnel()
    with _pause_own_queues():
        main()
