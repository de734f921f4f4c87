"""Headline benchmark: the reference's flagship workload on one TPU chip.

Workload (identical to reference SimpleUniform d=20, BASELINE.md):
train the GP on 1000+200 points, then run the ScaSML quadrature solve
(n = rho = 2) over 1200 test points.  The reference takes 353.1 s for that
solve (results/.../20d/SimpleUniform/SimpleUniform.log); we report the
steady-state wall-clock of the same solve and the speedup as ``vs_baseline``.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "s", "vs_baseline": <speedup x>}
Side diagnostics (accuracy parity, GP train time) go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from scasml_gp_tpu.config import GPConfig
    from scasml_gp_tpu.equations import GradDependentNonlinear
    from scasml_gp_tpu.gp import GPGradDependentNonlinear
    from scasml_gp_tpu.picard import ScaSML

    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    err("devices:", jax.devices())

    d = 20
    eq = GradDependentNonlinear(n_input=d + 1)
    gp = GPGradDependentNonlinear(eq, GPConfig(gn_steps=20))
    x_dom, x_bdy = eq.generate_data(1000, 200, key=jax.random.PRNGKey(1234))

    t0 = time.perf_counter()
    gp.GPsolver(x_dom, x_bdy)
    jax.block_until_ready(gp.state.right_vector)
    err(f"GP train (incl. compile): {time.perf_counter() - t0:.2f}s")

    xt_dom, xt_bdy = eq.generate_test_data(1000, 200, key=jax.random.PRNGKey(42))
    x_test = jnp.concatenate([xt_dom, xt_bdy], axis=0)
    err("test data ready")
    exact = np.asarray(eq.exact_solution(x_test)).ravel()
    err("exact solution ready")

    solver = ScaSML(eq, gp)
    # Warm-up: compile the rollout once.
    t0 = time.perf_counter()
    u = jax.block_until_ready(solver.u_solve(2, 2, x_test))
    err(f"ScaSML warm-up (incl. compile): {time.perf_counter() - t0:.2f}s")
    rel = np.linalg.norm(np.asarray(u).ravel() - exact) / np.linalg.norm(exact)
    err(f"ScaSML quad d=20 rel_L2: {rel:.4f} (reference: 0.0701, GP alone 0.1466)")

    # Steady-state timing of the FULL u_solve = rollout + posterior + add as
    # one composed program, measured with the in-graph chained-loop protocol
    # (utils/timing.device_loop_time).  The enqueue-N-sync-once protocol
    # under-reports through the device relay and per-call sync adds ~20 ms of
    # host round trip — see reports/posterior_probe.md.
    from scasml_gp_tpu.gp.posterior import posterior_eval
    from scasml_gp_tpu.utils.timing import device_loop_time

    uz_fn = solver._get_fn((2, 2))
    state = solver._params()
    key = jax.random.PRNGKey(7)

    def full_solve(xt):
        uz = uz_fn(xt, key, state)
        u_hat = posterior_eval(
            xt, state.x_dom, state.x_bdy, state.right_vector, state.gamma, d
        ).u[:, None]
        return u_hat + uz[:, :1]

    # k independent protocol runs (VERDICT round-4 Next #6): the relay's
    # day-to-day throughput varies (bit-identical programs measured 0.63 /
    # 0.84 / 2.12 ms across rounds), so one chained-loop measurement has no
    # dispersion to show.  Report median + IQR over k full protocol runs and
    # let _vs_prev flag itself unreliable when IQR/median > 20%.
    k = 5
    samples = sorted(
        device_loop_time(full_solve, x_test, iters=16, reps=3)
        for _ in range(k)
    )
    t = float(np.median(samples))
    iqr = float(np.percentile(samples, 75) - np.percentile(samples, 25))
    err(f"timing samples (s): {[round(s, 6) for s in samples]} "
        f"median={t:.6f} iqr={iqr:.6f}")

    # MFU/roofline side table (scripts/mfu.py), if recorded on this machine
    try:
        with open("reports/mfu.json") as fh:
            mfu = json.load(fh)
        for row in mfu["paths"]:
            err("mfu:", json.dumps(row))
    except Exception:
        pass

    baseline_s = 353.1  # reference wall-clock for the same solve (BASELINE.md)
    out = {
        "metric": "scasml_quad_d20_solve_1200pts_wallclock",
        "value": round(t, 5),
        "unit": "s",
        "vs_baseline": round(baseline_s / t, 1),
        # Timing-protocol tag (VERDICT round-3 Next #3): rounds are only
        # comparable within one protocol.  v2 = in-graph chained-loop
        # (utils/timing.device_loop_time).  BENCH_r01/r02 used the
        # enqueue-N-sync-once protocol, which under-reports ~28% through
        # the device relay (reports/mfu_notes.md §1) — their headline
        # values are NOT comparable to v2 rounds.
        "protocol": "in-graph-chained-loop-v2",
        "median": round(t, 6),
        "iqr": round(iqr, 6),
        "k": k,
    }
    out.update(_vs_prev(t, iqr, current_round=_current_round()))
    print(json.dumps(out))


def _current_round():
    """Round number this benchmark run belongs to, for _vs_prev exclusion:
    --round if given, else (newest VERDICT round) + 1 — VERDICT_r{N} is
    written at the END of round N, so its presence means round N+1 is in
    flight.  Falls back to None (use the newest BENCH file) when nothing
    identifies the round."""
    if "--round" in sys.argv:
        return int(sys.argv[sys.argv.index("--round") + 1])
    try:
        import re

        with open("VERDICT.md") as fh:
            head = fh.read(200)
        m = re.search(r"Round (\d+)", head)
        if m:
            return int(m.group(1)) + 1
    except Exception:
        pass
    return None


def _vs_prev(t, iqr, current_round=None):
    """Diff against the newest committed BENCH_r*.json from a PREVIOUS round
    (same-protocol only).  ``current_round`` excludes this round's own file,
    so a re-run after the driver already wrote BENCH_r{N}.json still diffs
    against round N-1 (ADVICE round-4 #4)."""
    import glob
    import re

    prevs = sorted(
        glob.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    if current_round is not None:
        prevs = [
            p for p in prevs
            if int(re.search(r"r(\d+)", p).group(1)) < current_round
        ]
    if not prevs:
        return {}
    path = prevs[-1]
    try:
        with open(path) as fh:
            prev = json.load(fh)
        if "parsed" in prev:  # the driver wraps the JSON line
            prev = prev["parsed"]
        prev_val = float(prev["value"])
    except Exception:
        return {}
    # r03 ran the v2 (in-graph chained-loop) protocol before the tag
    # existed; r01/r02 ran the under-reporting enqueue-sync protocol.
    round_no = int(re.search(r"r(\d+)", path).group(1))
    default_proto = (
        "in-graph-chained-loop-v2" if round_no >= 3 else "enqueue-sync-v1"
    )
    prev_proto = prev.get("protocol", default_proto)
    fields = {
        "prev_round": path,
        "prev_value": prev_val,
        "prev_protocol": prev_proto,
    }
    if prev_proto == "in-graph-chained-loop-v2":
        if iqr / max(t, 1e-12) > 0.2:
            # relay dispersion exceeds 20% of the median: a round-to-round
            # ratio would measure relay weather, not the code
            fields["vs_prev"] = None
            fields["vs_prev_note"] = (
                f"suppressed: IQR/median = {iqr / max(t, 1e-12):.2f} > 0.2 "
                "(relay dispersion dominates; see reports/bench_r4_notes.md)"
            )
        else:
            fields["vs_prev"] = round(prev_val / t, 3)  # >1 means faster now
    else:
        fields["vs_prev"] = None
        fields["vs_prev_note"] = (
            "previous round used a different timing protocol; r02->r03 "
            "apparent +25% was the protocol fix, not a regression"
        )
    return fields


def _child(queue):
    import io

    buf = io.StringIO()
    real_stdout = sys.stdout
    sys.stdout = buf
    try:
        main()
        queue.put(("ok", buf.getvalue()))
    except Exception as e:  # pragma: no cover
        queue.put(("err", f"{type(e).__name__}: {e}"))
    finally:
        sys.stdout = real_stdout


if __name__ == "__main__":
    # The TPU tunnel in this environment occasionally wedges a random program
    # compile (the process blocks at ~0% CPU forever) or aborts mid-run.
    # Run the benchmark in a watchdogged child process and retry in a fresh
    # process context on hang or failure.
    import multiprocessing as mp

    mp.set_start_method("spawn", force=True)
    attempts = 3
    for attempt in range(attempts):
        queue = mp.Queue()
        proc = mp.Process(target=_child, args=(queue,))
        proc.start()
        proc.join(timeout=480)
        if proc.is_alive():
            print(f"bench attempt {attempt + 1} hung; killing and retrying",
                  file=sys.stderr, flush=True)
            proc.terminate()
            proc.join(10)
            time.sleep(60)  # let the device relay recover
            continue
        if not queue.empty():
            status, payload = queue.get()
            if status == "ok":
                print(payload, end="")
                break
            print(f"bench attempt {attempt + 1} failed ({payload}); retrying",
                  file=sys.stderr, flush=True)
        time.sleep(30)
    else:
        raise SystemExit("bench failed after all attempts")
