"""MFU / roofline accounting for the three hot paths (VERDICT round-1 #4).

For each hot path — fused posterior kernel, ScaSML Picard rollout, Gram
assembly + factorization — this script computes ANALYTIC flop and byte counts,
measures strict per-call synced wall-clock on the attached device, and reports
achieved TFLOP/s + GB/s against the chip's peak (device_kind-based table), plus
which roofline regime (compute vs HBM bandwidth) bounds the kernel.

Writes ``reports/mfu.json``; ``bench.py`` echoes the summary on stderr.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/mfu.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from scasml_gp_tpu.utils.timing import device_loop_time

# (bf16 peak TFLOP/s, HBM GB/s) per chip family. fp32 elementwise work runs on
# the VPU, far below these numbers; the MXU matmuls here are fp32-accumulating
# with fp32 operands, for which the practical ceiling is ~1/2 the bf16 peak
# (one extra pass). We report achieved numbers against the bf16 peak — a
# conservative (under-)estimate of utilization.
PEAKS = {
    "v4": (275.0, 1228.0),
    "v5 lite": (197.0, 819.0),
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v6 lite": (918.0, 1640.0),
    "v6e": (918.0, 1640.0),
}


def chip_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAKS.items():
        if key in kind:
            return kind, val
    return kind, (None, None)


def synced_time(fn, *args, reps=8, **kw):
    """Strict per-call sync — ONLY for >=100 ms work where the ~20 ms relay
    round trip is negligible; sub-ms kernels use device_loop_time."""
    jax.block_until_ready(fn(*args, **kw))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def entry(name, t_s, flops, bytes_, peak_tf, peak_bw):
    tf = flops / t_s / 1e12
    gbs = bytes_ / t_s / 1e9
    out = {
        "path": name,
        "time_ms": round(t_s * 1e3, 4),
        "analytic_gflops": round(flops / 1e9, 3),
        "analytic_mbytes": round(bytes_ / 1e6, 3),
        "achieved_tflops": round(tf, 3),
        "achieved_gbs": round(gbs, 2),
    }
    if peak_tf:
        out["mfu_vs_bf16_peak"] = round(tf / peak_tf, 4)
        out["bw_util"] = round(gbs / peak_bw, 4)
        # roofline: which resource the analytic intensity pins
        t_compute = flops / (peak_tf * 1e12)
        t_memory = bytes_ / (peak_bw * 1e9)
        out["roofline_bound"] = "compute" if t_compute > t_memory else "memory"
        out["roofline_ms"] = round(max(t_compute, t_memory) * 1e3, 4)
        out["frac_of_roofline"] = round(
            max(t_compute, t_memory) / t_s, 4
        )
    return out


def posterior_case(n, N, Nb, d, peak_tf, peak_bw):
    from scasml_gp_tpu.gp.pallas_posterior import posterior_eval_fused
    from scasml_gp_tpu.gp.posterior import posterior_eval

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.uniform(ks[0], (n, d + 1), minval=-0.5, maxval=0.5)
    x_dom = jax.random.uniform(ks[1], (N, d + 1), minval=-0.5, maxval=0.5)
    x_bdy = jax.random.uniform(ks[2], (Nb, d + 1), minval=-0.5, maxval=0.5)
    r = jax.random.normal(ks[3], (4 * N + Nb,)) * 0.1
    gamma = jnp.array([1.0 / (0.0625 * d)] * 2 + [0.0], jnp.float32)

    fp = -(-(d + 1) // 128) * 128          # feature dim padded to 128
    ti, tj = 256, 512
    n_pad = -(-n // ti) * ti
    N_pad = -(-N // tj) * tj
    # 3 MXU matmuls per tile pair (pair products + 2 gradient contractions)
    flops = 3 * 2 * n_pad * N_pad * fp + 60 * n_pad * N_pad
    # x streamed once per i-row, y tiles re-streamed per i-row; outputs O(n)
    bytes_ = 4 * (
        n_pad * fp                       # x tiles (kept across the j sweep)
        + (n_pad // ti) * N_pad * (fp + 128)  # y + r tiles per i-row
        + 8 * n_pad + 2 * n_pad * fp     # ops8 + two gradient accumulators
    )

    rows = []
    for name, fn in (
        ("xla", lambda xx: posterior_eval(
            xx, x_dom, x_bdy, r, gamma, d, want_grad=True, want_ops=True,
            chunk=8192)),
        ("pallas", lambda xx: posterior_eval_fused(
            xx, x_dom, x_bdy, r, gamma, d, want_grad=True, want_ops=True)),
    ):
        t = device_loop_time(fn, x, iters=16)
        rows.append(entry(f"posterior_{name}(n={n},N={N},d={d})", t, flops,
                          bytes_, peak_tf, peak_bw))
    return rows


def gram_case(N, Nb, d, peak_tf, peak_bw):
    from scasml_gp_tpu.gp.gram import gram_matrix, regularized_factorization

    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x_dom = jax.random.uniform(ks[0], (N, d + 1), minval=-0.5, maxval=0.5)
    x_bdy = jax.random.uniform(ks[1], (Nb, d + 1), minval=-0.5, maxval=0.5)
    gamma = jnp.asarray([1.0 / (0.0625 * d)] * 2 + [0.0], jnp.float32)
    phi = 4 * N + Nb

    t_g = device_loop_time(
        lambda xd: gram_matrix(xd, x_bdy, gamma, d), x_dom, iters=256
    )
    pair_rows = (N + Nb) ** 2
    flops_g = 2 * pair_rows * (d + 1) + 25 * 10 * pair_rows
    bytes_g = 4 * (phi * phi + (N + Nb) * (d + 1) * 2)  # K write dominates
    # NOTE: in the timing loop the consumer is a reduction, so XLA may fuse
    # the assembly into it and skip materializing K — bw_util can read >1
    # against this byte count; production (factorization consumer) writes K.
    g_entry = entry(f"gram_assembly(N={N},Nb={Nb},d={d})", t_g, flops_g,
                    bytes_g, peak_tf, peak_bw)

    K = gram_matrix(x_dom, x_bdy, gamma, d)
    t_f = device_loop_time(
        lambda KK: regularized_factorization(KK, jnp.float32(1e-2))[1],
        K, iters=8,
    )
    # cholesky (phi^3/3) + 3 jittered retries + triangular solve w/ phi rhs
    # (phi^3/2) + Minv matmul (phi^3) , x2 flops per MAC
    flops_f = 2 * (3 * phi**3 / 3 + phi**3 / 2 + phi**3)
    bytes_f = 4 * 4 * phi * phi
    f_entry = entry(f"factorization(phi={phi})", t_f, flops_f, bytes_f,
                    peak_tf, peak_bw)
    return [g_entry, f_entry]


def rollout_case(B, d, n, M, peak_tf, peak_bw):
    from scasml_gp_tpu.config import GPConfig
    from scasml_gp_tpu.equations import GradDependentNonlinear
    from scasml_gp_tpu.gp import GPGradDependentNonlinear
    from scasml_gp_tpu.picard.scasml import ScaSMLFullHistory

    eq = GradDependentNonlinear(n_input=d + 1)
    gp = GPGradDependentNonlinear(eq, GPConfig(gn_steps=8))
    x_dom, x_bdy = eq.generate_data(1000, 200, key=jax.random.PRNGKey(0))
    gp.GPsolver(x_dom, x_bdy)
    sca = ScaSMLFullHistory(eq, gp)
    x_t = eq.geometry().sample_domain(jax.random.PRNGKey(1), B)

    fn = sca._get_fn((n, M))
    params = sca._params()
    key = jax.random.PRNGKey(2)
    t = device_loop_time(lambda xt: fn(xt, key, params), x_t, iters=4)

    # dominant work: GP posterior evals at every tree node; count rows from
    # the schedule counters (per-point f/g evaluations)
    from scasml_gp_tpu.picard.schedule import count_evaluations_full_history

    rows = B * count_evaluations_full_history(n, M, scasml_variant=True,
                                              count_fg=True)
    N, Nb = 1000, 200
    per_row = 3 * 2 * (N + Nb) * (d + 1) + 60 * (N + Nb)
    flops = rows * per_row
    # node coordinates + outputs; the training set stays VMEM-resident
    bytes_ = rows * 4 * (d + 1 + 8)
    return entry(
        f"scasml_rollout(B={B},d={d},n={n},M={M})", t, flops, bytes_,
        peak_tf, peak_bw,
    )


def main():
    kind, (peak_tf, peak_bw) = chip_peaks()
    print(f"device: {kind} peaks: {peak_tf} TF/s {peak_bw} GB/s",
          file=sys.stderr, flush=True)
    rows = [
        *posterior_case(8192, 1000, 200, 20, peak_tf, peak_bw),
        *posterior_case(65536, 1000, 200, 20, peak_tf, peak_bw),
        *posterior_case(8192, 1000, 200, 100, peak_tf, peak_bw),
        *gram_case(1000, 200, 20, peak_tf, peak_bw),
        rollout_case(1200, 20, 2, 3, peak_tf, peak_bw),
    ]
    out = {"device_kind": kind, "peak_bf16_tflops": peak_tf,
           "peak_hbm_gbs": peak_bw, "paths": rows}
    os.makedirs("reports", exist_ok=True)
    with open("reports/mfu.json", "w") as fh:
        json.dump(out, fh, indent=2)
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
