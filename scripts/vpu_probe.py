"""Measure the chip's VPU (vector unit) ceilings empirically.

The MFU accounting (scripts/mfu.py) needs three ceilings: MXU flops, HBM
bandwidth, and VPU elementwise flops.  The first two have published numbers;
the VPU's practical fp32 throughput (and the cost of a transcendental) is
not published per chip, so we MEASURE it:

- ``fma``: a K-deep chain of y = y*a + b over a VMEM-friendly array, fused
  by XLA into one pass (arithmetic intensity 2K/8 flops/byte, far above the
  HBM knee for K=256) — pure VPU work, 2 flops per element per link.
- ``exp``: the same chain shape with exp links, isolating the transcendental
  unit; reported as equivalent-FMA cost per exp so analytic models can
  weight transcendentals.

Timing uses utils/timing.device_loop_time (in-graph chained loop; the only
honest protocol through the axon relay — see CLAUDE.md).  Writes
``reports/vpu_peak.json``.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/vpu_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp

from scasml_gp_tpu.utils.timing import device_loop_time

N = 1 << 21           # 2M fp32 elements = 8 MB: VMEM-friendly single pass
K_FMA = 256
K_EXP = 32
R_MIX = 32            # fma pairs per exp in a mixed link (~posterior mix)


def make_fma_chain(chains: int):
    """K_FMA fma pairs per element split across ``chains`` INDEPENDENT
    dependent-chains.  The peak is taken as the MAX over ILP variants
    (4/8/16 chains): a fixed low-ILP chain is latency-limited and
    UNDERSTATES what wide-ILP kernels achieve — round 4 measured the fused
    posterior running 4-5% above the 4-chain 'peak', i.e. the probe, not
    the kernel, was the bound."""

    def chain(x):
        ys = [
            x + jnp.float32(i) * jnp.float32(0.25) for i in range(chains)
        ]
        for _ in range(K_FMA // chains):
            ys = [y * jnp.float32(1.0000001) + jnp.float32(1e-7) for y in ys]
        return sum(ys)

    return chain


def exp_chain(x):
    # exp of a bounded negative value keeps y in (0, 1]: no overflow,
    # and the data dependence defeats algebraic simplification
    ys = [x + jnp.float32(i) * jnp.float32(0.25) for i in range(4)]
    for _ in range(K_EXP // 4):
        ys = [jnp.exp(-y - jnp.float32(0.001)) for y in ys]
    return sum(ys)


MIX_CHAINS = 16  # parallel chains: the posterior's pair-grid elements are
MIX_LINKS = 2    # independent, so the probe must offer abundant ILP too


def mixed_chain(x):
    """fma pairs + exp at the posterior's op mix (~64 flops per exp),
    across MIX_CHAINS independent chains.  Measures how fma and
    transcendental issue slots OVERLAP under realistic ILP: the additive
    serial model (t = flops/fma_rate + exps/exp_rate) was falsified by the
    posterior running ~1% FASTER than it (the round-3 frac-of-roofline
    rows above 1.0), so the roofline combination is calibrated with this
    measured overlap factor instead.  (A 4-chain variant measured 1.7x
    ABOVE additive — exp latency stalls low-ILP dependency chains — which
    is the opposite regime from the posterior's unbounded cross-element
    parallelism; hence the wide-ILP layout here.)"""
    ys = [x + jnp.float32(i) * jnp.float32(0.125) for i in range(MIX_CHAINS)]
    for _ in range(MIX_LINKS):
        new = []
        for y in ys:
            for _ in range(R_MIX):
                y = y * jnp.float32(1.0000001) + jnp.float32(1e-7)
            new.append(jnp.exp(-y - jnp.float32(0.001)))
        ys = new
    return sum(ys)


def _measure(fn, x, floor_s, name, iters=256, base_iters=64):
    """device_loop_time with a physical-possibility guard: through the
    relay, the two-loop-length subtraction can be swallowed by dispatch
    noise and clamp to ~0 (observed: an exp chain 'measured' 0.0 ms ->
    2^32 exp/s downstream).  Retry until the per-call time clears a
    generous hardware floor; fail loudly instead of writing garbage."""
    for _ in range(4):
        t = device_loop_time(fn, x, iters=iters, base_iters=base_iters,
                             reps=7)
        if t >= floor_s:
            return t
        print(f"{name}: implausible {t*1e6:.2f} us < floor "
              f"{floor_s*1e6:.2f} us; remeasuring", file=sys.stderr,
              flush=True)
    raise RuntimeError(f"{name} probe degenerate after retries")


def main():
    dev = jax.devices()[0]
    x = jnp.linspace(0.1, 1.0, N, dtype=jnp.float32)

    # floors: no TPU VPU does 50 TF/s fp32 or 20 T exp/s
    flops_fma = 2.0 * K_FMA * N
    t_by_ilp = {
        c: _measure(make_fma_chain(c), x, flops_fma / 50e12, f"fma{c}")
        for c in (4, 8, 16)
    }
    t_fma = min(t_by_ilp.values())
    vpu_tflops = flops_fma / t_fma / 1e12

    t_exp = _measure(exp_chain, x, K_EXP * N / 20e12, "exp")
    exps_per_s = K_EXP * N / t_exp
    # equivalent-FMA weight of one exp (ns_exp / ns_fma_flop-pair)
    exp_fma_equiv = (vpu_tflops * 1e12) / exps_per_s

    # mixed-workload overlap calibration: measured time vs the additive
    # serial prediction at the same op counts (<= 1 means partial overlap;
    # >= 1 means the additive model already bounds the mix and stands)
    flops_mix = 2.0 * R_MIX * MIX_CHAINS * MIX_LINKS * N
    exps_mix = MIX_CHAINS * MIX_LINKS * N
    t_mix = _measure(mixed_chain, x, flops_mix / 50e12, "mixed")
    t_add = flops_mix / (vpu_tflops * 1e12) + exps_mix / exps_per_s
    overlap = t_mix / t_add

    out = {
        "device_kind": dev.device_kind,
        "array_elems": N,
        "vpu_fp32_tflops": round(vpu_tflops, 3),
        "exp_per_s_g": round(exps_per_s / 1e9, 3),
        "exp_fma_equiv_flops": round(exp_fma_equiv, 2),
        "fma_chain_ms": round(t_fma * 1e3, 4),
        "fma_ms_by_ilp": {
            str(c): round(t * 1e3, 4) for c, t in t_by_ilp.items()
        },
        "exp_chain_ms": round(t_exp * 1e3, 4),
        "mixed_chain_ms": round(t_mix * 1e3, 4),
        "mixed_fma_pairs_per_exp": R_MIX,
        "mixed_overlap_raw": round(overlap, 4),
        "vpu_exp_overlap_factor": round(min(overlap, 1.0), 4),
    }
    os.makedirs("reports", exist_ok=True)
    with open("reports/vpu_peak.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), file=sys.stderr)


if __name__ == "__main__":
    main()
