"""On-device parity audit: run the parity-critical stages on the DEFAULT
backend (the TPU in this container) and compare against float64 host
oracles.

Why this exists: the CPU test harness can never see TPU-only numerics.
TPU MXUs execute f32 dots at DEFAULT precision as single-pass bf16,
which cost the mip chain 6.4e-4 absolute error against an f64 oracle
(~2^-9 relative — the bf16 mantissa) until every parity-critical
contraction pinned ``precision=HIGHEST`` (vision/features._EXACT).
This script is the regression guard for that class of bug: run it on
the TPU after touching any contraction.

Usage:  python benchmarks/tpu_parity.py [--json out.json]
Prints one JSON object with per-stage max abs errors and PASS/FAIL
against the documented tolerances.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _common                                          # noqa: E402
_common.enable_compile_cache()

from vaudio.config import AuralizerConfig               # noqa: E402
from vaudio.dsp import hann_sinc_peak_fast              # noqa: E402
from vaudio.synth import SynthConstants                 # noqa: E402
from vaudio.synth.spectrum import contract_spectrum     # noqa: E402
from vaudio.vision.features import (                    # noqa: E402
    mip_downsample_planes)


def mip_oracle(planes_u8: np.ndarray, level: int, scale: float):
    """f64 box mean, the math both device paths must reproduce."""
    c, h, w = planes_u8.shape
    k = 1 << level
    ho, wo = h >> level, w >> level
    x = planes_u8[:, :ho * k, :wo * k].astype(np.float64)
    return x.reshape(c, ho, k, wo, k).sum(axis=(2, 4)) * (scale / (k * k))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--res", default="1080x1920")
    args = ap.parse_args(argv)
    h, w = (int(x) for x in args.res.split("x"))
    rng = np.random.default_rng(20260816)
    report = {"backend": jax.default_backend(),
              "device": str(jax.devices()[0]), "stages": {}, "ok": True}

    def check(name, err, tol):
        entry = {"max_abs_err": float(err), "tol": tol,
                 "ok": bool(err <= tol)}
        report["stages"][name] = entry
        report["ok"] &= entry["ok"]
        print(f"{name:28s} {err:.3e}  (tol {tol:.0e})"
              f" {'PASS' if entry['ok'] else 'FAIL'}", file=sys.stderr)

    # -- mip chain, u8 fast path (int8 first matmul + exact f32 second)
    planes = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
    oracle = mip_oracle(planes, 3, 1 / 255.0)
    got = np.asarray(mip_downsample_planes(jnp.asarray(planes), 3,
                                           scale=1 / 255.0))
    check("mip_u8_int8_path", np.abs(got - oracle).max(), 1e-6)

    # -- mip chain, f32 input path
    got = np.asarray(mip_downsample_planes(
        jnp.asarray(planes.astype(np.float32) / 255.0), 3))
    check("mip_f32_path", np.abs(got - oracle).max(), 2e-6)

    # -- fused Pallas pool kernel (plane must fit VMEM)
    try:
        from vaudio.ops import mip_pool_pallas
        got = np.asarray(mip_pool_pallas(jnp.asarray(planes), 3,
                                         scale=1 / 255.0))
        check("mip_pallas_kernel", np.abs(got - oracle).max(), 1e-6)
    except Exception as e:                              # pragma: no cover
        report["stages"]["mip_pallas_kernel"] = {"error": repr(e)}
        report["ok"] = False
        print(f"mip_pallas_kernel            ERROR {e!r}", file=sys.stderr)

    # -- tiled two-level histogram vs integer host oracle (the tiled
    # path must reproduce the dense one-hot's exact counts on device)
    from vaudio.config import AuralizerConfig as _AC
    from vaudio.vision.features import hue_histogram_planes
    cfg_h = _AC()
    hm, wm = 135, 240                      # production mip-3 dims (ragged)
    hp = rng.random((hm, wm), dtype=np.float64).astype(np.float32)
    sp = rng.random((hm, wm), dtype=np.float64).astype(np.float32)
    ip = rng.random((hm, wm), dtype=np.float64).astype(np.float32)
    got = np.asarray(hue_histogram_planes(jnp.asarray(hp), jnp.asarray(sp),
                                          jnp.asarray(ip), cfg_h))
    # host oracle: straight integer binning
    gate = (sp > cfg_h.saturation_gate) & (ip > cfg_h.intensity_gate)
    bins_i = np.clip((hp * np.float32(cfg_h.num_hue_bins - 1)
                      ).astype(np.int32), 0, cfg_h.num_hue_bins - 1)
    y, x = np.mgrid[0:hm, 0:wm]
    cell = (x * cfg_h.grid_size) // wm * cfg_h.grid_size \
        + ((hm - 1 - y) * cfg_h.grid_size) // hm
    oracle_h = np.zeros((cfg_h.num_cells, cfg_h.num_hue_bins))
    np.add.at(oracle_h, (cell[gate], bins_i[gate]), 1.0)
    check("hue_histogram_tiled", np.abs(got - oracle_h).max(), 0.0)

    # -- polynomial acos (the fast_hue_acos default) on the VPU:
    # (a) acos_poly vs the true f64 arccos on a dense f32 grid — the
    # polynomial's promise (2e-8 rad) plus VPU sqrt/fma rounding;
    # (b) the hue planes with fast_acos True vs False BOTH on device —
    # the deviation the flag itself introduces on identical f32
    # arguments.  (Comparing either f32 path against an f64 *formula*
    # oracle instead is dominated by d(acos)/dx = 1/sqrt(1-x^2) input
    # amplification near x = +-1 — a conditioning property every f32
    # implementation shares, incl. the reference's Metal acos: measured
    # 4.1e-5 for both paths on random planes, so it cannot distinguish
    # them.)
    from vaudio.vision.features import acos_poly, rgb_to_hsi_planes
    xg = np.linspace(-1.0, 1.0, 200_001).astype(np.float32)
    got_a = np.asarray(acos_poly(jnp.asarray(xg)))
    # tol = ~3 ulps of pi: near x=-1 the result is ~pi (f32 ulp 2.4e-7)
    # and the VPU's sqrt/fma rounding differs from the CPU's by an ulp
    # (measured 5.1e-7 on the v5e vs <5e-7 on CPU).
    check("acos_poly_dense_grid",
          np.abs(got_a - np.arccos(xg.astype(np.float64))).max(), 8e-7)
    rp = rng.random((hm, wm), dtype=np.float64).astype(np.float32)
    gp = rng.random((hm, wm), dtype=np.float64).astype(np.float32)
    bp = rng.random((hm, wm), dtype=np.float64).astype(np.float32)
    h_poly, _, _ = rgb_to_hsi_planes(jnp.asarray(rp), jnp.asarray(gp),
                                     jnp.asarray(bp), fast_acos=True)
    h_ref, _, _ = rgb_to_hsi_planes(jnp.asarray(rp), jnp.asarray(gp),
                                    jnp.asarray(bp), fast_acos=False)
    check("hsi_hue_poly_vs_exact",
          np.abs(np.asarray(h_poly) - np.asarray(h_ref)).max(), 1e-6)

    # -- spectrum contraction (F x NP peak matrix @ weights)
    cfg = AuralizerConfig()
    consts = SynthConstants.create(cfg)
    npartials = int(consts.seed_phase.size)    # num_cells * partials/cell
    pf = rng.uniform(30.0, 8000.0, npartials).astype(np.float32)
    wgt = rng.normal(0, 1e-3, (npartials, 2)).astype(np.float32)
    ibw = np.full(npartials, 1.0 / cfg.narrow_bandwidth, np.float32)
    cur = np.asarray(contract_spectrum(jnp.asarray(pf), jnp.asarray(wgt),
                                       jnp.asarray(ibw), cfg, consts))
    # Isolate the DOT's error: rebuild the same f32 peak matrix the
    # device contracts (elementwise math agrees to ulps across backends)
    # and contract it in f64 on the host.
    hann_mult = np.float32(1.0 / cfg.bin_width)
    d32 = (np.asarray(consts.freqs)[:, None] - pf[None, :]) \
        * (hann_mult * ibw)[None, :]
    W = np.asarray(hann_sinc_peak_fast(jnp.asarray(d32)))
    oracle = W.astype(np.float64) @ wgt.astype(np.float64)
    check("spectrum_contraction", np.abs(cur - oracle).max(),
          np.abs(oracle).max() * 2e-6 + 1e-9)

    # -- phase accumulation, serial vs prefix-sum, ON DEVICE vs an f64
    # host oracle.  Round 4 added use_cumsum_phases (runtime/chunked.py:
    # 132-155 — phases as a mod-2pi associative scan once the hue scan
    # has run); its ~ulp(advance)/frame random walk was characterized
    # on CPU only (tests/test_chunked.py::test_cumsum_phases).  Audit
    # both paths on the TPU: errors are circular (phases live mod 2pi);
    # tolerances are the measured walk at T=128 (CPU: serial 1.6e-2,
    # cumsum 1.1e-2 rad — ulp(raw advance) ~3e-5/frame accumulating
    # near-linearly; 1.4e-3 at T=32) with 2x headroom.  The audit's
    # claim is the documented one: NEITHER path is exact, the cumsum
    # path is no FARTHER from f64 than the reference-faithful serial
    # path, and their mutual divergence stays in the characterized
    # band (config.use_cumsum_phases).
    from vaudio.synth import phase_accumulate, phase_advance
    T = 128
    hues_seq = jnp.asarray(rng.integers(0, 360, (T, cfg.grid_size ** 2)),
                           jnp.int32)
    from vaudio.runtime.step import init_carry
    p0 = jnp.asarray(
        rng.uniform(0, 2 * np.pi, init_carry(cfg).phases.shape),
        jnp.float32)
    two_pi = np.float32(2.0 * np.pi)

    @jax.jit
    def both_paths(p0, hues_seq):
        def body(p, h):
            p2 = phase_accumulate(p, h, cfg, consts)
            return p2, None
        serial_last, _ = jax.lax.scan(body, p0, hues_seq)
        adv = jax.vmap(lambda h: phase_advance(h, cfg, consts))(hues_seq)
        pre = jax.lax.associative_scan(
            lambda a, b: jnp.mod(a + b, two_pi), jnp.mod(adv, two_pi),
            axis=0)
        cum_last = jnp.mod(p0 + pre[-1], two_pi)
        return serial_last, cum_last, adv

    serial_last, cum_last, adv = jax.tree.map(np.asarray,
                                              both_paths(p0, hues_seq))

    def circ(a, b):
        d = np.abs(a.astype(np.float64) - b.astype(np.float64))
        return np.minimum(d, 2 * np.pi - d).max()

    oracle_p = np.mod(np.asarray(p0, np.float64)
                      + adv.astype(np.float64).sum(axis=0), 2 * np.pi)
    err_serial = circ(serial_last, oracle_p)
    err_cumsum = circ(cum_last, oracle_p)
    check("phase_serial_vs_f64", err_serial, 3.2e-2)
    check("phase_cumsum_vs_f64", err_cumsum, 3.2e-2)
    check("phase_cumsum_vs_serial", circ(cum_last, serial_last), 2e-2)
    # cumsum must not be categorically worse than serial (2x slack on a
    # random walk whose realization varies run to run).
    check("phase_cumsum_over_serial_ratio",
          err_cumsum / max(err_serial, 1e-9), 2.0)

    out = json.dumps(report)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
