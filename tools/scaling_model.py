"""Analytic multi-chip scaling projection for the Gaussian-sharded sort
engine (VERDICT r3 missing #3 / next #6).

No multi-chip hardware exists in this environment (the driver's dryrun
proves CORRECTNESS on a virtual mesh), so the >=80%-scaling-efficiency
north star (BASELINE.md, v4-16) is projected analytically from
  (a) the engine's EXACT buffer/segment formulas (imported from
      rasterize_pallas: R_loc, send cap C, receive table RB — the same
      arithmetic the compiled HLO all-to-alls move, audited by
      tests/test_multihost.py), and
  (b) measured single-chip component rates at bench scale (round-4
      row-diet trace, v5e, R = 7.44M entries, 1.5M gaussians, 1280x720):
      sort ~8 ms + 5.5 ms/payload-row per 7.44M entries; fwd kernel
      24.6 ms / bwd kernel 37.5 ms per 7.0M covered entries x 256 px;
      glue ~30 ms scaling with entry count.

Model (per step, D devices, no compute/comm overlap — conservative):
  local bin+sort:   t_sort(R_loc, fwd_rows)            [1/D]
  recv merge sort:  t_sort(RB, fwd_rows)               [RB = D*C]
  kernels:          (t_fwd + t_bwd) / D                [tile bands]
  bwd un-sort:      t_sort(RB, bwd_rows)
  slot restore:     t_sort(2*R_loc, bwd_rows)
  glue:             t_glue / D
  comm:             2 * rows * C * D * 4 B / ici_bw    (fwd + bwd
                    all-to-alls; each device sends D-1 of its D chunks,
                    ~= the full buffer for D >> 1)

Usage: PYTHONPATH=. python tools/scaling_model.py [--json out.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measured single-chip rates (v5e, round 4; tools/profiles/DESIGN_SORT.md)
# lax.sort fits t = A + (KEY_B + ROW_B*rows)*entries from the probe's two
# key-only points (0.93M -> 2.45 ms, 7.44M -> 7.96 ms) + the 5.5 ms/row
# marginal: the ~1.7 ms PER-CALL fixed cost is what makes small-shard
# sorts relatively expensive at high D.
R_BENCH = 7_440_000
SORT_FIXED_MS = 1.66
SORT_KEY_NS = 0.85
SORT_ROW_NS = 0.74
FWD_KERNEL_MS = 24.6       # @ 7.0M covered entries (random scene)
BWD_KERNEL_MS = 37.5
GLUE_MS = 30.0             # tier-2 merge + staging + misc, ~ entry-linear
ICI_BW = {                 # effective per-chip all-to-all GB/s (aggregate
    "v5e": 45.0,           # over links; 2D torus vs v4's 3D)
    "v4": 100.0,
    "v5p": 180.0,
}


def t_sort(entries, rows):
    return SORT_FIXED_MS + (SORT_KEY_NS + SORT_ROW_NS * rows) * entries / 1e6


def project(D, *, n=1_500_000, d_small=4, d_max=10, big_fraction=0.16,
            send_beta=2.0, n_passes=1, chip="v4", copy_restore=False):
    from wildgaussians_tpu.ops.rasterize_pallas import (
        _grad_rows, _round_up, _sort_engine_sizes)
    from wildgaussians_tpu.ops.rasterize_tiled import make_grid

    grid = make_grid(1280, 720, 16)
    (d1, d2x, m_cap, R, _rp, table_w, col0s, _db) = _sort_engine_sizes(
        grid, 256, n, d_max, n_passes, d_small, big_fraction, True)
    # sharded-engine locals (mirrors _make_sharded_sort_blend_vjp)
    n_loc = n // D
    m_cap_loc = min(max(int(n_loc * big_fraction), 8), n_loc) if d2x else 0
    R_loc = n_loc * d1 + m_cap_loc * d2x
    K = 256
    C = min(_round_up(R_loc, 128),
            _round_up(max(int(R_loc * send_beta / D), 2 * K), 128))
    RB = D * C
    fwd_rows = 1 + len(col0s) + 3   # key + xy + (ca,cc) + (cb,op) + rgb/pass
    bwd_rows = (_grad_rows(n_passes) + 1) // 2   # f16-packed

    # balanced per-(sender, band) segment ~ R_loc / D; cap headroom:
    headroom = C / max(R_loc / D, 1)

    restore = (t_sort(R_loc, bwd_rows) if copy_restore   # Pallas D-run
               else t_sort(2 * R_loc, bwd_rows))          # merge vs copy
    compute = (
        t_sort(R_loc, fwd_rows)                 # local bin+sort
        + t_sort(RB, fwd_rows)                  # receiver merge
        + FWD_KERNEL_MS / D + BWD_KERNEL_MS / D
        + t_sort(RB, bwd_rows)                  # un-sort (receive order)
        + restore                               # slot restore
        + GLUE_MS / D
    )
    bytes_fwd = fwd_rows * C * D * 4            # send buffer, one a2a
    bytes_bwd = bwd_rows * C * D * 4
    comm = (bytes_fwd + bytes_bwd) / (ICI_BW[chip] * 1e9) * 1e3
    step = compute + comm
    t1 = (t_sort(R, fwd_rows) + t_sort(R, bwd_rows)
          + FWD_KERNEL_MS + BWD_KERNEL_MS + GLUE_MS)
    return {
        "D": D, "chip": chip,
        "R_loc": R_loc, "send_cap_C": C, "RB": RB,
        "send_cap_headroom_x": round(headroom, 2),
        "a2a_MB_per_step_per_dev": round((bytes_fwd + bytes_bwd) / 1e6, 1),
        "compute_ms": round(compute, 1), "comm_ms": round(comm, 2),
        "step_ms": round(step, 1),
        "single_chip_ms": round(t1, 1),
        "scaling_efficiency": round(t1 / (D * step), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--chip", default="v4", choices=sorted(ICI_BW))
    args = ap.parse_args()
    out = {}
    for name, kw in (
            ("defaults (send_beta=2.0)", {}),
            ("balanced (send_beta=1.1, the trainer's adaptive floor)",
             {"send_beta": 1.1}),
            ("balanced + copy-restore (IMPLEMENTED round 4: D masked dynamic-slice writes + one R_loc un-sort replace the 2*R_loc merge)",
             {"send_beta": 1.1, "copy_restore": True})):
        rows = [project(D, chip=args.chip, **kw) for D in (2, 4, 8, 16)]
        print(f"## {name}")
        for r in rows:
            print(json.dumps(r))
        eff8 = [r for r in rows if r["D"] == 8][0]["scaling_efficiency"]
        print(f"# v4-16 (D=8) projected efficiency: {eff8:.0%} "
              f"(target >= 80%)")
        out[name] = rows
    if args.json:
        with open(args.json, "w", encoding="utf8") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
