"""Multi-host scaling report for the distributed BA path → SCALING.md.

BASELINE.md names the operating points to report: 1 chip, 1 host, N≥2
hosts, plus BA iterations/s, with ≥80% scaling efficiency at 2+ hosts.
Real multi-host hardware is not available in this image, so the report
combines three honest sources:

1. MEASURED single-chip BA step time (bench.py on the real TPU v5e).
2. MEASURED numerical equivalence of the flat 8-device and the 2-host ×
   4-chip ("host","map") hierarchical-psum solves vs the single-device
   solve (tests/test_parallel.py, virtual CPU mesh) — this validates the
   collective structure that would run over ICI/DCN.
3. A COMMUNICATION-VOLUME model for the DCN crossings: the design only
   ever moves the already-reduced dense system (H: D², b: D, cost: 1
   floats) across hosts — landmark tables (the big side) never leave
   their host. Efficiency = t_comp / (t_comp + t_dcn) with stated DCN
   assumptions; re-run on real pods to replace the model with measurement.

Usage: python scripts/scaling_report.py [--step-ms 2.29]
"""

from __future__ import annotations

import argparse
import json
import pathlib

# EuRoC sliding-window configuration (matches bench.py)
NUM_STATES = 8
DENSE_DIM = NUM_STATES * 15  # 120 minimal coords
LM_ITERS = 3
BYTES_F32 = 4

# DCN assumptions (TPU v5e pod-to-pod, conservative):
DCN_BW_GBPS = 25.0  # per-host effective all-reduce bandwidth
DCN_LAT_US = 50.0  # per all-reduce round latency


def dcn_cost_per_step(n_hosts: int) -> float:
    """Seconds of DCN time per optimize step (LM_ITERS iterations).

    Per iteration the hierarchical psum crosses DCN twice (evaluate:
    H,b,cost; solve: Schur complement S,g), each moving ~D² + D + 1 f32
    after the intra-host ICI reduction. Ring all-reduce moves
    2·(n-1)/n · bytes.
    """
    bytes_per_round = (DENSE_DIM**2 + DENSE_DIM + 1) * BYTES_F32
    rounds = 2 * LM_ITERS + 1  # +1 initial evaluate
    ring = 2.0 * (n_hosts - 1) / n_hosts
    bw_time = rounds * ring * bytes_per_round / (DCN_BW_GBPS * 1e9)
    lat_time = rounds * DCN_LAT_US * 1e-6
    return bw_time + lat_time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--step-ms",
        type=float,
        default=2.29,
        help="measured single-chip BA step time (bench.py; 436.7 steps/s)",
    )
    args = ap.parse_args()
    if args.step_ms <= 0:
        ap.error("--step-ms must be > 0")
    t_comp = args.step_ms * 1e-3

    rows = []
    # weak scaling: each host holds its own landmark shard of a bigger map;
    # compute per host stays ~constant, only the dense psum crosses DCN.
    for n_hosts in (1, 2, 4, 8):
        t_dcn = 0.0 if n_hosts == 1 else dcn_cost_per_step(n_hosts)
        t_step = t_comp + t_dcn
        eff = t_comp / t_step
        rows.append(
            {
                "hosts": n_hosts,
                "steps_per_s": round(1.0 / t_step, 1),
                "iters_per_s": round(LM_ITERS / t_step, 1),
                "dcn_ms": round(t_dcn * 1e3, 3),
                "efficiency": round(eff, 3),
            }
        )

    out = pathlib.Path(__file__).resolve().parent.parent / "SCALING.md"
    lines = [
        "# Distributed BA scaling report",
        "",
        "Operating points required by BASELINE.md (1 chip / 1 host / N≥2",
        "hosts, BA iterations/s, ≥80% efficiency at 2+ hosts).",
        "",
        "## Measured",
        "",
        f"- Single TPU v5e chip: **{1e3 / args.step_ms:.1f} optimize steps/s**",
        f"  ({LM_ITERS} LM iterations each → {LM_ITERS * 1e3 / args.step_ms:.0f}",
        "  BA iterations/s) — bench.py on real hardware.",
        "- Numerical equivalence: flat 8-device mesh AND 2-host × 4-chip",
        '  ("host","map") hierarchical-psum solves match the single-device',
        "  solve to 1e-8 (tests/test_parallel.py, virtual CPU mesh).",
        "",
        "## Modeled multi-host weak scaling",
        "",
        "Each host owns its landmark/observation shard (map sharding; the",
        "window's dense states are replicated). Only the reduced dense",
        f"system (D={DENSE_DIM}: {(DENSE_DIM**2 + DENSE_DIM + 1) * 4 / 1024:.0f} KiB"
        " f32) crosses DCN — "
        f"{2 * LM_ITERS + 1} all-reduce rounds per step.",
        f"Assumptions: {DCN_BW_GBPS:.0f} GB/s effective DCN all-reduce",
        f"bandwidth, {DCN_LAT_US:.0f} µs/round latency (conservative v5e",
        "pod-to-pod). Latency dominates; bandwidth term is ~µs.",
        "",
        "| hosts | steps/s | BA iters/s | DCN ms/step | weak-scaling efficiency |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['hosts']} | {r['steps_per_s']} | {r['iters_per_s']} | "
            f"{r['dcn_ms']} | {r['efficiency'] * 100:.1f}% |"
        )
    lines += [
        "",
        "The ≥80% target holds through 8 hosts because the DCN payload is",
        "independent of map size — the design reduces everything heavy over",
        "ICI first (`_psum_hier` in okvis_tpu/parallel/sharded_ba.py).",
        "Replace the model with measurement by running this script's",
        "mesh on a real multi-host pod (`make_mesh2d(n_hosts, chips)`).",
        "",
    ]
    out.write_text("\n".join(lines))
    print(json.dumps(rows))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
